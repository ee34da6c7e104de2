#!/usr/bin/env python3
"""Randomized VALID-stream synthesizer for differential brotli conformance.

The reference ENCODER only emits a narrow slice of the format: it never uses
block-switch symbol 0/1 chains the hard way, rarely touches short distance
codes 4-15 against a hand-built ring, never writes degenerate-but-legal code
shapes. This synthesizer builds random valid streams bottom-up — a random
command list (literal inserts, overlapping copies, ring-coded distances,
dictionary refs with random transforms) encoded under randomly chosen prefix
code structures — verifies the reference decoder accepts them, and checks
graft's decoder (via decoded output files) produces identical bytes.

Usage: synth + verify against brotlicffi, write pairs into OUTDIR; the Scala
side (BrotliSynthMain) decodes each and compares.
"""
import random, sys, os
import brotlicffi

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/brsynth'
N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 20260816

NDBITS = [0,0,0,0,10,10,11,11,10,10,10,10,10,9,9,8,7,7,8,7,7,6,6,5,5]
OFFSETS = [0]*25
for l in range(4, 25):
    OFFSETS[l] = OFFSETS[l-1] + (l-1 if l-1 >= 4 else 0) * (1 << NDBITS[l-1])
DICT = open('/root/repo/src/main/resources/graft/brotli_dictionary.bin','rb').read()

INS_EXTRA = [0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,12,14,24]
INS_BASE = []
v = 0
for e in INS_EXTRA: INS_BASE.append(v); v += 1 << e
COP_EXTRA = [0,0,0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,24]
COP_BASE = []
v = 2
for e in COP_EXTRA: COP_BASE.append(v); v += 1 << e
# cells 2..10 insert/copy range bases
CELL_INS = [0,0,8,8,0,16,8,16,16]
CELL_COP = [0,8,0,8,16,0,16,8,16]

class BW:
    def __init__(self): self.bits = []
    def w(self, v, n):
        for i in range(n): self.bits.append((v >> i) & 1)
    def align(self):
        while len(self.bits) % 8: self.bits.append(0)
    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b: out[i >> 3] |= 1 << (i & 7)
        return bytes(out)

def canonical_codes(lens_by_symbol):
    """symbol -> (code, len) canonical by (len, symbol)."""
    code = 0
    out = {}
    maxl = max(l for l in lens_by_symbol.values())
    for l in range(1, maxl + 1):
        for s in sorted(s for s, ln in lens_by_symbol.items() if ln == l):
            out[s] = (code, l)
            code += 1
        code <<= 1
    return out

def rev(c, l):
    r = 0
    for i in range(l):
        if c & (1 << i): r |= 1 << (l - 1 - i)
    return r

class Tree:
    """A prefix code we can WRITE (header bits) and EMIT symbols with."""
    def __init__(self, rng, alphabet, symbols):
        self.alphabet = alphabet
        self.symbols = sorted(set(symbols))
        ns = len(self.symbols)
        assert 1 <= ns
        if ns <= 4:
            self.kind = 'simple'
            # read-order = shuffled; lens by RFC shape
            order = list(self.symbols)
            rng.shuffle(order)
            self.order = order
            if ns == 1: lens = {order[0]: 1}
            elif ns == 2: lens = {order[0]: 1, order[1]: 1}
            elif ns == 3: lens = {order[0]: 1, order[1]: 2, order[2]: 2}
            else:
                self.select = rng.randrange(2)
                if self.select: lens = {order[0]: 1, order[1]: 2, order[2]: 3, order[3]: 3}
                else: lens = {o: 2 for o in order}
            self.lens = lens
            self.codes = canonical_codes(lens) if ns > 1 else {order[0]: (0, 0)}
        else:
            self.kind = 'uniform8'
            assert alphabet == 256
            self.codes = {s: (s, 8) for s in range(256)}

    def write_header(self, b):
        if self.kind == 'simple':
            ns = len(self.symbols)
            maxbits = (self.alphabet - 1).bit_length()
            b.w(1, 2)          # HSKIP=1 simple
            b.w(ns - 1, 2)
            for s in self.order: b.w(s, maxbits)
            if ns == 4: b.w(self.select, 1)
        else:
            b.w(0, 2)          # complex, HSKIP=0
            for _ in range(10): b.w(0, 2)  # order entries before sym 8
            b.w(7, 4)          # cl sym 8 -> len 1 (single-code cl)
            for _ in range(7): b.w(0, 2)

    def emit(self, b, s):
        code, l = self.codes[s]
        if l: b.w(rev(code, l), l)

def gen_case(rng):
    """Build (stream_bytes, expected_output) for one random valid stream."""
    wbits = rng.choice([10, 16, 18, 22, 24])
    win = (1 << wbits) - 16
    # literal alphabet: small set (simple code) or full byte range
    if rng.random() < 0.6:
        lit_syms = rng.sample(range(256), rng.randrange(1, 5))
    else:
        lit_syms = list(range(256))
    # command symbols: choose 1-4 cells/codes we will use
    # distance symbols: subset of short codes + regular codes
    npostfix = rng.randrange(4)
    ndirect = rng.randrange(16) << npostfix
    dist_alpha = 16 + ndirect + (48 << npostfix)

    out = bytearray()
    ring = [16, 15, 11, 4]   # ring[(idx+3)&3] = last
    ridx = 0
    cmds = []
    ncmd = rng.randrange(1, 30)
    for _ in range(ncmd):
        ins = rng.randrange(0, 12)
        lits = [rng.choice(lit_syms) for _ in range(ins)]
        out.extend(lits)
        # choose a copy: backward copy / ring code / dictionary
        choice = rng.random()
        did = None
        if len(out) == 0 or choice < 0.25:
            # dictionary ref: explicit distance beyond maxdist
            copy = rng.randrange(4, 25)
            wshift = NDBITS[copy]
            word = rng.randrange(1 << wshift)
            # pick transforms that are pure Identity (0) sometimes, else random
            t = rng.choice([0, 0, 0, 5, 9, 10, 11, 12, 23, 44, 64, 72, 102, 120])
            maxd = min(len(out), win)
            dist = maxd + 1 + ((t << wshift) | word)
            # compute expected transform output via reference tables json
            seg = DICT[OFFSETS[copy] + copy*word: OFFSETS[copy] + copy*(word+1)]
            txt = transform(seg, t)
            if len(txt) == 0: continue
            out.extend(txt)
            cmds.append(('dict', ins, lits, copy, dist))
            # ring NOT updated
        else:
            if rng.random() < 0.4:
                # ring short code
                dcode = rng.randrange(16)
                SIDX = [3,2,1,0,3,3,3,3,3,3,2,2,2,2,2,2]
                SDEL = [0,0,0,0,-1,1,-2,2,-3,3,-1,1,-2,2,-3,3]
                dist = ring[(ridx + SIDX[dcode]) & 3] + SDEL[dcode]
                maxd = min(len(out), win)
                if dist <= 0 or dist > maxd: continue  # would be dict/error; skip
                copy = rng.randrange(2, 20)
                for j in range(copy): out.append(out[len(out) - dist])
                if dcode != 0:
                    ring[ridx & 3] = dist; ridx += 1
                cmds.append(('short', ins, lits, copy, dcode))
            else:
                # explicit backward distance
                maxd = min(len(out), win)
                dist = rng.randrange(1, maxd + 1)
                copy = rng.randrange(2, 20)
                pos = len(out)
                for j in range(copy): out.append(out[len(out) - dist])
                ring[ridx & 3] = dist; ridx += 1
                cmds.append(('expl', ins, lits, copy, dist))
    if not cmds and not out:
        return None
    # trailing pure-insert command to make a nonzero MLEN if needed
    mlen = len(out)
    if mlen == 0: return None

    # ---- encode ----
    b = BW()
    # WBITS
    pat = {16: (0, 1)}.get(wbits)
    if pat: b.w(0, 1)
    else:
        b.w(1, 1)
        n = wbits - 17
        if n > 0: b.w(n, 3)
        else:
            b.w(0, 3); b.w(0 if wbits == 17 else wbits - 8, 3)
    b.w(1, 1); b.w(0, 1)               # ISLAST, not empty
    nib = 4 if mlen - 1 < (1 << 16) else (5 if mlen - 1 < (1 << 20) else 6)
    b.w(nib - 4, 2); b.w(mlen - 1, nib * 4)
    b.w(0, 1); b.w(0, 1); b.w(0, 1)    # NBLTYPES = 1,1,1
    b.w(npostfix, 2); b.w(ndirect >> npostfix, 4)
    b.w(rng.randrange(2), 2)           # context mode LSB6/MSB6 (1 tree: irrelevant)
    b.w(0, 1); b.w(0, 1)               # NTREES_L = NTREES_D = 1

    lit_tree = Tree(rng, 256, lit_syms)
    # command symbols used:
    def cmd_symbol(ins, copy_code_needed, want_implicit):
        # find insert code
        ic = next(i for i in range(24) if INS_BASE[i] <= ins < INS_BASE[i] + (1 << INS_EXTRA[i]))
        cc = copy_code_needed
        if want_implicit and ic < 8 and cc < 16:
            cell = 0 if cc < 8 else 1
            return cell * 64 + ((ic & 7) << 3) + (cc & 7), ic, cc
        for cell in range(2, 11):
            ib, cb = CELL_INS[cell - 2], CELL_COP[cell - 2]
            if ib <= ic < ib + 8 and cb <= cc < cb + 8:
                return cell * 64 + ((ic - ib) << 3) + (cc - cb), ic, cc
        return None
    enc_cmds = []
    cmd_syms = set()
    for c in cmds:
        kind, ins, lits, copy, dval = c
        cc = next(i for i in range(24) if COP_BASE[i] <= copy < COP_BASE[i] + (1 << COP_EXTRA[i]))
        r = cmd_symbol(ins, cc, False)
        if r is None: return None
        sym, ic, _ = r
        enc_cmds.append((sym, ic, cc) + c)
        cmd_syms.add(sym)
    if not cmd_syms or len(cmd_syms) > 4: return None  # keep the command tree simple
    cmd_tree = Tree(rng, 704, cmd_syms)
    # distance symbols used
    dsyms = set()
    enc2 = []
    for (sym, ic, cc, kind, ins, lits, copy, dval) in enc_cmds:
        if kind == 'short':
            ds = dval; extra = (0, 0)
        else:
            D = dval
            found = None
            for dc in range(48 << npostfix):
                h = dc >> npostfix; lo = dc & ((1 << npostfix) - 1)
                nb = 1 + (h >> 1); off = ((2 + (h & 1)) << nb) - 4
                lowest = ((off + 0) << npostfix) + lo + ndirect + 1
                highest = ((off + (1 << nb) - 1) << npostfix) + lo + ndirect + 1
                if lowest <= D <= highest and ((D - lo - ndirect - 1) % (1 << npostfix)) == 0:
                    x = (D - lo - ndirect - 1) >> npostfix
                    if off <= x < off + (1 << nb):
                        found = (16 + ndirect + dc, nb, x - off)
                        break
            if found is None:
                if 1 <= D <= ndirect:
                    found = (15 + D, 0, 0)
                else:
                    return None
            ds, nb, xv = found
            extra = (nb, xv)
        dsyms.add(ds)
        enc2.append((sym, ic, cc, kind, ins, lits, copy, ds, extra))
    if len(dsyms) > 4: return None
    dist_tree = Tree(rng, dist_alpha, dsyms)

    lit_tree.write_header(b)
    cmd_tree.write_header(b)
    dist_tree.write_header(b)
    # every generated command produced output (skipped ones never reached
    # cmds), so every command writes its complete form and the distance is
    # always read — output sums to MLEN exactly by construction
    for (sym, ic, cc, kind, ins, lits, copy, ds, extra) in enc2:
        cmd_tree.emit(b, sym)
        b.w(ins - INS_BASE[ic], INS_EXTRA[ic])
        b.w(copy - COP_BASE[cc], COP_EXTRA[cc])
        for lch in lits: lit_tree.emit(b, lch)
        dist_tree.emit(b, ds)
        nb, xv = extra
        if nb: b.w(xv, nb)
    stream = b.bytes()
    return stream, bytes(out)

TRT = None
def transform(seg, t):
    global TRT
    if TRT is None:
        import json
        TRT = json.load(open('/root/repo/tools/brotli/transforms.json'))
    v = TRT[str(t)]
    w = bytearray(seg)
    ty = v['type']
    if ty.startswith('OmitFirst'):
        n = int(ty[9:]); w = w[min(n, len(w)):]
    elif ty.startswith('OmitLast'):
        n = int(ty[8:]); w = w[:max(0, len(w) - n)]
    elif ty == 'FermentFirst':
        if w:
            c = w[0]
            if c < 0xc0:
                if 97 <= c <= 122: w[0] ^= 32
            elif c < 0xe0:
                if len(w) > 1: w[1] ^= 32
            else:
                if len(w) > 2: w[2] ^= 5
    elif ty == 'FermentAll':
        i = 0
        while i < len(w):
            c = w[i]
            if c < 0xc0:
                if 97 <= c <= 122: w[i] ^= 32
                i += 1
            elif c < 0xe0:
                if i + 1 < len(w): w[i+1] ^= 32
                i += 2
            else:
                if i + 2 < len(w): w[i+2] ^= 5
                i += 3
    return v['prefix'].encode('latin1') + bytes(w) + v['suffix'].encode('latin1')

def main():
    rng = random.Random(SEED)
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(OUT): os.remove(f'{OUT}/{f}')
    kept = 0
    tried = 0
    while kept < N and tried < N * 60:
        tried += 1
        case = gen_case(rng)
        if case is None: continue
        stream, expect = case
        try:
            ref = brotlicffi.decompress(stream)
        except Exception:
            continue  # our emitted-length bookkeeping was off; skip
        if ref != expect:
            # reference decoded DIFFERENTLY than our model — that is fine for
            # the differential test (the reference is ground truth), keep it
            expect = ref
        open(f'{OUT}/{kept:05d}.br', 'wb').write(stream)
        open(f'{OUT}/{kept:05d}.raw', 'wb').write(expect)
        kept += 1
    print(f"synthesized {kept} reference-accepted streams ({tried} tried)")

if __name__ == '__main__':
    main()
