#!/usr/bin/env python3
"""Block-switch differential synthesizer: streams with 2-3 COMMAND block
types (each a distinct single-symbol command tree, so the active type is
visible in the output) and scripted switch commands covering type symbol 0
(= previous type), 1 (= current+1 mod n) and explicit k-2, with small block
counts from the count-code table. The reference decoder arbitrates; the
Scala side must match byte-for-byte.
"""
import random, sys, os
import brotlicffi

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/brblock'
N = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 6

INS_EXTRA = [0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,12,14,24]
INS_BASE = []
v = 0
for e in INS_EXTRA: INS_BASE.append(v); v += 1 << e
COP_EXTRA = [0,0,0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,24]
COP_BASE = []
v = 2
for e in COP_EXTRA: COP_BASE.append(v); v += 1 << e
BLK_EXTRA = [2,2,2,2,3,3,3,3,4,4,4,4,5,5,5,5,6,6,7,8,9,10,11,12,13,24]
BLK_BASE = []
v = 1
for e in BLK_EXTRA: BLK_BASE.append(v); v += 1 << e

class BW:
    def __init__(self): self.bits = []
    def w(self, v, n):
        for i in range(n): self.bits.append((v >> i) & 1)
    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b: out[i >> 3] |= 1 << (i & 7)
        return bytes(out)

def rev(c, l):
    r = 0
    for i in range(l):
        if c & (1 << i): r |= 1 << (l - 1 - i)
    return r

def canonical(lens):
    code = 0; out = {}
    maxl = max(lens.values())
    for l in range(1, maxl + 1):
        for s in sorted(s for s, ln in lens.items() if ln == l):
            out[s] = (code, l); code += 1
        code <<= 1
    return out

def write_simple(b, alphabet, order, lens):
    maxbits = (alphabet - 1).bit_length()
    b.w(1, 2); b.w(len(order) - 1, 2)
    for s in order: b.w(s, maxbits)
    if len(order) == 4: b.w(0 if all(lens[o] == 2 for o in order) else 1, 1)

def simple_tree(rng, alphabet, symbols):
    order = list(symbols); rng.shuffle(order)
    ns = len(order)
    if ns == 1: lens = {order[0]: 1}
    elif ns == 2: lens = {order[0]: 1, order[1]: 1}
    elif ns == 3: lens = {order[0]: 1, order[1]: 2, order[2]: 2}
    else: lens = {o: 2 for o in order}
    codes = canonical(lens) if ns > 1 else {order[0]: (0, 0)}
    return order, lens, codes

def blkcount_code(n):
    for c in range(26):
        if BLK_BASE[c] <= n < BLK_BASE[c] + (1 << BLK_EXTRA[c]):
            return c, n - BLK_BASE[c]
    raise ValueError

def gen_case(rng):
    nbt = rng.choice([2, 3])             # command block types
    # per type: a distinct single-symbol command tree (insert len = 1+t, copy 2)
    # insert codes 1..3 have 0 extra bits; cell 2 sym = 128 + (ic<<3) + 0
    cmd_sym = [128 + ((1 + t) << 3) for t in range(nbt)]
    lit_syms = rng.sample(range(65, 91), 4)
    ncmds = rng.randrange(4, 25)
    # scripted switch schedule: counts 1..4 commands per block
    schedule = []                         # (btype) per command
    cur, prev = 0, 1
    counts = []                           # (count, typesym at switch)
    first = rng.randrange(1, 5)
    counts.append((first, None))
    left = first
    for i in range(ncmds):
        if left == 0:
            choice = rng.randrange(3)
            if choice == 0: nt, tsym = prev, 0
            elif choice == 1: nt, tsym = (cur + 1) % nbt, 1
            else:
                nt = rng.randrange(nbt); tsym = nt + 2
            prev, cur = cur, nt
            c = rng.randrange(1, 5)
            counts.append((c, tsym))
            left = c
        schedule.append(cur)
        left -= 1
    # build output: per command, insert (1+btype) literals then copy 2 from dist=1
    out = bytearray()
    lits_all = []
    for t in schedule:
        ins = 1 + t
        lits = [rng.choice(lit_syms) for _ in range(ins)]
        lits_all.append(lits)
        out.extend(lits)
        for _ in range(2): out.append(out[-1])   # copy 2, distance 1 (repeat last byte)
    mlen = len(out)

    b = BW()
    b.w(0, 1)                          # WBITS 16
    b.w(1, 1); b.w(0, 1)               # ISLAST, not empty
    b.w(0, 2); b.w(mlen - 1, 16)       # MNIBBLES 4
    # NBLTYPES_L = 1
    b.w(0, 1)
    # NBLTYPES_I = nbt (varlen: 2 -> bits 1,000 ; 3 -> 1,n=1,extra 0)
    if nbt == 2: b.w(1, 1); b.w(0, 3)
    else: b.w(1, 1); b.w(1, 3); b.w(0, 1)
    # command type tree over nbt+2 symbols; count tree over 26
    tsyms = sorted(set([c[1] for c in counts[1:]] or [0]))
    if not tsyms: tsyms = [0]
    t_order, t_lens, t_codes = simple_tree(rng, nbt + 2, tsyms)
    csyms = sorted(set(blkcount_code(c[0])[0] for c in counts))
    c_order, c_lens, c_codes = simple_tree(rng, 26, csyms)
    write_simple(b, nbt + 2, t_order, t_lens)
    write_simple(b, 26, c_order, c_lens)
    cc0, ex0 = blkcount_code(counts[0][0])
    code, l = c_codes[cc0]
    if l: b.w(rev(code, l), l)
    b.w(ex0, BLK_EXTRA[cc0])
    # NBLTYPES_D = 1
    b.w(0, 1)
    b.w(0, 2); b.w(0, 4)               # NPOSTFIX/NDIRECT
    b.w(0, 2)                          # ctx mode (1 literal type)
    b.w(0, 1); b.w(0, 1)               # NTREES_L/D = 1
    # literal tree: simple over the 4 lit_syms
    l_order, l_lens, l_codes = simple_tree(rng, 256, lit_syms)
    write_simple(b, 256, l_order, l_lens)
    # command trees: one single-symbol tree PER block type
    for t in range(nbt):
        b.w(1, 2); b.w(0, 2); b.w(cmd_sym[t], 10)
    # distance tree: single symbol = short code 0 (last distance)... initial
    # last distance is 4; we need distance 1 -> use explicit regular code for 1:
    # dcode 0 covers distances 1..2 with 1 extra bit
    b.w(1, 2); b.w(0, 2); b.w(16 + 0, 6)
    # body
    ci = 0                              # index into counts; next switch when exhausted
    left = counts[0][0]
    k = 0
    for (t, lits) in zip(schedule, lits_all):
        if left == 0:
            ci += 1
            tsym = counts[ci][1]
            code, l = t_codes[tsym]
            if l: b.w(rev(code, l), l)
            cc, ex = blkcount_code(counts[ci][0])
            code, l = c_codes[cc]
            if l: b.w(rev(code, l), l)
            b.w(ex, BLK_EXTRA[cc])
            left = counts[ci][0]
        left -= 1
        # command symbol from the ACTIVE tree: single-symbol, zero bits
        # insert extra bits: none (codes 1..3 have 0 extra); copy extra: none (code 0)
        for lch in lits:
            code, l = l_codes[lch]
            if l: b.w(rev(code, l), l)
        # distance symbol: single-symbol tree, zero bits; dcode 16 -> regular
        # dcode0: nbits=1, offset=0, D = extra + 1 -> extra 0 gives D=1
        b.w(0, 1)
        k += 1
    return b.bytes(), bytes(out)

def main():
    rng = random.Random(SEED)
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(OUT): os.remove(f'{OUT}/{f}')
    kept = 0; tried = 0; model_diff = 0
    while kept < N and tried < N * 40:
        tried += 1
        try: stream, expect = gen_case(rng)
        except Exception: continue
        try: ref = brotlicffi.decompress(stream)
        except Exception: continue
        if ref != expect: model_diff += 1; expect = ref
        open(f'{OUT}/{kept:05d}.br','wb').write(stream)
        open(f'{OUT}/{kept:05d}.raw','wb').write(expect)
        kept += 1
    print(f"block-switch streams: {kept} kept ({tried} tried, {model_diff} model-diffs)")

if __name__ == '__main__':
    main()
