#!/usr/bin/env python3
"""Recover the RFC 7932 static-dictionary transform table (Appendix B) by
crafting minimal brotli streams and decoding them with the reference decoder
(brotlicffi). Public data recovered from public spec behavior; no proprietary
input. Output: transforms.json (121 entries of prefix/type/suffix) plus a
dictionary validation report.

Stream shape: WBITS=24; one ISLAST compressed meta-block declaring MLEN=m;
single-symbol literal/command/distance prefix codes (zero bits per symbol);
one command: insert 0 literals, copy length L at distance word_id+1 with
pos=0 so max_backward=0 and every distance is a dictionary reference.
The true output length is found by scanning m upward until the decoder
accepts (a single command emits exactly its transform output, so the first
accepting m is it).
"""
import json, sys
import brotlicffi

DICT = open('/root/repo/src/main/resources/graft/brotli_dictionary.bin', 'rb').read()
NDBITS = [0,0,0,0,10,10,11,11,10,10,10,10,10,9,9,8,7,7,8,7,7,6,6,5,5]
OFFSETS = [0]*25
for l in range(4, 25):
    OFFSETS[l] = OFFSETS[l-1] + (l-1 if l-1 >= 4 else 0) * (1 << NDBITS[l-1])
assert OFFSETS[24] + 24 * (1 << NDBITS[24]) == 122784, OFFSETS

# copy length codes: (extra_bits, offset)
COPY = [(0,2),(0,3),(0,4),(0,5),(0,6),(0,7),(0,8),(0,9),(1,10),(1,12),(2,14),(2,18),
        (3,22),(3,30),(4,38),(4,54),(5,70),(5,102),(6,134),(7,198),(8,326),(9,582),
        (10,1094),(24,2118)]

class BW:
    def __init__(self): self.bits = []
    def w(self, v, n):
        for i in range(n): self.bits.append((v >> i) & 1)
    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b: out[i >> 3] |= 1 << (i & 7)
        return bytes(out)

def craft(L, word_id, mlen):
    b = BW()
    b.w(1, 1); b.w(7, 3)            # WBITS = 24
    b.w(1, 1)                        # ISLAST
    b.w(0, 1)                        # ISLASTEMPTY = 0
    b.w(0, 2)                        # MNIBBLES code 0 -> 4 nibbles
    b.w(mlen - 1, 16)                # MLEN
    b.w(0, 1); b.w(0, 1); b.w(0, 1)  # NBLTYPES L/I/D = 1
    b.w(0, 2); b.w(0, 4)             # NPOSTFIX=0, NDIRECT=0
    b.w(0, 2)                        # literal context mode LSB6
    b.w(0, 1)                        # NTREES_L = 1
    b.w(0, 1)                        # NTREES_D = 1
    # literal tree: simple, 1 symbol (alphabet 256 -> 8 bits)
    b.w(1, 2); b.w(0, 2); b.w(65, 8)
    # command tree: simple, 1 symbol (alphabet 704 -> 10 bits)
    cc = next(i for i, (e, o) in enumerate(COPY) if o <= L < o + (1 << e))
    if cc < 8:       sym = 128 + cc          # cell 2: ins 0..7 copy 0..7
    elif cc < 16:    sym = 192 + (cc - 8)    # cell 3: ins 0..7 copy 8..15
    else:            sym = 384 + (cc - 16)   # cell 6: ins 0..7 copy 16..23
    b.w(1, 2); b.w(0, 2); b.w(sym, 10)
    # distance tree: simple, 1 symbol (alphabet 64 -> 6 bits)
    # regular dist code bucket containing word_id: D = offset + extra + 1
    dcode = None
    for dc in range(48):
        nb = 1 + (dc >> 1); off = ((2 + (dc & 1)) << nb) - 4
        if off <= word_id < off + (1 << nb):
            dcode, nbits, offset = dc, nb, off
            break
    if dcode is None: raise ValueError("word_id too large")
    b.w(1, 2); b.w(0, 2); b.w(16 + dcode, 6)
    # body: command symbol (0 bits), copy extra bits, distance extra bits
    e, o = COPY[cc]
    b.w(L - o, e)
    b.w(word_id - offset, nbits)
    return b.bytes()

def decode_ref(L, word_id):
    lo = max(1, L - 12)
    for m in range(lo, L + 30):
        try:
            return brotlicffi.decompress(craft(L, word_id, m))
        except Exception:
            continue
    return None

def base_word(L, w):
    return DICT[OFFSETS[L] + L * w: OFFSETS[L] + L * (w + 1)]

def ferment_first(b):
    b = bytearray(b); i = 0
    if len(b) == 0: return bytes(b)
    c = b[0]
    if c < 0xc0:
        if 97 <= c <= 122: b[0] ^= 32
    elif c < 0xe0:
        if len(b) > 1: b[1] ^= 32
    else:
        if len(b) > 2: b[2] ^= 5
    return bytes(b)

def ferment_all(b):
    b = bytearray(b); i = 0
    while i < len(b):
        c = b[i]
        if c < 0xc0:
            if 97 <= c <= 122: b[i] ^= 32
            i += 1
        elif c < 0xe0:
            if i + 1 < len(b): b[i+1] ^= 32
            i += 2
        else:
            if i + 2 < len(b): b[i+2] ^= 5
            i += 3
    return bytes(b)

def candidates(word):
    """(type_name, transformed) for all 21 RFC transform types."""
    out = [("Identity", bytes(word))]
    for n in range(1, 10):
        out.append((f"OmitLast{n}", bytes(word[:max(0, len(word)-n)])))
    out.append(("FermentFirst", ferment_first(word)))
    out.append(("FermentAll", ferment_all(word)))
    for n in range(1, 10):
        out.append((f"OmitFirst{n}", bytes(word[n:]) if n <= len(word) else b""))
    return out

def solve(T):
    """Intersect consistent (type, prefix, suffix) across several words."""
    probes = []
    for (L, w) in [(16, 0), (16, 1), (16, 7), (12, 3), (8, 0)]:
        word = base_word(L, w)
        out = decode_ref(L, (T << NDBITS[L]) | w)
        if out is None:
            return None
        probes.append((word, out))
    common = None
    for word, out in probes:
        here = set()
        for tname, mid in candidates(word):
            # find every split out = P + mid + S
            start = 0
            if len(mid) == 0:
                continue  # ambiguous; rely on other probes
            while True:
                i = out.find(mid, start)
                if i < 0: break
                here.add((tname, out[:i], out[i+len(mid):]))
                start = i + 1
        common = here if common is None else (common & here)
        if common is not None and len(common) == 1:
            break
    if not common:
        return ("UNSOLVED", None, None, [ (p[1].decode('latin1')) for p in probes ])
    if len(common) > 1:
        # prefer Identity, then shortest affixes
        common = sorted(common, key=lambda x: (x[0] != "Identity", len(x[1]) + len(x[2])))
        return common[0] + ("AMBIG:" + str(len(common)),)
    return list(common)[0]

def main():
    # dictionary validation: transform 0 expected Identity — check raw words
    # round-trip at every length once transforms are known.
    table = {}
    unsolved = []
    for T in range(121):
        r = solve(T)
        if r is None or r[0] == "UNSOLVED":
            unsolved.append(T)
            table[T] = {"type": "UNSOLVED"}
        else:
            tname, p, s = r[0], r[1], r[2]
            table[T] = {"type": tname, "prefix": p.decode('latin1'), "suffix": s.decode('latin1')}
            if len(r) > 3: table[T]["note"] = r[3]
    json.dump(table, open('/root/repo/tools/brotli/transforms.json', 'w'), indent=1)
    print("unsolved:", unsolved)
    # validate dictionary for all lengths using whatever transform is Identity/""/""
    idT = [t for t, v in table.items() if v.get("type") == "Identity" and v.get("prefix") == "" and v.get("suffix") == ""]
    print("identity transforms:", idT)
    if idT:
        t0 = idT[0]
        bad = []
        for L in range(4, 25):
            for w in [0, 1, (1 << NDBITS[L]) - 1]:
                out = decode_ref(L, (t0 << NDBITS[L]) | w)
                if out != base_word(L, w):
                    bad.append((L, w, out, base_word(L, w)))
        print("dict validation mismatches:", bad[:5], "count", len(bad))

if __name__ == '__main__':
    main()
