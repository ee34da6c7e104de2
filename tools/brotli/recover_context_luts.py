#!/usr/bin/env python3
"""Recover the RFC 7932 section 7.1 literal context lookup tables (UTF8 and
Signed modes) empirically: craft streams where the emitted literal byte IS the
context ID. Each probe = [uncompressed meta-block with bytes (p2,p1)] followed
by [compressed meta-block: 64 literal trees, identity context map, tree t
emits byte t, one command inserting exactly 1 literal]. LSB6/MSB6 modes are
probed too as a sanity check of the machinery (their LUTs are arithmetic).
Writes context_luts.json: {mode: [256x256 ctx values]} compressed to the
two-LUT decomposition ctx = lut0[p1] | lut1[p2] when it holds.
"""
import json
import brotlicffi

def rev6(x):
    r = 0
    for i in range(6):
        if x & (1 << i): r |= 1 << (5 - i)
    return r

class BW:
    def __init__(self): self.bits = []
    def w(self, v, n):
        for i in range(n): self.bits.append((v >> i) & 1)
    def align(self):
        while len(self.bits) % 8: self.bits.append(0)
    def raw(self, bs):
        self.align()
        for b in bs: self.w(b, 8)
    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b: out[i >> 3] |= 1 << (i & 7)
        return bytes(out)

def probe_block(b, mode):
    # compressed meta-block, MLEN=1, one literal whose value = context id
    b.w(0, 1)                 # ISLAST = 0
    b.w(0, 2)                 # MNIBBLES = 4
    b.w(0, 16)                # MLEN - 1 = 0
    b.w(0, 1)                 # ISUNCOMPRESSED = 0
    b.w(0, 1); b.w(0, 1); b.w(0, 1)   # NBLTYPES L/I/D = 1
    b.w(0, 2); b.w(0, 4)      # NPOSTFIX, NDIRECT
    b.w(mode, 2)              # literal context mode
    # NTREES_L = 64: varlen: 1, n=5, extra=31
    b.w(1, 1); b.w(5, 3); b.w(31, 5)
    # context map over 64 entries, alphabet 64 (no RLE)
    b.w(0, 1)                 # RLE bit
    # complex prefix code, HSKIP=0; cl lengths in order [1,2,3,4,0,5,17,6,16,...]
    b.w(0, 2)
    for _ in range(7): b.w(0, 2)      # cl syms 1,2,3,4,0,5,17 -> len 0 ("00")
    b.w(0b0111, 4)                     # cl sym 6 -> len 1 (pattern 1,1,1,0 LSB-first)
    for _ in range(10): b.w(0, 2)     # cl syms 16,7..15 -> len 0
    # single cl symbol "6": every symbol-length read consumes 0 bits -> all 64 len 6
    for i in range(64): b.w(rev6(i), 6)   # identity map: symbol i at position i
    b.w(0, 1)                 # IMTF = 0
    # NTREES_D = 1
    b.w(0, 1)
    # 64 literal trees: simple single-symbol, tree t emits byte t
    for t in range(64):
        b.w(1, 2); b.w(0, 2); b.w(t, 8)
    # command tree: single symbol 136 (insert code 1 -> len 1, copy code 0, cell 2)
    b.w(1, 2); b.w(0, 2); b.w(136, 10)
    # distance tree: single symbol (never read: MLEN reached after insert)
    b.w(1, 2); b.w(0, 2); b.w(16, 6)
    # body: command sym (0 bits), insert extra (0 bits), literal (0 bits)

def uncomp_block(b, data):
    b.w(0, 1)                 # ISLAST = 0
    b.w(0, 2)                 # MNIBBLES = 4
    b.w(len(data) - 1, 16)
    b.w(1, 1)                 # ISUNCOMPRESSED
    b.raw(data)

def stream_for(mode, p2):
    b = BW()
    b.w(1, 1); b.w(7, 3)      # WBITS = 24
    for p1 in range(256):
        uncomp_block(b, bytes([p2, p1]))
        probe_block(b, mode)
    b.w(1, 1); b.w(1, 1)      # ISLAST, ISLASTEMPTY
    return b.bytes()

def main():
    tables = {}
    for mode, name in [(0, "LSB6"), (1, "MSB6"), (2, "UTF8"), (3, "Signed")]:
        ctx = [[0]*256 for _ in range(256)]
        for p2 in range(256):
            out = brotlicffi.decompress(stream_for(mode, p2))
            assert len(out) == 256 * 3, (mode, p2, len(out))
            for p1 in range(256):
                ctx[p1][p2] = out[p1 * 3 + 2]
        # sanity: known arithmetic modes
        if name == "LSB6":
            assert all(ctx[p1][p2] == (p1 & 0x3f) for p1 in range(256) for p2 in range(0,256,37))
        if name == "MSB6":
            assert all(ctx[p1][p2] == (p1 >> 2) for p1 in range(256) for p2 in range(0,256,37))
        # try two-LUT decomposition: ctx = lut0[p1] | lut1[p2]
        lut1 = [ctx[0][p2] for p2 in range(256)]
        lut0 = [ctx[p1][0] for p1 in range(256)]
        ok = all(ctx[p1][p2] == (lut0[p1] | lut1[p2]) for p1 in range(256) for p2 in range(256))
        tables[name] = {"decomposes": ok, "lut0": lut0, "lut1": lut1}
        if not ok:
            tables[name]["full"] = ctx
        print(name, "two-LUT decomposition:", ok)
    json.dump(tables, open('/root/repo/tools/brotli/context_luts.json', 'w'))

if __name__ == '__main__':
    main()
