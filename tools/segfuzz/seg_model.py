#!/usr/bin/env python3
"""Differential fuzz of the segmentation contract (SegmentKernel scaladoc
rules 1-4) against an independent python model, over hostile inputs the
DuckDB oracle cannot express: joiners inside SEG runs, malformed UTF-8,
mixed scripts at segment boundaries, non-BMP CJK.

The model classifies with the JVM's OWN tables (dumped by SegmentDumpMain
--tables: Spark's UTF-8 lead-length table and this JVM's joiner set) so a
divergence is a real contract violation, not a Unicode-version artifact.

Usage: gen N SEED -> write /tmp/segfuzz/*.bin + model bounds; then compare
against the Scala dump.
"""
import random, sys, os

TABLES = open('/tmp/seg_tables.txt').read().splitlines()
LEADS = [int(x) for x in TABLES[0][len("LEADS:"):].split(",")]
JOINERS = set(int(x) for x in TABLES[1][len("JOINERS:"):].split())

SEG_RANGES = [
    (0x0E00, 0x0EFF), (0x1000, 0x109F), (0x1780, 0x17FF), (0x3040, 0x30FA),
    (0x30FC, 0x30FF), (0x31F0, 0x31FF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF),
    (0xF900, 0xFAFF), (0xFF66, 0xFF9D), (0x1B000, 0x1B16F), (0x20000, 0x3FFFF)]

def is_seg(cp):
    return any(lo <= cp <= hi for lo, hi in SEG_RANGES)

def is_ws(b):
    return b == 0x20 or 0x09 <= b <= 0x0D

def char_len(bys, i, n):
    b = bys[i]
    if b < 0x80: return 1
    nb = LEADS[b]
    if nb <= 1: return 1
    j = i + 1
    end = min(i + nb, n)
    while j < end and (bys[j] & 0xC0) == 0x80: j += 1
    return j - i

def code_point_at(bys, i, n, cl):
    b0 = bys[i]
    if cl <= 1: return b0 if b0 < 0x80 else 0xFFFD
    if cl != LEADS[b0]: return 0xFFFD
    if cl == 2: cp = b0 & 0x1F
    elif cl == 3: cp = b0 & 0x0F
    else: cp = b0 & 0x07
    for j in range(i + 1, i + cl):
        cp = (cp << 6) | (bys[j] & 0x3F)
    if cp > 0x10FFFF or cp < 0 or 0xD800 <= cp <= 0xDFFF: return 0xFFFD
    return cp

def token_bounds(bys):
    n = len(bys)
    out = []
    units = []   # open SEG segment unit starts
    other_start = -1
    def flush_seg(seg_end):
        m = len(units)
        if m == 0: return
        if m == 1: out.append((units[0], seg_end))
        else:
            for j in range(m - 1):
                out.append((units[j], units[j + 2] if j + 2 < m else seg_end))
        units.clear()
    i = 0
    while i < n:
        b = bys[i]
        if is_ws(b):
            flush_seg(i)
            if other_start >= 0: out.append((other_start, i)); other_start = -1
            i += 1
        else:
            u0 = i
            cl = char_len(bys, i, n)
            cp = code_point_at(bys, i, n, cl)
            i += cl
            while i < n and not is_ws(bys[i]):
                cl2 = char_len(bys, i, n)
                if code_point_at(bys, i, n, cl2) in JOINERS: i += cl2
                else: break
            if is_seg(cp):
                if other_start >= 0: out.append((other_start, u0)); other_start = -1
                units.append(u0)
            else:
                flush_seg(u0)
                if other_start < 0: other_start = u0
    flush_seg(n)
    if other_start >= 0: out.append((other_start, n))
    return out

ALPHABET = (
    [ord(c) for c in "abcZ09.!-"] +                 # ASCII
    [0x20, 0x09, 0x0A, 0x0C] * 3 +                  # whitespace (weighted)
    [0xE9, 0xDF, 0x2013] +                          # Latin-1 / punct
    [0x4E2D, 0x6587, 0x65E5, 0x672C, 0x8A9E, 0x3042, 0x30AB, 0x30FC, 0x30FB] +
    [0x0E01, 0x0E34, 0x0E48, 0x1000, 0x1780] +      # Thai + Myanmar + Khmer
    [0x3099, 0x309B, 0xFF76, 0xFF9E, 0xFF65] +      # kana voiced / halfwidth
    [0x0301, 0x0E31, 0x200C, 0x200D] +              # combining / ZWNJ / ZWJ
    [0x20000, 0x2A6D6, 0x1B001] +                   # non-BMP CJK / kana supp
    [0xAC00, 0x0410])                               # Hangul / Cyrillic (OTHER)

def gen(n_cases, seed, outdir):
    rng = random.Random(seed)
    os.makedirs(outdir, exist_ok=True)
    for f in os.listdir(outdir):
        os.remove(f'{outdir}/{f}')
    expected = {}
    for k in range(n_cases):
        parts = bytearray()
        ln = rng.randrange(0, 120)
        for _ in range(ln):
            r = rng.random()
            if r < 0.85:
                cp = rng.choice(ALPHABET)
                parts += chr(cp).encode('utf-8')
            elif r < 0.95:
                # malformed: bare continuation / truncated lead / illegal lead
                parts += bytes([rng.choice([0x80, 0xBF, 0xC3, 0xE4, 0xF0, 0xF8, 0xFE])])
            else:
                parts += rng.randbytes(rng.randrange(1, 4))
        name = f"{k:05d}"
        open(f'{outdir}/{name}.bin', 'wb').write(bytes(parts))
        expected[name + ".bin"] = token_bounds(bytes(parts))
    return expected

def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    dump = sys.argv[3] if len(sys.argv) > 3 else None
    outdir = '/tmp/segfuzz'
    expected = gen(n, seed, outdir)
    if dump is None:
        print(f"generated {n} cases into {outdir}")
        return
    # compare against the Scala dump
    bad = 0
    for line in open(dump):
        if ':' not in line: continue
        name, rest = line.split(':', 1)
        name = name.strip()
        if name not in expected: continue
        got = [tuple(int(x) for x in p.split(',')) for p in rest.split()] if rest.strip() else []
        want = expected[name]
        if got != want:
            bad += 1
            if bad <= 5:
                print(f"DIFF {name}: got {got[:8]} want {want[:8]}")
    print(f"compared {len(expected)}: diffs={bad}")

if __name__ == '__main__':
    main()
