#!/usr/bin/env python3
"""Randomized differential fuzz of the as-of / range join family against DuckDB.

Generates N random trials (default 120 as-of + 100 range = 220), runs the engine half
in ONE JVM via graft.tools.FuzzAsOf, then replays every trial in DuckDB (native
ASOF JOIN for as-of, plain inequality join for range) and diffs row SETS.

    python3 tools/fuzz_asof.py [--trials-asof 120] [--trials-range 100] [--seed 8]
    python3 tools/fuzz_asof.py --skip-spark   # re-compare existing outputs

Covered hostile classes per trial draw:
  - key collisions (small key domains), NULL keys (graft groups NULLs together;
    the oracle mirrors via a sentinel), keyed vs global
  - NULL left times (must never match) and NULL right times (dropped)
  - exact time ties left==right (inclusive boundary), duplicate LEFT times
  - forward and backward directions, with and without tolerance
  - empty left / empty right / both
  - range: points exactly ON interval ends (inclusive), NULL/NaN/Inf coordinates,
    zero-length intervals, nested/overlapping intervals, random bin widths

Right (k, t) pairs are kept UNIQUE by construction — in GLOBAL (un-keyed) mode,
unique on t alone: duplicate right times at one instant are documented
tie-ambiguity in every as-of engine (graft picks a deterministic payload order;
DuckDB picks its own) — not a correctness signal.

Engine-semantics divergence found by this fuzz and ENCODED in the oracle:
DuckDB's ASOF JOIN matches a NULL-time left row to the LATEST right row (its
sort-based implementation parks NULLs last, so the binary search lands on the
final entry); graft (like pandas merge_asof's null handling) treats a NULL time
as having no position — never a match. The oracle therefore restricts the ASOF
to non-NULL left times and pads NULL-time lefts back with NULL payload,
pinning graft's documented contract (AsOf.scala "Left rows with a NULL time
never match").
"""
import os
import random
import shutil
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = "/tmp/fuzz_asof"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SENTINEL = -99999999  # NULL-key stand-in for the oracle (graft groups NULL keys)


def write(path, names, cols, types):
    pq.write_table(
        pa.table({n: pa.array(c, type=t) for n, c, t in zip(names, cols, types)}),
        path)


def gen_asof(i, rng):
    keyed = rng.random() < 0.7
    forward = rng.random() < 0.5
    tol = rng.choice(["none", str(rng.randint(0, 30))])
    name = f"asof_{i:03d}_k{int(keyed)}_f{int(forward)}_t{tol}"
    d = os.path.join(ROOT, name)
    os.makedirs(d, exist_ok=True)
    nl = rng.choice([0, 1, 2, rng.randint(3, 120)])
    nr = rng.choice([0, 1, 2, rng.randint(3, 120)])
    kdom = rng.randint(1, 5)
    tdom = rng.randint(5, 80)  # small domain -> plenty of cross-side ties

    def key():
        return None if rng.random() < 0.15 else rng.randint(0, kdom)

    lk = [key() for _ in range(nl)]
    lt = [None if rng.random() < 0.1 else rng.randint(0, tdom) for _ in range(nl)]
    lv = list(range(nl))
    # unique right (k, t) — on t ALONE in global mode: see module doc
    seen, rk, rt, pv = set(), [], [], []
    for _ in range(nr):
        k, t = key(), rng.randint(0, tdom)
        if rng.random() < 0.05:
            t = None
        dedup_key = (k, t) if keyed else t
        if dedup_key in seen:
            continue
        seen.add(dedup_key)
        rk.append(k)
        rt.append(t)
        pv.append(rng.randint(0, 10 ** 6))
    write(f"{d}/left.parquet", ["lid", "k", "t", "lv"],
          [list(range(nl)), lk, lt, lv], [pa.int64()] * 4)
    write(f"{d}/right.parquet", ["k", "t", "pv"],
          [rk, rt, pv], [pa.int64()] * 3)
    return name


def gen_range(i, rng):
    # 'auto' = rangeJoinAuto (data-derived quantile width) — results must be
    # width-invariant, so the same inequality-join oracle applies
    wraw = rng.choice([0.5, 1.0, 2.0, 7.5, 31.0, "auto"])
    name = f"range_{i:03d}_w{str(wraw).replace('.', 'p')}"
    d = os.path.join(ROOT, name)
    os.makedirs(d, exist_ok=True)
    np_, ni = rng.randint(0, 120), rng.randint(0, 60)
    dom = 500.0

    def coord():
        r = rng.random()
        if r < 0.04:
            return None
        if r < 0.06:
            return float("nan")
        if r < 0.08:
            return float("inf") if rng.random() < 0.5 else float("-inf")
        return round(rng.uniform(-dom, dom), 3)

    starts, ends, iid = [], [], []
    px = [coord() for _ in range(np_)]
    for j in range(ni):
        s = coord()
        if s is None or (isinstance(s, float) and (s != s or abs(s) == float("inf"))):
            e = coord()
        elif rng.random() < 0.1:
            e = s  # zero-length interval, inclusive both ends
        else:
            e = round(s + abs(rng.gauss(0, dom / 8)), 3)
        starts.append(s)
        ends.append(e)
        iid.append(j)
    # plant exact-boundary points for some intervals
    for j in range(0, ni, 7):
        if starts[j] is not None:
            px.append(starts[j])
        if ends[j] is not None:
            px.append(ends[j])
    write(f"{d}/points.parquet", ["pid", "x"],
          [list(range(len(px))), px], [pa.int64(), pa.float64()])
    write(f"{d}/intervals.parquet", ["iid", "s", "e"],
          [iid, starts, ends], [pa.int64(), pa.float64(), pa.float64()])
    return name


def expected_asof(con, d, keyed, forward, tol):
    cmp_op = "<=" if forward else ">="
    keycond = "lv2.k2 = rv2.k2 AND " if keyed else ""
    tol_pred = (f"mt IS NOT NULL AND abs(l.t - mt) <= {tol}"
                if tol is not None else "mt IS NOT NULL")
    # lv2 keeps only positioned (non-NULL-time) lefts for the ASOF — see module doc
    # on the DuckDB NULLs-sort-last divergence — and the final LEFT JOIN pads every
    # left row back (left-outer contract).
    sql = f"""
      WITH lv2 AS (SELECT lid, coalesce(k, {SENTINEL}) AS k2, t
                   FROM read_parquet('{d}/left.parquet') WHERE t IS NOT NULL),
           rv2 AS (SELECT coalesce(k, {SENTINEL}) AS k2, t, pv
                   FROM read_parquet('{d}/right.parquet') WHERE t IS NOT NULL),
           m AS (SELECT lv2.lid, rv2.pv, rv2.t AS mt
                 FROM lv2 ASOF LEFT JOIN rv2
                 ON {keycond}lv2.t {cmp_op} rv2.t)
      SELECT l.lid,
             CASE WHEN {tol_pred} THEN pv END AS pv,
             CASE WHEN {tol_pred} THEN mt END AS mt
      FROM read_parquet('{d}/left.parquet') l LEFT JOIN m USING (lid)
    """
    return con.execute(sql).fetchall()


def expected_range(con, d):
    return con.execute(f"""
      SELECT p.pid, i.iid
      FROM read_parquet('{d}/points.parquet') p
      JOIN read_parquet('{d}/intervals.parquet') i
        ON p.x >= i.s AND p.x <= i.e
      WHERE isfinite(p.x) AND isfinite(i.s) AND isfinite(i.e)
    """).fetchall()


def got_rows(con, d, cols):
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{d}/got.parquet/*.parquet')").fetchall()


def main():
    argv = sys.argv[1:]

    def opt(flag, default):
        return int(argv[argv.index(flag) + 1]) if flag in argv else default

    n_asof, n_range = opt("--trials-asof", 120), opt("--trials-range", 100)
    rng = random.Random(opt("--seed", 8))
    if "--skip-spark" not in argv:
        shutil.rmtree(ROOT, ignore_errors=True)
        os.makedirs(ROOT)
        names = [gen_asof(i, rng) for i in range(n_asof)] + \
                [gen_range(i, rng) for i in range(n_range)]
        print(f"generated {len(names)} trials under {ROOT}")
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_CPUS", "8")
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.tools.FuzzAsOf {ROOT}"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
        for line in r.stdout.splitlines():
            if "[fuzz]" in line or "rror" in line:
                print(" sbt:", line)
        if r.returncode != 0:
            print("SPARK RUN FAILED")
            print(r.stdout[-3000:])
            sys.exit(1)
    con = duckdb.connect()
    n_pass = n_fail = 0
    for name in sorted(os.listdir(ROOT)):
        d = os.path.join(ROOT, name)
        if not os.path.isdir(d):
            continue
        parts = name.split("_")
        if parts[0] == "asof":
            keyed, forward = parts[2] == "k1", parts[3] == "f1"
            tol = None if parts[4] == "tnone" else int(parts[4][1:])
            exp = expected_asof(con, d, keyed, forward, tol)
            got = got_rows(con, d, "lid, pv, mt")
        else:
            exp = expected_range(con, d)
            got = got_rows(con, d, "pid, iid")
        if sorted(exp, key=str) == sorted(got, key=str):
            n_pass += 1
        else:
            n_fail += 1
            only_exp = sorted(set(exp) - set(got), key=str)[:5]
            only_got = sorted(set(got) - set(exp), key=str)[:5]
            print(f"FAIL {name}: exp {len(exp)} rows, got {len(got)}")
            print(f"  only-expected: {only_exp}")
            print(f"  only-got:      {only_got}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
