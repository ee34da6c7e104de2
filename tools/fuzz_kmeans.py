#!/usr/bin/env python3
"""Randomized differential fuzz of the k-means/IVF assignment kernel against DuckDB.

Generates N random trials, runs the engine half in ONE JVM via graft.tools.FuzzKmeans
(ivfAssign with centroids = first k non-null vectors by vid), then replays every
trial in DuckDB with the EXPLICIT double dot/norm cosine formula and diffs
(vid, cell) sets exactly.

    python3 tools/fuzz_kmeans.py [--trials 150] [--seed 11]
    python3 tools/fuzz_kmeans.py --skip-spark   # re-compare existing outputs

Covered hostile classes per trial draw:
  - zero-norm vectors (ivfAssign contract: fall back to cell 0)
  - exact duplicate vectors, vectors equal to a centroid (exact cosine ties —
    tie-break is LAST best wins, i.e. the HIGHEST cell: s >= best in ivfAssign)
  - NULL embeddings (no cell, absent from output on both sides)
  - tiny/large dims (2..16), k up to 5, n up to 200, empty corpora
  - float32 storage on both sides, double math on both sides

This is the FP-parity guard for the kmeans_assign_embeddings oracle query: any
argmax flip between Spark's fused double loop and DuckDB's list_dot_product
shows up as a set diff here across hundreds of random geometries.
"""
import argparse
import os
import random
import shutil
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = "/tmp/fuzz_kmeans"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen(i, rng):
    k = rng.randint(1, 5)
    name = f"kmeans_{i:03d}_k{k}"
    d = os.path.join(ROOT, name)
    os.makedirs(d, exist_ok=True)
    n = rng.choice([0, 1, 2, rng.randint(3, 200)])
    dim = rng.randint(2, 16)
    vids, vecs = [], []
    pool = []  # previously drawn vectors, for exact-duplicate planting
    for j in range(n):
        r = rng.random()
        if r < 0.05:
            v = None  # NULL embedding: no cell
        elif r < 0.12:
            v = [0.0] * dim  # zero-norm: cell 0 by contract
        elif r < 0.25 and pool:
            v = list(rng.choice(pool))  # exact duplicate (ties exercise s >= best)
        else:
            v = [round(rng.uniform(-2, 2), 4) for _ in range(dim)]
        if v is not None:
            pool.append(v)
        vids.append(j)
        vecs.append(v)
    pq.write_table(pa.table({
        "vid": pa.array(vids, type=pa.int64()),
        "v": pa.array(vecs, type=pa.list_(pa.float32())),
    }), f"{d}/vecs.parquet")
    return name


SQL = """
WITH e AS (SELECT vid, v FROM read_parquet('{d}/vecs.parquet') WHERE v IS NOT NULL),
 c AS (SELECT v::DOUBLE[] AS cv, row_number() OVER (ORDER BY vid) - 1 AS cell
   FROM e ORDER BY vid LIMIT {k})
SELECT e.vid, coalesce((
    SELECT c.cell FROM c
    WHERE NOT isnan(list_dot_product(e.v::DOUBLE[], c.cv) /
      (sqrt(list_dot_product(e.v::DOUBLE[], e.v::DOUBLE[])) * sqrt(list_dot_product(c.cv, c.cv))))
    ORDER BY list_dot_product(e.v::DOUBLE[], c.cv) /
      (sqrt(list_dot_product(e.v::DOUBLE[], e.v::DOUBLE[])) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      c.cell DESC LIMIT 1), CAST(0 AS BIGINT)) AS cell
FROM e
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=150)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--skip-spark", action="store_true")
    args = ap.parse_args()

    if not args.skip_spark:
        shutil.rmtree(ROOT, ignore_errors=True)
        os.makedirs(ROOT, exist_ok=True)
        rng = random.Random(args.seed)
        names = [gen(i, rng) for i in range(args.trials)]
        print(f"[fuzz] generated {len(names)} trials under {ROOT}")
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.tools.FuzzKmeans {ROOT}'],
            cwd=REPO, capture_output=True, text=True)
        if "[fuzz] ran" not in r.stdout:
            print(r.stdout[-3000:], r.stderr[-2000:])
            sys.exit("spark half failed")

    con = duckdb.connect()
    fails = 0
    trials = sorted(d for d in os.listdir(ROOT) if d.startswith("kmeans_"))
    for name in trials:
        d = os.path.join(ROOT, name)
        k = int(name.split("_")[2][1:])
        want = set(map(tuple, con.execute(SQL.format(d=d, k=k)).fetchall()))
        try:
            got = set(map(tuple, con.execute(
                f"SELECT vid, cell FROM read_parquet('{d}/got.parquet/*.parquet')"
            ).fetchall()))
        except duckdb.IOException:
            got = set()  # empty spark write -> no part files
        if got != want:
            fails += 1
            print(f"FAIL {name}: extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}")
    print(f"== {len(trials) - fails}/{len(trials)} trials match ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
