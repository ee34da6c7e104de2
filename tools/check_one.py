#!/usr/bin/env python3
"""Single-query slice of the t2 gate for fast iteration: run one (or a few,
comma-separated) SparkEntry queries via graft.tools.RunQuery, then compare
each against its DuckDB oracle with the SAME frames_equal logic as
check_oracle.py.

Usage: python3 tools/check_one.py /root/testdata/sf0.01 name1[,name2,...] [--skip-spark]
"""
import sys, os, json, subprocess, glob
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, NULLABLE_DTYPES, frames_equal

OUT = "/tmp/check_one_out"


def main():
    sf_dir, names = sys.argv[1], sys.argv[2]
    if "--skip-spark" not in sys.argv:
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_CPUS", "8")
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.tools.RunQuery {sf_dir} {OUT} {names}"],
            cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1200)
        for line in r.stdout.splitlines():
            if "[runquery]" in line or "rror" in line:
                print("  sbt:", line)
        if r.returncode != 0:
            print("RUNQUERY FAILED rc=", r.returncode)
            print(r.stdout[-4000:])
            sys.exit(1)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{OUT}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name in names.split(","):
        path = os.path.join(OUT, name)
        spark_df = pd.concat([
            pd.read_parquet(p, dtype_backend="numpy_nullable")
            for p in glob.glob(f"{path}/*.parquet")])
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracles[name]).arrow().to_pandas(
                types_mapper=NULLABLE_DTYPES.get)
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        ok, msg = frames_equal(spark_df, duck_df)
        print(f"  {name}: {'PASS (%d rows)' % len(spark_df) if ok else 'FAIL ' + str(msg)}")
        n_fail += 0 if ok else 1
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
