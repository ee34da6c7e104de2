#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify at a given SF,
then execute each oracle SQL in DuckDB over the same parquet tables and compare
(column-name-sorted, row-sorted, exact values).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [--skip-spark]
"""
import sys, os, json, subprocess, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify(sf_dir, out_dir):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1200)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print("  sbt:", line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print("  sbt-err:", line)
    if r.returncode != 0:
        print("VERIFY FAILED rc=", r.returncode)
        print(r.stdout[-3000:])
        sys.exit(1)


def compare(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    # A query that threw in Verify has no output dir (Verify deletes it so the driver
    # can't compare stale data) — surface those as failures instead of skipping them.
    failed_manifest = []
    fj = os.path.join(out_dir, "failed.json")
    if os.path.exists(fj):
        with open(fj) as f:
            failed_manifest = json.load(f)
    for name in failed_manifest:
        print(f"  {name}: FAIL engine error (see [verify] stderr)")
        n_fail += 1
    for name in sorted(oracles):
        if name not in failed_manifest and not os.path.isdir(os.path.join(out_dir, name)):
            print(f"  {name}: FAIL missing output dir")
            n_fail += 1
    declared = sorted(os.listdir(out_dir))
    for name in declared:
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        # Nullable dtypes on BOTH sides: the numpy backend maps SQL NULL to NaN in
        # float columns, which made NULL-vs-NaN divergences (exactly the class the
        # Metrics.ratio / profiler fixes target) invisible to this gate.
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
        if ok:
            n_pass += 1
            print(f"  {name}: PASS ({len(spark_df)} rows)")
        else:
            n_fail += 1
            print(f"  {name}: FAIL {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return n_fail


import pyarrow as pa

# Arrow → pandas nullable dtypes, mirroring read_parquet(dtype_backend="numpy_nullable")
# so SQL NULL materializes as pd.NA (isna-only) while a value NaN stays a float value.
NULLABLE_DTYPES = {
    pa.float64(): pd.Float64Dtype(), pa.float32(): pd.Float32Dtype(),
    pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int32Dtype(),
    pa.int16(): pd.Int16Dtype(), pa.int8(): pd.Int8Dtype(),
    pa.bool_(): pd.BooleanDtype(), pa.string(): pd.StringDtype(),
    pa.large_string(): pd.StringDtype(),
}


def frames_equal(a, b):
    import numpy as np
    a = a.reindex(sorted(a.columns), axis=1)
    b = b.reindex(sorted(b.columns), axis=1)
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: {len(a)} vs {len(b)}"
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            # NULL placement must agree before values are compared: with nullable
            # dtypes isna() is True for SQL NULL only, never for a value NaN.
            if not (av.isna().to_numpy() == bv.isna().to_numpy()).all():
                return False, f"col {c} NULL mask differs: {av.tolist()[:5]} vs {bv.tolist()[:5]}"
            if str(av.dtype).lower().startswith("float") or str(bv.dtype).lower().startswith("float"):
                an = av.to_numpy(dtype="float64", na_value=np.nan)
                bn = bv.to_numpy(dtype="float64", na_value=np.nan)
                # Masks already matched, so NaN==NaN here only equates value NaNs
                # (or the mask-verified shared NULLs).
                if not np.allclose(an, bn, rtol=0, atol=0, equal_nan=True):
                    return False, f"col {c}: {av.tolist()[:5]} vs {bv.tolist()[:5]}"
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    return False, f"col {c}: {av.tolist()[:5]} vs {bv.tolist()[:5]}"
        except Exception as e:
            return False, f"col {c} compare error: {e}"
    return True, ""


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--skip-spark" not in sys.argv:
        run_verify(sf_dir, out_dir)
    sys.exit(1 if compare(sf_dir, out_dir) else 0)
