#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL in DuckDB (tables = parquet files in sfDir),
sort columns by name, sort rows, and compare values cell-by-cell.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # ScaleUp replicas are Spark-written DIRECTORIES named table.parquet/
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to naive UTC strings
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
# A query that ERRORS inside Verify writes no result dir at all — that
# must be a loud failure here, not a silent skip (stream_dedup_incremental
# r7: the error line scrolled past while the compare stayed green).
present = {n for n in os.listdir(out_dir)
           if os.path.isdir(os.path.join(out_dir, n))}
# --subset: the Verify dump was run for an explicit query subset
# (local iteration), so absent dirs are expected — skip the check.
missing = [] if "--subset" in sys.argv[3:] else sorted(set(oracles) - present)
for name in missing:
    print(f"[FAIL-missing] {name}: oracle registered but no Verify result "
          f"(query errored during the dump?)")
    fails += 1
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(d, "*.parquet"))],
        ignore_index=True) if glob.glob(os.path.join(d, "*.parquet")) else pd.DataFrame()
    if name not in oracles:
        print(f"[rows-only] {name}: {len(spark_df)} rows")
        continue
    duck_df = con.sql(oracles[name]).df()
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"[FAIL-cols] {name}: spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"[FAIL-rows] {name}: spark={len(a)} duck={len(b)}")
        fails += 1
        continue
    # Driver-strength dtype gate: the driver hashes VALUES, so an
    # integer column on one engine vs a float column on the other
    # ("5" vs "5.0") is a hash mismatch even when cell values agree.
    # This is exactly the DuckDB HUGEINT class (sum of integers widens
    # to HUGEINT -> pandas float64) that killed sketch_ams_f2 in r06
    # while passing the old check_dtype=False compare. int32 vs int64
    # is still fine (same printed values), so compare dtype KIND with
    # the int family collapsed.
    def kind(dt):
        k = dt.kind  # 'i' int, 'u' uint, 'f' float, 'O' object, 'b', 'M'
        return "i" if k == "u" else k
    kind_bad = [
        c for c in a.columns
        if kind(a[c].dtype) != kind(b[c].dtype)
        and {kind(a[c].dtype), kind(b[c].dtype)} <= {"i", "f"}]
    if kind_bad:
        det = {c: f"spark={a[c].dtype} duck={b[c].dtype}" for c in kind_bad}
        print(f"[FAIL-dtype] {name}: int-vs-float divergence {det}")
        fails += 1
        continue
    soft = [
        c for c in a.columns if kind(a[c].dtype) != kind(b[c].dtype)]
    if soft:
        det = {c: f"spark={a[c].dtype} duck={b[c].dtype}" for c in soft}
        print(f"[warn-dtype] {name}: kind mismatch (non-fatal) {det}")
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"[OK] {name}: {len(a)} rows")
    except AssertionError as e:
        print(f"[FAIL-vals] {name}: {str(e).splitlines()[-1] if str(e) else e}")
        fails += 1
sys.exit(1 if fails else 0)
