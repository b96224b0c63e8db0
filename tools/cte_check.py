#!/usr/bin/env python3
"""Chunked-CTE oracle compare — for oracles whose single-statement form
exceeds single-process DuckDB memory at the 10x replica (the unrolled
k-means fit behind sim_semdedup: CTE inlining re-expands the 5-iteration
chain, so the one-statement plan OOMs where the math is tiny).

This tool parses the oracle SQL's top-level WITH chain and materializes
each CTE as a TEMP TABLE in order — peak memory is ONE stage (plus disk
spill), not the optimizer's inlined expansion — then runs the final
SELECT and compares against the Spark parquet dump with the same
normalize/compare discipline as oracle_check.py (including the
int-vs-float dtype gate).

The oracle text itself is UNCHANGED — it is read from the Verify dump's
oracle_sql.json, so this checks the exact SQL the driver runs, just
evaluated stage-by-stage.

Usage: python3 tools/cte_check.py <sfDir> <verifyOutDir> <query> [memGB]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir, query = sys.argv[1], sys.argv[2], sys.argv[3]
mem_gb = sys.argv[4] if len(sys.argv) > 4 else "24"


def split_ctes(sql: str):
    """Return ([(name, body)], final_select) from a WITH-chain statement.

    Scans with paren-depth + single-quote awareness; only top-level
    commas separate CTEs.
    """
    s = sql.strip()
    assert s.upper().startswith("WITH"), "oracle is not a WITH chain"
    i = len("WITH")
    ctes = []
    n = len(s)
    while True:
        # identifier
        while s[i].isspace():
            i += 1
        j = i
        while j < n and (s[j].isalnum() or s[j] == "_"):
            j += 1
        name = s[i:j]
        i = j
        while s[i].isspace():
            i += 1
        assert s[i:i + 2].upper() == "AS", f"expected AS after {name}"
        i += 2
        while s[i].isspace():
            i += 1
        # optional MATERIALIZED hint (this runner materializes every CTE
        # anyway, so the keyword is consumed and dropped)
        if s[i:i + 12].upper() == "MATERIALIZED":
            i += 12
            while s[i].isspace():
                i += 1
        assert s[i] == "(", f"expected ( after {name} AS"
        depth, i0 = 0, i
        in_str = False
        while i < n:
            c = s[i]
            if in_str:
                if c == "'":
                    # '' is an escaped quote inside a literal
                    if i + 1 < n and s[i + 1] == "'":
                        i += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        body = s[i0 + 1:i]
        ctes.append((name, body))
        i += 1
        while i < n and s[i].isspace():
            i += 1
        if s[i] == ",":
            i += 1
            continue
        return ctes, s[i:]


con = duckdb.connect()
con.execute(f"SET memory_limit='{mem_gb}GB'")
os.makedirs("/tmp/duck_spill", exist_ok=True)
con.execute("SET temp_directory='/tmp/duck_spill'")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    sql = json.load(f)[query]

ctes, final = split_ctes(sql)
for nm, body in ctes:
    con.execute(f"CREATE TEMP TABLE {nm} AS {body}")
    cnt = con.sql(f"SELECT count(*) FROM {nm}").fetchone()[0]
    print(f"  [cte] {nm}: {cnt} rows")
duck_df = con.sql(final).df()

d = os.path.join(out_dir, query)
spark_df = pd.concat(
    [pd.read_parquet(f) for f in glob.glob(os.path.join(d, "*.parquet"))],
    ignore_index=True)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


a, b = norm(spark_df), norm(duck_df)
if list(a.columns) != list(b.columns):
    print(f"[FAIL-cols] {query}: spark={list(a.columns)} duck={list(b.columns)}")
    sys.exit(1)
if len(a) != len(b):
    print(f"[FAIL-rows] {query}: spark={len(a)} duck={len(b)}")
    sys.exit(1)


def kind(dt):
    return "i" if dt.kind == "u" else dt.kind


bad = [c for c in a.columns
       if kind(a[c].dtype) != kind(b[c].dtype)
       and {kind(a[c].dtype), kind(b[c].dtype)} <= {"i", "f"}]
if bad:
    det = {c: f"spark={a[c].dtype} duck={b[c].dtype}" for c in bad}
    print(f"[FAIL-dtype] {query}: int-vs-float divergence {det}")
    sys.exit(1)
try:
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    print(f"[OK] {query}: {len(a)} rows (chunked-CTE oracle)")
except AssertionError as e:
    print(f"[FAIL-vals] {query}: {str(e).splitlines()[-1] if str(e) else e}")
    sys.exit(1)
