#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare_local.py <sf_dir> <verify_out_dir>

For each query dumped by graft.Verify: load the Spark parquet result and the
DuckDB result of the oracle SQL over the same parquet tables, sort columns by
name, sort rows, and hash values — mirroring the driver's CORRECTNESS gate.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # driver-style: sort rows by all columns (must be hashable)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def norm_cell(v):
    if isinstance(v, (np.floating, float)):
        if pd.isna(v):
            return None
        return round(float(v), 6)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, bytes):
        return v.hex()
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return str(v)


def frame_hash(df: pd.DataFrame):
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            files = glob.glob(os.path.join(qdir, "*.parquet"))
            spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
                if files else pd.DataFrame()
            entry["spark_rows"] = len(spark_df)
            if name not in oracle:
                entry["err"] = "no_oracle"
                results[name] = entry
                continue
            odf = con.execute(oracle[name]).df()
            entry["oracle_rows"] = len(odf)
            s, o = canon(spark_df), canon(odf)
            entry["rows_match"] = len(s) == len(o)
            entry["schema_match"] = list(s.columns) == list(o.columns)
            if entry["rows_match"] and entry["schema_match"]:
                hs, ho = frame_hash(s), frame_hash(o)
                entry["hash_match"] = hs == ho
                if not entry["hash_match"]:
                    diffs = [(i, a, b) for i, (a, b) in enumerate(zip(hs, ho)) if a != b][:3]
                    entry["err"] = f"value diff, first: {diffs}"
            else:
                entry["err"] = (f"rows {len(s)} vs {len(o)}; "
                                f"cols {list(s.columns)} vs {list(o.columns)}")
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = entry
    npass = sum(1 for v in results.values() if v["hash_match"])
    for k, v in sorted(results.items()):
        status = "PASS" if v["hash_match"] else ("no_oracle" if v["err"] == "no_oracle" else "FAIL")
        print(f"{k:28s} {status}" + (f"  -- {v['err']}" if status == "FAIL" else ""))
    print(f"\n{npass}/{len(results)} green")
    json.dump(results, open("/tmp/correctness_local.json", "w"), indent=1, default=str)


if __name__ == "__main__":
    main()
