#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the sf parquet tables, read the Spark result parquet, sort columns
by name, and compare rows IN RESULT ORDER (the driver's t2 gate is an
order-sensitive hash compare, so this checker must be at least as strict —
a wrong ORDER BY must fail here, not only on the driver).
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical value form: stringify like a hash would see it
    def cell(v):
        if v is None or v != v:  # NaN/None
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        # DuckDB fetchdf() yields DATE as midnight Timestamps; parquet read
        # yields datetime.date — normalize both to the ISO date string.
        if isinstance(v, pd.Timestamp) and v.time() == pd.Timestamp(0).time():
            return v.date().isoformat()
        return str(v)
    return df.map(cell).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        nw, ng = norm(want), norm(got)
        if list(nw.columns) != list(ng.columns):
            print(f"FAIL {name}: columns want={list(nw.columns)} got={list(ng.columns)}")
            n_bad += 1
        elif len(nw) != len(ng):
            print(f"FAIL {name}: rows want={len(nw)} got={len(ng)}")
            n_bad += 1
        elif not nw.equals(ng):
            diff = (nw != ng).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(nw)} rows differ; first:")
            i = diff.idxmax()
            print("  want:", nw.loc[i].to_dict())
            print("  got: ", ng.loc[i].to_dict())
            n_bad += 1
        else:
            print(f"OK   {name} ({len(nw)} rows)")
    # queries with no oracle: rows-only note
    have = set(oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        qn = d.rstrip("/").split("/")[-1]
        if qn not in have:
            n = sum(len(pd.read_parquet(f)) for f in glob.glob(d + "*.parquet"))
            print(f"ROWS {qn}: {n} rows (no oracle)")
    return n_bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
