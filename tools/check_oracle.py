#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run Verify output
against DuckDB oracle SQL and compare (columns sorted by name, rows
sorted, exact value equality). Usage:
    python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(oracle[name]).df())
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                try:
                    eq = (g.values == w.values) | (g.isna().values & w.isna().values)
                except Exception:
                    eq = g.astype(str).values == w.astype(str).values
                if not eq.all():
                    i = int((~eq).argmax())
                    print(f"FAIL {name}: col {c} row {i}: spark={g.iloc[i]!r} duckdb={w.iloc[i]!r} "
                          f"(dtypes {g.dtype}/{w.dtype}; {int((~eq).sum())} diffs)")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
