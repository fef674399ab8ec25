#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles in oracle_sql.json and diff.

Usage: python3 tools/check.py <sfDir> <outDir>
(outDir = what graft.Verify wrote). Driver-side tooling only — the shipped
Scala library does not depend on this."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s, utc=True).dt.tz_localize(None)
            s = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            s = s.round(6)
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(spark_dir))
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"!= {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        else:
            eq = got.astype(str).equals(want.astype(str))
            if eq:
                print(f"PASS {name} ({len(got)} rows)")
                n_pass += 1
            else:
                diff = (got.astype(str) != want.astype(str))
                bad = diff.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; "
                      f"cols: {list(diff.any()[diff.any()].index)}")
                i = bad.idxmax()
                print(f"  spark row {i}: {got.loc[i].to_dict()}")
                print(f"  duck  row {i}: {want.loc[i].to_dict()}")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


def bench_fallback(repo_dir: str = ".") -> int:
    """Recover the bench JSON line when the stdout tail was truncated
    (the round-4 `parsed: null` failure mode): graft.Bench always writes
    its complete output to BENCH_LATEST.json as a file fallback — re-emit
    it as the single JSON line a driver parser expects."""
    p = os.path.join(repo_dir, "BENCH_LATEST.json")
    if not os.path.exists(p):
        print(f"no {p}", file=sys.stderr)
        return 1
    with open(p) as f:
        print(json.dumps(json.load(f), separators=(",", ":")))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bench":
        sys.exit(bench_fallback(sys.argv[2] if len(sys.argv) > 2 else "."))
    sys.exit(main(sys.argv[1], sys.argv[2]))
