#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each engine result (parquet dumped by graft.Verify) against the
DuckDB oracle SQL (oracle_sql.json), canonicalizes both sides the way the
driver does (columns sorted by name, rows sorted, doubles rounded to 6
decimals, timestamps rendered UTC ISO-8601), and reports per-query
match/mismatch with a sample diff.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype(object).where(s.notna(), None)
            out[c] = out[c].apply(lambda v: str(v) if v is not None else None)
    r = pd.DataFrame(out)
    r = r.sort_values(by=list(r.columns), na_position="first").reset_index(drop=True)
    return r


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no engine output")
            failures += 1
            continue
        try:
            eng = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read engine output: {e}")
            failures += 1
            continue
        try:
            ora = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        ce, co = canon(eng), canon(ora)
        if list(ce.columns) != list(co.columns):
            print(f"FAIL {name}: columns engine={list(ce.columns)} oracle={list(co.columns)}")
            failures += 1
            continue
        if len(ce) != len(co):
            print(f"FAIL {name}: rows engine={len(ce)} oracle={len(co)}")
            failures += 1
            continue
        if ce.equals(co):
            print(f"PASS {name} ({len(ce)} rows)")
        else:
            neq = (ce != co) & ~(ce.isna() & co.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(ce)} rows differ; first diffs:")
            idx = ce.index[bad][:3]
            for i in idx:
                cols = [c for c in ce.columns if neq.at[i, c]]
                for c in cols[:4]:
                    print(f"  row {i} col {c}: engine={ce.at[i, c]!r} oracle={co.at[i, c]!r}")
            failures += 1
    # queries without oracle: rows-only check, driven by the manifest so a
    # crashed query (missing/empty output dir) is a FAIL, not a skip
    try:
        manifest = json.load(open(f"{out_dir}/queries.json"))
    except (FileNotFoundError, ValueError):
        # missing OR truncated/corrupt manifest (Verify killed mid-write):
        # fall back to the directory listing rather than crashing the gate
        manifest = [d.rstrip("/").split("/")[-1]
                    for d in glob.glob(f"{out_dir}/*/")]
    for name in sorted(manifest):
        if name in oracle:
            continue
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name} (rows-only: no engine output)")
            failures += 1
            continue
        n = sum(len(pd.read_parquet(p)) for p in parts)
        print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n} rows)")
        failures += 0 if n > 0 else 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
