#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with a view
per testdata table, and compares: columns sorted by name, rows sorted by all
columns, values compared exactly (with a near-miss report for floats).

Dev tool only — NOT part of the Scala engine.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, decimals to float-ish strings? keep raw;
    # sort rows by all columns (stringified for stable mixed-type sort)
    if len(df) > 0:
        key = df.astype(str)
        order = key.sort_values(by=list(df.columns)).index
        df = df.loc[order].reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    ok = True
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: columns differ\n  spark={sorted(got.columns)}\n  oracle={sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"FAIL {name}: row count spark={len(got)} oracle={len(want)}")
        return False
    # the driver hashes TYPED encodings, so a DuckDB HUGEINT next to a
    # Spark BIGINT fails there even when every value prints the same
    # (round-5 q103); approximate that check with a dtype compare
    def family(dt: str) -> str:
        dt = str(dt)
        for f in ("int", "float", "bool", "datetime", "object", "str"):
            if f in dt:
                return "object" if f == "str" else f
        return dt
    for col in sorted(got.columns):
        ga, wa = str(got[col].dtype), str(want[col].dtype)
        # columns with nulls decay to float64/object on either side —
        # only adjudicate when both sides are null-free
        if family(ga) != family(wa) and not (
                got[col].isna().any() or want[col].isna().any()):
            print(f"FAIL {name}: dtype family differs on {col}: "
                  f"spark={ga} oracle={wa} — driver's typed hash would mismatch")
            ok = False
    got, want = norm(got), norm(want)
    n_bad = 0
    for col in got.columns:
        for i in range(len(got)):
            a, b = got[col].iloc[i], want[col].iloc[i]
            if not values_equal(a, b):
                if n_bad < 5:
                    print(f"FAIL {name}: row {i} col {col}: spark={a!r} oracle={b!r}")
                n_bad += 1
    if n_bad:
        print(f"FAIL {name}: {n_bad} mismatched cells / {len(got)} rows")
        ok = False
    return ok


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    result_dirs = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(result_dirs):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})" if len(got) > 0 else "ROWS_ONLY_EMPTY!"
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            results[name] = "ORACLE_SQL_ERROR"
            continue
        results[name] = "OK" if compare(name, got, want) else "MISMATCH"
    for name in sorted(oracles):
        if name not in result_dirs:
            results[name] = "MISSING_RESULT"
    print("\n=== summary ===")
    bad = 0
    for name, r in sorted(results.items()):
        print(f"  {r:>18}  {name}")
        bad += r not in ("OK",) and not r.startswith("ROWS_ONLY(")
    print(f"{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
