#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
with views over <sfDir>/*.parquet, and compares: column names, row counts,
and values (rows sorted over all columns, column order normalized by name).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_result(path: Path) -> pd.DataFrame:
    files = sorted(path.glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {path}")
    return pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf or abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return str(a) == str(b)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
        return False
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        return False
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        # The driver's gate hashes exact stringified values, so an int64
        # column on one side vs float64 on the other ("1" vs "1.0") fails
        # there even when numerically equal (e.g. DuckDB HUGEINT sums
        # arrive in pandas as float64 — CAST ... AS BIGINT in the oracle).
        gi, wi = pd.api.types.is_integer_dtype(g[c]), pd.api.types.is_integer_dtype(w[c])
        if gi != wi:
            print(f"FAIL {name}: col {c} dtype class mismatch: "
                  f"spark={g[c].dtype} duckdb={w[c].dtype} (driver hash would differ)")
            return False
    for c in g.columns:
        gv, wv = g[c].tolist(), w[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if not values_equal(a, b)]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: col {c} differs at sorted-row {i}: spark={a!r} duckdb={b!r} ({len(bad)} diffs)")
            return False
    print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols")
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = load_result(Path(out_dir) / name)
        except FileNotFoundError:
            print(f"FAIL {name}: spark result missing")
            fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        if compare(name, got, want):
            ok += 1
        else:
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
