#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each Spark result (parquet dumped by graft.Verify) against the
DuckDB oracle SQL from oracle_sql.json over the same testdata parquet
tables, sorts columns by name and rows by value, and compares exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def tag(v):
    """Driver-style canonical cell string: type-tagged so an int on one
    side and a float on the other (e.g. DuckDB HUGEINT -> pandas float64
    vs Spark BIGINT) hash differently even though == would pass.
    Integer WIDTH (int32 vs int64) is deliberately not distinguished."""
    import numpy as np
    if v is None:
        return "\0"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "f:NaN" if math.isnan(f) else f"f:{repr(f)}"
    if isinstance(v, (bytes, bytearray)):
        return "y:" + bytes(v).hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(tag(x) for x in v) + "]"
    return f"s:{v}"


def canon(df):
    """Sort columns by name, rows by tagged values; cells -> tag strings."""
    df = df[sorted(df.columns)]
    rows = [tuple(tag(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return list(df.columns), rows


def cell_eq(a, b):
    return a == b


def table_hash(rows):
    import hashlib
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:12]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
        if [c.lower() for c in sc] != [c.lower() for c in dc]:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: row count spark={len(sr)} duck={len(dr)}")
            for r in sr[:3]:
                print("   spark:", r)
            for r in dr[:3]:
                print("   duck :", r)
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if len(a) != len(b) or not all(cell_eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i} differs\n   spark: {a}\n   duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows hash={table_hash(sr)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
