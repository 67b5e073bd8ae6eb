"""Local mimic of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on DuckDB
at the given sf dir; compare row count + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from maga_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_row(row, cols):
    # driver sorts columns by name before hashing — mimic that
    return tuple(norm(row[c]) for c in sorted(cols))


def values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:24s} SPARK-ERROR {str(e)[:120]}")
            continue
        if name not in os_:
            print(f"{name:24s} rows-only  n={len(srows)}")
            continue
        try:
            ddf = con.execute(os_[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:24s} DUCKDB-ERROR {str(e)[:120]}")
            continue
        dcols = list(ddf.columns)
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            failures.append((name, f"SCHEMA: spark={sorted(scols)} duck={sorted(dcols)}"))
            print(f"{name:24s} SCHEMA-MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            continue
        if len(srows) != len(ddf):
            failures.append((name, f"ROWS: spark={len(srows)} duck={len(ddf)}"))
            print(f"{name:24s} ROWCOUNT-MISMATCH spark={len(srows)} duck={len(ddf)}")
            continue
        s_set = sorted(norm_row(r.asDict(), scols) for r in srows)
        d_records = ddf.to_dict("records")
        d_set = sorted(tuple(norm(r[c]) for c in sorted(dcols)) for r in d_records)
        bad = None
        for i, (x, y) in enumerate(zip(s_set, d_set)):
            if len(x) != len(y) or not all(values_equal(a, b) for a, b in zip(x, y)):
                bad = (i, x, y)
                break
        if bad:
            failures.append((name, f"VALUES @ {bad[0]}: spark={bad[1]} duck={bad[2]}"))
            print(f"{name:24s} VALUE-MISMATCH @{bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        else:
            print(f"{name:24s} OK  n={len(srows)}")

    print()
    if failures:
        print(f"FAILURES: {len(failures)}")
        sys.exit(1)
    print("ALL OK")
    spark.stop()


if __name__ == "__main__":
    main()
