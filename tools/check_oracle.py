"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at the same
scale factor, compare row count, column names, and an order-insensitive
value multiset (doubles rounded to 6dp before hashing).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = Counter()
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out[tuple(vals)] += 1
    return out


def main(sf_dir: str, only: list[str] | None = None):
    import __spark_entry__ as entrymod
    from knowledge_graph_builder_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        unknown = sorted(set(only) - set(qs))
        if unknown:  # a typo must not pass as "0 failures / 0 queries"
            print(f"unknown query name(s): {unknown}; known: {sorted(qs)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as exc:
            failures.append((name, f"spark error: {exc}"))
            print(f"[FAIL] {name}: spark error: {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as exc:
            failures.append((name, f"duckdb error: {exc}"))
            print(f"[FAIL] {name}: duckdb error: {str(exc)[:300]}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} vs {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if not problems:
            cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if cs != cd:
                diff_s = list((cs - cd).items())[:3]
                diff_d = list((cd - cs).items())[:3]
                problems.append(f"values differ; spark-only={diff_s} duck-only={diff_d}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)[:500]}")
        else:
            print(f"[ok] {name}: {len(s_rows)} rows match")
    spark.stop()
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
