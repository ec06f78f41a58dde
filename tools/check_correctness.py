"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and (when an oracle exists) the oracle
SQL on DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (exact for ints/strings/decimals,
1e-9-relative for floats).  Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from gofeed_spark.catalog import TABLES
from gofeed_spark.queries import MIN_ROWS, ORACLES, QUERIES
from gofeed_spark.session import get_spark


def canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        return round(val, 9)
    return val


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows), key=_sort_key
    ), [cols[i] for i in order]


def compare(name, spark_df, con):
    if "sampled" in spark_df.columns:
        # the query declares it self-bounded by a deterministic sample at
        # this SF (q43 above its cap): the exact oracle is not comparable
        # BY DESIGN — skip the value check loudly instead of reporting a
        # mismatch that looks like a real bug (gate SFs never sample)
        return ("SAMPLED_SKIP", spark_df.count(), None)
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = spark_df.columns
    oracle = ORACLES.get(name)
    if oracle is None:
        return ("ROWS_ONLY", len(sp_rows), None)
    du = con.execute(oracle)
    du_cols = [d[0] for d in du.description]
    du_rows = du.fetchall()
    if len(sp_rows) != len(du_rows):
        return ("COUNT_MISMATCH", len(sp_rows), len(du_rows))
    if sorted(sp_cols) != sorted(du_cols):
        return ("COLS_MISMATCH", sp_cols, du_cols)
    a, _ = rows_to_multiset(sp_cols, sp_rows)
    b, _ = rows_to_multiset(du_cols, du_rows)
    if a == b:
        return ("OK", len(sp_rows), None)
    # find first diff for debugging
    diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
    return ("VALUE_MISMATCH", len(sp_rows), diffs)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # accept full names OR qNN prefixes; an argument matching NOTHING is
    # fatal — a vacuous filter must never print ALL OK (round-15 trap)
    asked = sys.argv[2:]
    only = set()
    for a in asked:
        hits = [n for n in QUERIES if n == a or n.startswith(a + "_")]
        if not hits:
            print(f"FATAL: {a!r} matches no registered query")
            sys.exit(2)
        only.update(hits)
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            status, n, detail = compare(name, fn(spark, sf_dir), con)
            # non-vacuity audit: a query that "passes" by matching an
            # EMPTY oracle verifies nothing (the r15 q14 trap) — flag any
            # zero-row result unless the registration declares min_rows=0
            if (
                status in ("OK", "ROWS_ONLY")
                and (n or 0) < MIN_ROWS.get(name, 1)
            ):
                status, detail = "VACUOUS", (
                    f"rows={n} < min_rows={MIN_ROWS.get(name, 1)} — the "
                    "check proves nothing at this SF"
                )
        except Exception as e:  # noqa: BLE001
            status, n, detail = "ERROR", None, repr(e)[:300]
        dt = time.time() - t0
        flag = "" if status in ("OK", "ROWS_ONLY", "SAMPLED_SKIP") else "  <<< FAIL"
        if status not in ("OK", "ROWS_ONLY", "SAMPLED_SKIP"):
            failures += 1
        print(f"{name:32s} {status:16s} rows={n} {dt:5.1f}s {detail if flag else ''}{flag}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
