"""Declared relational queries Q01-Q26 + Q31-Q33 (SURVEY.md §2.C).

Each implementation is pure DataFrame API (Catalyst built-ins only — no UDFs,
no collect), with the DuckDB oracle SQL registered next to it.  Column names
AND types are aligned with the oracle (the driver hashes values after sorting
columns by name, so every computed column is aliased identically on both
sides, and integer-width/decimal-scale differences are cast away).

Provenance markers cite the reference operator each query generalizes
(e.g. R3 = group-by-count at /root/reference/internal/state/repo.go:141-162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gofeed_spark.catalog import load_table, table_rowcount
from gofeed_spark.functions.parallel import compute_width
from gofeed_spark.operators.asof import asof_join_last_event
from gofeed_spark.queries.registry import query

D18_2 = "decimal(18,2)"
D18_4 = "decimal(18,4)"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rows(sf_dir: str, name: str) -> int | None:
    try:
        return table_rowcount(sf_dir, name)
    except Exception:  # noqa: BLE001 — sizing hint only, never load-bearing
        return None


def TW(spark: SparkSession, sf_dir: str, name: str, *keys: str) -> DataFrame:
    """Table scan widened on the window/partition key: a window's sort
    is compute-bound over byte-slim rows, and AQE's byte-based reducer
    coalescing funnels it onto 1-2 cores at any SF whose shuffle stays
    under the advisory size.  ``compute_width`` repartitions by CORES
    instead (exempt from coalescing), gated on the table's footer row
    count so small scans skip the extra exchange — the window reuses
    this exact hash distribution, so no second shuffle is added."""
    return compute_width(
        T(spark, sf_dir, name), *keys, n=_rows(sf_dir, name)
    )


# --- Q01 scan/projection (R1 scan shape) ---------------------------------
@query(
    "q01_scan_project",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey
""",
)
def q01(spark, sf_dir):
    # Column pruning: ReadSchema in the parquet scan carries only 3 columns.
    return T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")


# --- Q02 filter: inequality + time range (R1 repo.go:110-111) -------------
@query(
    "q02_filter_ineq_time",
    oracle="""
SELECT event_id, user_id, event_type FROM events
WHERE event_type <> 'complete' AND ts < TIMESTAMP '2024-06-01 00:00:00'
ORDER BY event_id
""",
)
def q02(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return e.filter(
        (F.col("event_type") != "complete")
        & (F.col("ts") < F.to_timestamp(F.lit("2024-06-01 00:00:00")))
    ).select("event_id", "user_id", "event_type")


# --- Q03 filter: conjunctive equality (R2 repo.go:117-118) -----------------
@query(
    "q03_filter_conj_eq",
    oracle="""
SELECT event_id, value FROM events
WHERE user_id = 7 AND event_type = 'click' ORDER BY event_id
""",
)
def q03(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return e.filter((F.col("user_id") == 7) & (F.col("event_type") == "click")).select(
        "event_id", "value"
    )


# --- Q04 sort + limit (R2 repo.go:118-119) --------------------------------
@query(
    "q04_sort_limit",
    oracle="""
SELECT event_id, ts FROM events WHERE event_type = 'click'
ORDER BY ts, event_id LIMIT 100
""",
)
def q04(spark, sf_dir):
    # Catalyst plans this as TakeOrderedAndProject — per-partition top-k
    # then driver-side k-way merge; no total sort even at 100 TB.
    e = T(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "click")
        .select("event_id", "ts")
        .orderBy("ts", "event_id")
        .limit(100)
    )


# --- Q05 group-by count (R3 repo.go:141-162 = GetCountByStatus) ------------
@query(
    "q05_groupby_count",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n FROM orders
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def q05(spark, sf_dir):
    return T(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(F.count("*").alias("n"))


# --- Q06 multi-agg with exact decimals (TPC-H Q1 shape, R3 generalized) ----
@query(
    "q06_groupby_multiagg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q06(spark, sf_dir):
    # Exact fixed-point aggregation in LONG cents: round(x*100) recovers the
    # exact 2-decimal value, the long sum stays in whole-stage codegen
    # (Spark's DECIMAL sum is an order of magnitude slower), and /100.0 at
    # the end lands on the same IEEE double as the oracle's
    # DECIMAL-sum→DOUBLE cast.  Headroom: 9.2e18 cents ≈ 9e4 trillion —
    # safe at any TPC-H scale factor.
    l = T(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents("l_quantity")) / 100.0).alias("sq"),
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sp"),
            F.count("*").alias("n"),
        )
    )


# --- Q07 count distinct ----------------------------------------------------
@query(
    "q07_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS n FROM orders",
)
def q07(spark, sf_dir):
    return T(spark, sf_dir, "orders").agg(F.countDistinct("o_custkey").alias("n"))


# --- Q08 having (R3 + R8 threshold watcher.go:147-150) ---------------------
@query(
    "q08_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n FROM orders
GROUP BY o_custkey HAVING COUNT(*) >= 3 ORDER BY o_custkey
""",
)
def q08(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
    )


# --- Q09 rollup -------------------------------------------------------------
@query(
    "q09_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n
""",
)
def q09(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


# --- Q10 inner equi-join ----------------------------------------------------
@query(
    "q10_inner_join",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
ORDER BY o.o_orderkey
""",
)
def q10(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    # customer scales linearly with SF — a forced broadcast OOMs at cluster
    # scale.  Leave the strategy to AQE/autoBroadcastJoinThreshold: small SFs
    # still get a broadcast join, big ones a shuffled hash join.
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("c_custkey", "c_name", "o_orderkey")
    )


# --- Q11 3-way join + agg ---------------------------------------------------
@query(
    "q11_join3_agg",
    oracle="""
SELECT n.n_name, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""",
)
def q11(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    # customer scales with SF — no forced broadcast (AQE picks the strategy);
    # nation is a fixed 25-row dimension, always broadcast-safe.
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        # exact fixed-point sum in LONG cents (same convention as q06):
        # matches the oracle's SUM(DECIMAL(18,2))→DOUBLE bit-for-bit while
        # keeping the aggregate in codegen'd long arithmetic instead of
        # per-row Decimal objects
        .agg((F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias("rev"))
    )


# --- Q12 left outer join ----------------------------------------------------
@query(
    "q12_left_join",
    oracle="""
SELECT c.c_custkey, o.o_orderkey
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
ORDER BY c.c_custkey, o.o_orderkey NULLS FIRST
""",
)
def q12(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select("c_custkey", "o_orderkey")


# --- Q13 semi join (EXISTS) --------------------------------------------------
@query(
    "q13_semi_join",
    oracle="""
SELECT c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
ORDER BY c_custkey
""",
)
def q13(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


# --- Q14 anti join (NOT EXISTS) ----------------------------------------------
@query(
    "q14_anti_join",
    oracle="""
WITH c AS (
  SELECT c_custkey FROM customer
  UNION ALL
  SELECT -c_custkey FROM customer WHERE c_custkey % 100 = 7
)
SELECT c_custkey FROM c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
)
def q14(spark, sf_dir):
    """Anti join over customers PLUS planted orphans (negated keys of the
    %100=7 residue class, which orders can never reference) — the natural
    orphan set is EMPTY at sf0.01 and a broken anti join returning
    nothing would have 'passed' against the empty oracle (r15 verdict
    finding 3, the injected-fixture convention of q84/q89); planting
    scales with SF and keeps the natural orphans in the result."""
    c = T(spark, sf_dir, "customer").select("c_custkey")
    planted = c.filter(F.col("c_custkey") % 100 == 7).select(
        (-F.col("c_custkey")).alias("c_custkey")
    )
    cc = c.unionByName(planted)
    o = T(spark, sf_dir, "orders")
    return cc.join(o, cc.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


# --- Q15 equi-join + residual theta predicate ---------------------------------
@query(
    "q15_theta_join",
    oracle="""
SELECT p.p_partkey, l.l_orderkey, l.l_linenumber
FROM part p JOIN lineitem l
  ON p.p_partkey = l.l_partkey AND l.l_quantity > CAST(p.p_size AS DOUBLE)
ORDER BY p.p_partkey, l.l_orderkey, l.l_linenumber
""",
)
def q15(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    l = T(spark, sf_dir, "lineitem")
    # Equi-key drives the hash join; theta residual evaluated post-match.
    # part scales with SF — no forced broadcast (AQE decides).
    return (
        l.join(
            p,
            (l.l_partkey == p.p_partkey) & (l.l_quantity > p.p_size.cast("double")),
        )
        .select("p_partkey", "l_orderkey", "l_linenumber")
    )


# --- Q16 window: row_number / rank --------------------------------------------
@query(
    "q16_window_rank",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn,
       CAST(RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rk
FROM orders ORDER BY o_custkey, rn
""",
)
def q16(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return TW(spark, sf_dir, "orders", "o_custkey").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
    )


# --- Q17 window top-k per group (Spark-native form of R2's per-partition LIMIT) -
@query(
    "q17_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn
  FROM orders) t
WHERE rn <= 3 ORDER BY o_custkey, rn
""",
)
def q17(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        TW(spark, sf_dir, "orders", "o_custkey")
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


# --- Q18 window: lag ------------------------------------------------------------
@query(
    "q18_window_lag",
    oracle="""
SELECT event_id, user_id,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v
FROM events ORDER BY user_id, ts, event_id
""",
)
def q18(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return TW(spark, sf_dir, "events", "user_id").select(
        "event_id", "user_id", F.lag("value").over(w).alias("prev_v")
    )


# --- Q19 window: running frame ----------------------------------------------------
@query(
    "q19_window_running",
    oracle=f"""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
FROM events ORDER BY user_id, ts, event_id
""",
)
def q19(spark, sf_dir):
    # Running sum in exact decimal; final column cast to DOUBLE on both
    # sides (decimal rendering is not hash-stable across engines).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return TW(spark, sf_dir, "events", "user_id").select(
        "event_id",
        "user_id",
        # exact fixed-point running sum in LONG ten-thousandths (the q06/q11
        # cents convention at 4 dp): round(x·10⁴) summed as LONG recovers
        # the oracle's SUM(DECIMAL(18,4))→DOUBLE bit-for-bit and keeps the
        # running frame in codegen'd long arithmetic instead of allocating
        # a Decimal per row per frame step
        (F.sum(F.round(F.col("value") * 10_000).cast("long")).over(w) / 10_000.0).alias("run"),
    )


# --- Q20 set ops: union all / except -----------------------------------------------
@query(
    "q20a_union_all",
    oracle="""
SELECT c_custkey AS k FROM customer UNION ALL SELECT s_suppkey FROM supplier ORDER BY k
""",
)
def q20a(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return c.unionAll(s)


@query(
    "q20b_except",
    oracle="""
SELECT o_custkey AS k FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 0
ORDER BY k
""",
)
def q20b(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"))
    )
    # SQL EXCEPT is set semantics → Spark subtract (= EXCEPT DISTINCT).
    return o.subtract(c)


# --- Q21 intersect ------------------------------------------------------------------
@query(
    "q21_intersect",
    oracle="""
SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k
""",
)
def q21(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


# --- Q22 string functions -------------------------------------------------------------
@query(
    "q22_string_funcs",
    oracle="""
SELECT c_custkey, UPPER(c_name) AS u, SUBSTRING(c_name, 1, 5) AS s5,
       CAST(LENGTH(c_name) AS INTEGER) AS ln, REPLACE(c_mktsegment, 'A', '_') AS rp
FROM customer WHERE c_name LIKE 'Customer%' ORDER BY c_custkey
""",
)
def q22(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("Customer%")).select(
        "c_custkey",
        F.upper("c_name").alias("u"),
        F.substring("c_name", 1, 5).alias("s5"),
        F.length("c_name").alias("ln"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("_")).alias("rp"),
    )


# --- Q23 date functions ------------------------------------------------------------------
@query(
    "q23_date_funcs",
    oracle="""
SELECT o_orderkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mo
FROM orders ORDER BY o_orderkey
""",
)
def q23(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.date_trunc("month", "o_orderdate").alias("mo"),
    )


# --- Q24 math / conditional (CASE ladder mirrors R8 watcher.go:147-161) --------------------
@query(
    "q24_math_conditional",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)), 2) AS DECIMAL(18,2)) AS DOUBLE) AS net,
       CASE WHEN l_tax > 0.05 THEN 'hi' ELSE 'lo' END AS band,
       COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS rf
FROM lineitem ORDER BY l_orderkey, l_linenumber
""",
)
def q24(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    # Exact fixed-point in LONG (the q06 cents convention): price and
    # discount are exact 2-dp values, so cents·(100-pct) is the exact
    # product in 1e-4 units and +50 floor-div 100 is the same half-up
    # tie-break the oracle's decimal(18,6)→ROUND(…,2) chain performs —
    # all integer codegen, no decimal ops (verified value-identical per
    # row against the decimal form over the full table; the /100 divide
    # is exact because its input is an exact multiple of 100 < 2^53).
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pct = F.round(F.col("l_discount") * 100).cast("long")
    e4 = cents * (F.lit(100) - pct) + F.lit(50)
    net = ((e4 - F.pmod(e4, 100)) / 100).cast("long") / 100.0
    return l.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net"),
        F.when(F.col("l_tax") > 0.05, "hi").otherwise("lo").alias("band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("rf"),
    )


# --- Q25 gate-decision ladder as a query (R8 watcher.go:147-161) ----------------------------
@query(
    "q25_gate_decision",
    oracle="""
SELECT o_custkey,
       CASE WHEN SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) > 0 THEN 'Failed'
            WHEN SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) > 0 THEN 'Available'
            ELSE 'Complete' END AS partition_status
FROM orders GROUP BY o_custkey ORDER BY o_custkey
""",
)
def q25(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    failed = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    open_ = F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
    return o.groupBy("o_custkey").agg(
        F.when(failed > 0, "Failed")
        .when(open_ > 0, "Available")
        .otherwise("Complete")
        .alias("partition_status")
    )


# --- Q26 retry semantics as columnar expr (R13 item.go:27-38) -------------------------------
@query(
    "q26_retry_semantics",
    oracle=f"""
SELECT event_id,
       CASE WHEN value < 0 THEN 'Failed' ELSE 'Available' END AS status,
       CAST(CAST(ABS(value) AS DECIMAL(18,4)) AS DOUBLE) AS av
FROM events ORDER BY event_id
""",
)
def q26(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("value") < 0, "Failed").otherwise("Available").alias("status"),
        F.abs(F.col("value")).cast(D18_4).cast("double").alias("av"),
    )


# --- Q62 JSON functions (payload extraction — the engine-side twin of the
# reference's opaque JSON item payloads, httprocessor/processor.go:21-31) ----
@query(
    "q62_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) >= 50
            THEN 'hi' ELSE 'lo' END AS k_band
FROM events ORDER BY event_id
""",
)
def q62(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k"),
        F.when(k >= 50, "hi").otherwise("lo").alias("k_band"),
    )


# --- Q63 cube (full grouping-set lattice; rollup is Q09) --------------------
@query(
    "q63_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n
""",
)
def q63(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


# --- Q64 exact percentiles --------------------------------------------------
@query(
    "q64_percentiles",
    oracle="""
SELECT o_orderstatus,
       ROUND(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS p50,
       ROUND(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def q64(spark, sf_dir):
    # exact interpolated percentile (matches quantile_cont); the scale path
    # for sketchy quantiles is percentile_approx — not oracle-comparable.
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        )
    )


# --- Q65 pivot (wide conditional aggregation) -------------------------------
@query(
    "q65_pivot",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_n,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_n,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_n
FROM events GROUP BY user_id ORDER BY user_id
""",
)
def q65(spark, sf_dir):
    # df.groupBy().pivot() with explicit values — one shuffle, no second
    # pass to discover the pivot domain.
    e = T(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        F.coalesce("click", F.lit(0)).alias("click_n"),
        F.coalesce("view", F.lit(0)).alias("view_n"),
        F.coalesce("purchase", F.lit(0)).alias("purchase_n"),
    )


# --- Q77 remaining window functions: ntile, percent_rank, first/last_value ---
@query(
    "q77_window_misc",
    oracle="""
SELECT o_custkey, o_orderkey,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       FIRST_VALUE(o_orderkey) OVER w AS first_ord,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ord
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def q77(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.first("o_orderkey").over(w).alias("first_ord"),
        F.last("o_orderkey").over(w_full).alias("last_ord"),
    )


# --- Q70/Q71 sketches: HLL distinct + approximate quantiles ------------------
# Sketch outputs are engine-internal (not oracle-comparable value-for-value),
# so the REGISTERED result is the accuracy invariant: sketch vs exact within
# the sketch's published error bound — a hash-checkable boolean plus the
# exact value.  The scale story: one pass, fixed memory, mergeable partials.
@query(
    "q70_approx_distinct",
    oracle="""
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_n, true AS within_2pct
FROM orders
""",
)
def q70(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    agg = o.agg(
        F.countDistinct("o_custkey").alias("exact_n"),
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_n"),
    )
    return agg.select(
        F.col("exact_n").cast("long").alias("exact_n"),
        (
            F.abs(F.col("approx_n") - F.col("exact_n"))
            <= F.col("exact_n") * 0.02
        ).alias("within_2pct"),
    )


@query(
    "q71_approx_quantile",
    oracle="""
SELECT o_orderstatus,
       ROUND(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS exact_p50,
       true AS approx_within_1pct
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def q71(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_p50"),
    )
    return agg.select(
        "o_orderstatus",
        F.round("exact_p50", 4).alias("exact_p50"),
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            <= F.abs(F.col("exact_p50")) * 0.01
        ).alias("approx_within_1pct"),
    )


# --- Q74 multi-resolution time rollup (hypertable continuous-aggregate shape) -
@query(
    "q74_time_rollup",
    oracle="""
SELECT resolution, bucket, event_type, n, sv FROM (
  SELECT 'hour' AS resolution, DATE_TRUNC('hour', ts) AS bucket, event_type,
         COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
  FROM events GROUP BY 2, 3
  UNION ALL
  SELECT 'day', DATE_TRUNC('day', ts), event_type,
         COUNT(*), CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
  FROM events GROUP BY 2, 3
) t ORDER BY resolution, bucket, event_type
""",
)
def q74(spark, sf_dir):
    """Multi-resolution rollup in ONE scan: grouping-sets over pre-computed
    hour/day truncations (the hypertable continuous-aggregate shape) — the
    engine reads events once and emits every resolution, vs one scan per
    resolution for the naive union (which the oracle spells out)."""
    e = T(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v"),  # exact e4 units (see q32)
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
    )
    gs = e.groupingSets(
        [["h", "event_type"], ["d", "event_type"]], "h", "d", "event_type"
    ).agg(F.count("*").alias("n"), (F.sum("v") / 10000.0).alias("sv"))
    return gs.select(
        F.when(F.col("h").isNotNull(), "hour").otherwise("day").alias("resolution"),
        F.coalesce("h", "d").alias("bucket"),
        "event_type",
        "n",
        "sv",
    )


# --- Q66 array functions ----------------------------------------------------
@query(
    "q66_array_funcs",
    oracle=r"""
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_toks,
       array_to_string(list_sort(toks)[1:3], ',') AS first3,
       list_contains(toks, 'the') AS has_the
FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents) t
ORDER BY doc_id
""",
)
def q66(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3"),
        F.array_contains(toks, "the").alias("has_the"),
    )


# --- Q31 sessionization (gaps-and-islands; batch twin of session_window) --------------------
@query(
    "q31_sessionization",
    oracle="""
SELECT user_id, session_id, COUNT(*) AS n_events, MIN(event_id) AS first_event
FROM (
  SELECT user_id, event_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events) a
) b
GROUP BY user_id, session_id ORDER BY user_id, session_id
""",
)
def q31(spark, sf_dir):
    e = TW(spark, sf_dir, "events", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    # µs precision: cast-to-long truncates to seconds and would disagree
    # with the oracle's INTERVAL comparison on fractional-second gaps.
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    is_new = F.when(prev.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        e.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select(
            "user_id",
            "event_id",
            F.sum("is_new").over(wrun).alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("event_id").alias("first_event"))
    )


# --- Q32 tumbling window, batch twin of window(ts,'1 hour') ---------------------------------
@query(
    "q32_tumbling_window",
    oracle=f"""
SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
FROM events GROUP BY DATE_TRUNC('hour', ts), event_type ORDER BY h, event_type
""",
)
def q32(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            # exact long units (the q06/q24 cents convention, e4 here):
            # value is an exact 2-dp grid (measured: max |v*100 -
            # round(v*100)| = 3.6e-12 over the full table), so the long
            # sum is the decimal sum exactly and the final /1e4 divide
            # rounds the same exact rational the DECIMAL->DOUBLE cast
            # does — no decimal ops in the aggregate.
            (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0)
            .alias("sv"),
        )
    )


# --- Q33 as-of join: latest event at or before the order date ------------------------------
@query(
    "q33_asof_join",
    oracle="""
SELECT o.o_orderkey,
       (SELECT MAX(e.event_id) FROM events e
        WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate) AS last_event
FROM orders o ORDER BY o.o_orderkey
""",
)
def q33(spark, sf_dir):
    # Scalable union-tag + running-last implementation (no range join, no
    # N+1): see operators/asof.py.
    n_o, n_e = _rows(sf_dir, "orders"), _rows(sf_dir, "events")
    return asof_join_last_event(
        left=T(spark, sf_dir, "orders"),
        right=T(spark, sf_dir, "events"),
        left_on="o_custkey",
        right_on="user_id",
        left_time="o_orderdate",
        right_time="ts",
        right_value="event_id",
        left_keep="o_orderkey",
        out_col="last_event",
        width_rows=(n_o + n_e) if (n_o is not None and n_e is not None) else None,
    )


# --- q124 sliding (hopping) window aggregate --------------------------------
@query(
    "q124_sliding_window",
    oracle="""
WITH x AS (
  SELECT CAST(FLOOR(EPOCH(ts)/300)*300 - i.i*300 AS BIGINT) AS ws,
         event_type, value
  FROM events, LATERAL (SELECT UNNEST([0, 1]) AS i) i
)
SELECT ws, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
FROM x GROUP BY ws, event_type ORDER BY ws, event_type
""",
)
def q124(spark, sf_dir):
    """Hopping-window twin of q32: width 10 min, slide 5 min — every event
    lands in exactly width/slide = 2 windows (Spark's F.window slide
    semantics; the oracle enumerates the two slide-grid starts per
    event).  Window start is emitted as epoch seconds (BIGINT) so the
    hash compares integers, not engine timestamp renderings."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            # exact e4-long sum — see q32
            (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0)
            .alias("sv"),
        )
        .select(
            F.col("w.start").cast("long").alias("ws"), "event_type", "n", "sv"
        )
    )
