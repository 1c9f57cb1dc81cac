"""Relational coverage: the standard join matrix + TPC-H-shaped aggregates.

The reference itself needs only one join (J1, a broadcast dim join —
reddit_consumer.py:230-231), but its correctness suite must exercise the
full matrix (SURVEY.md §2.4 note): inner/left/semi/anti/full-outer,
broadcast vs shuffled, pivot/cube, windowed running aggregates. These
queries double as the bench workload at sf0.1 (the star schema is the only
fixture that scales).

Scale notes:
- Dim tables (region/nation/supplier/customer/part) are broadcast —
  Catalyst picks BroadcastHashJoin under the configured threshold; at
  100 TB the fact side streams through without a shuffle.
- Q1-style aggs: single scan → partial/final hash agg; the groupBy keys are
  tiny-cardinality, so AQE coalesces the post-shuffle partitions.
- The running-sum window partitions by supplier key — a partitioned
  shuffle, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table

Q1_CUTOFF = "1998-09-02"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                       AS avg_qty,
           round(avg(l_extendedprice), 6)                                  AS avg_price,
           round(avg(l_discount), 6)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan → 8-agg groupBy (partial+final hash agg)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(f"{Q1_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "regional_customer_value",
    oracle="""
    SELECT r.r_name,
           count(*)                   AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal,
           round(avg(c.c_acctbal), 6) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc="J1-style star join: fact × two broadcast dims → grouped agg",
)
def regional_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
        .orderBy("r_name")
    )


@register(
    "top_suppliers_revenue",
    oracle="""
    SELECT s.s_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*)                                              AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY revenue DESC, s_name
    LIMIT 5
    """,
    doc="broadcast dim join + grouped revenue + top-k",
)
def top_suppliers_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), "s_name")
        .limit(5)
    )


@register(
    "customers_with_orders_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="left-semi join (EXISTS)",
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "customers_without_orders_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="left-anti join (NOT EXISTS)",
)
def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "order_count_histogram",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_orders
    """,
    doc="left-outer join preserving order-less customers → distribution "
    "(count of a nullable column skips nulls in both engines)",
)
def order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers")).orderBy("n_orders")


@register(
    "nation_customer_supplier_full_outer",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nationkey, count(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    supp AS (
        SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(c.n_customers, 0)         AS n_customers,
           coalesce(s.n_suppliers, 0)         AS n_suppliers
    FROM cust c FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
    doc="full-outer join of two aggregates (nations with customers but no "
    "suppliers survive on either side)",
)
def nation_customer_supplier_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    j = cust.join(supp, "nationkey", "full_outer")
    return (
        j.select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        ).orderBy("nationkey")
    )


_STATUSES = ["F", "O", "P"]


@register(
    "priority_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="pivot (explicit value list → conditional aggregation; no extra "
    "pass to discover pivot values)",
)
def priority_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
        .orderBy("o_orderpriority")
    )
    renamed = piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"status_{s.lower()}") for s in _STATUSES],
    )
    return renamed


@register(
    "status_priority_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status_grp,
           coalesce(o_orderpriority, 'ALL') AS priority_grp,
           GROUPING(o_orderstatus)          AS g_status,
           GROUPING(o_orderpriority)        AS g_priority,
           count(*)                         AS n_orders,
           round(sum(o_totalprice), 2)      AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status_grp, priority_grp
    """,
    doc="CUBE with grouping flags (all four subtotal planes in one shuffle)",
)
def status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            # grouping() is only resolvable inside the cube's own agg list
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status_grp"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority_grp"),
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
        .orderBy("status_grp", "priority_grp")
    )


@register(
    "supplier_running_revenue",
    oracle="""
    SELECT l_suppkey,
           l_orderkey,
           l_linenumber,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
               OVER (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_revenue_cents,
           row_number() OVER (PARTITION BY l_suppkey
                              ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
    FROM lineitem
    """,
    doc="W-style ordered analytics at fact scale: per-key running sum + "
    "row_number (partitioned shuffle, no global sort). Accumulates integer "
    "cents: float running sums are association-order-dependent (DuckDB's "
    "segment-tree vs Spark's sequential frame) and drift at the rounding "
    "boundary — integer accumulation is exact in both engines.",
)
def supplier_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(rev_cents).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("running_revenue_cents"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "set_ops_customer_cohorts",
    oracle="""
    WITH y95 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    ),
    y96 AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT 'retained' AS cohort, count(*) AS n_customers
    FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'churned', count(*)
    FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
    UNION ALL
    SELECT 'new', count(*)
    FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
    ORDER BY cohort
    """,
    doc="Set operations (INTERSECT / EXCEPT, absent from the reference but "
    "part of the relational surface): year-over-year customer retention "
    "cohorts — distinct-key sets stay partitioned on the shuffled key, so "
    "each set op is one co-partitioned aggregate, no row explosion",
)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def cohort(year: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = cohort(1995), cohort(1996)
    counts = [
        y95.intersect(y96).agg(F.count(F.lit(1))).select(
            F.lit("retained").alias("cohort"), F.col("count(1)").alias("n_customers")
        ),
        y95.subtract(y96).agg(F.count(F.lit(1))).select(
            F.lit("churned").alias("cohort"), F.col("count(1)").alias("n_customers")
        ),
        y96.subtract(y95).agg(F.count(F.lit(1))).select(
            F.lit("new").alias("cohort"), F.col("count(1)").alias("n_customers")
        ),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("cohort")


@register(
    "key_skew_profile",
    oracle="""
    WITH p AS (
        SELECT 'lineitem.l_suppkey' AS keyspace, CAST(l_suppkey AS VARCHAR) AS k FROM lineitem
        UNION ALL SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events
        UNION ALL SELECT 'documents.source', source FROM documents
    ),
    c AS (SELECT keyspace, k, count(*) AS cnt FROM p GROUP BY 1, 2)
    SELECT keyspace,
           count(*)                                        AS n_keys,
           CAST(sum(cnt) AS BIGINT)                        AS total_rows,
           CAST(max(cnt) AS BIGINT)                        AS max_rows,
           round(avg(cnt), 6)                              AS avg_rows,
           round(stddev_samp(cnt) / avg(cnt), 6)           AS cv,
           round(max(cnt) * 1.0 / sum(cnt), 6)             AS top_share,
           round(max(cnt) * 1.0 / avg(cnt), 6)             AS skew_ratio
    FROM c GROUP BY keyspace
    ORDER BY keyspace
    """,
    doc="Shuffle-key skew diagnostics across the join/agg keys this "
    "engine shuffles on: per-key row counts reduced to n_keys / max / "
    "coefficient-of-variation / top-key share / max-over-mean skew "
    "ratio. This is the profile that decides salting factors and AQE "
    "skew-join thresholds BEFORE a 100 TB run — and it is itself "
    "scale-safe: one partial-aggregable count per keyspace (map-side "
    "combine on the key), then a 4-group rollup; per-key counts never "
    "leave the executors unaggregated.",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def keyed(table: str, col_expr, name: str) -> DataFrame:
        return load_table(spark, sf_dir, table).select(
            F.lit(name).alias("keyspace"), col_expr.cast("string").alias("k")
        )

    p = (
        keyed("lineitem", F.col("l_suppkey"), "lineitem.l_suppkey")
        .unionByName(keyed("orders", F.col("o_custkey"), "orders.o_custkey"))
        .unionByName(keyed("events", F.col("user_id"), "events.user_id"))
        .unionByName(keyed("documents", F.col("source"), "documents.source"))
    )
    c = p.groupBy("keyspace", "k").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        c.groupBy("keyspace")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_rows"),
            F.round(F.avg("cnt"), 6).alias("avg_rows"),
            F.round(F.stddev_samp("cnt") / F.avg("cnt"), 6).alias("cv"),
            F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_share"),
            F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_ratio"),
        )
        .orderBy("keyspace")
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS o_cents
        FROM orders
    ),
    updates AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               (o_cents * 11) // 10 AS o_cents
        FROM base WHERE o_orderkey % 13 = 0
    ),
    inserts AS (
        SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
               'N' AS o_orderstatus, o_cents
        FROM base WHERE o_orderkey % 17 = 0
    ),
    merged AS (
        SELECT *
        FROM (
            SELECT *, 1 AS prio FROM updates
            UNION ALL SELECT *, 1 FROM inserts
            UNION ALL SELECT *, 0 FROM base
        )
        QUALIFY row_number() OVER (
            PARTITION BY o_orderkey ORDER BY prio DESC
        ) = 1
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(o_cents) AS BIGINT) AS total_cents,
           count(DISTINCT o_custkey) AS n_customers
    FROM merged
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="MERGE INTO (upsert) semantics without a table format: a "
    "deterministic CDC delta (10%-bumped updates on orderkey%13, fresh "
    "inserts on orderkey%17) merges into the base by union + keep-"
    "highest-priority-per-key — one shuffle on the merge key, the same "
    "shape Delta/Iceberg MERGE compiles to when the delta is too big to "
    "broadcast. Deliberately NOT a full-outer join: union+window needs "
    "no null-coalescing per column and degrades gracefully under key "
    "skew (window per key vs join row explosion). Verified by post-"
    "merge per-status rollup in integer cents.",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("o_cents"),
    )
    # 10% bump in integer cents (floored): float 1.1x-then-round is
    # engine-divergent in the last cent; integer math is exact in both.
    updates = (
        base.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_cents", F.expr("o_cents * 11 div 10"))
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 17 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 100000000)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    delta = updates.unionByName(inserts).withColumn("prio", F.lit(1))
    merged = (
        delta.unionByName(base.withColumn("prio", F.lit(0)))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("o_orderkey").orderBy(F.desc("prio"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_cents").cast("long").alias("total_cents"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "promo_revenue_share",
    oracle="""
    WITH j AS (
        SELECT p.p_type, p.p_brand,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-01-01'
    ),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM j)
    SELECT j.p_type,
           count(*)                          AS n_lineitems,
           count(DISTINCT j.p_brand)         AS n_brands,
           CAST(sum(j.cents) AS BIGINT)      AS revenue_cents,
           round(sum(j.cents) * 100.0 / tot.total_cents, 4) AS revenue_share_pct
    FROM j, tot
    GROUP BY j.p_type, tot.total_cents
    ORDER BY j.p_type
    """,
    doc="TPC-H Q14-flavored promo-revenue share: lineitem x part on the "
    "part key with a ship-date window, revenue share per part type "
    "against the period total. Completes table coverage (part was the "
    "one unused fixture table). Plan shape: the date filter pushes into "
    "the lineitem scan; part is the small build side (broadcast under "
    "the 64 MB threshold at any realistic dimension size vs fact); the "
    "period total attaches as a broadcast scalar; integer-cents "
    "accumulation keeps the share exact across engines.",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_type", "p_brand", cents.alias("cents")
    )
    tot = j.agg(F.sum("cents").cast("long").alias("total_cents"))
    return (
        j.groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.count_distinct("p_brand").alias("n_brands"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "p_type", "n_lineitems", "n_brands", "revenue_cents",
            F.round(F.col("revenue_cents") * 100.0 / F.col("total_cents"), 4)
            .alias("revenue_share_pct"),
        )
        .orderBy("p_type")
    )


Q3_PIVOT = "1998-01-01"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{Q3_PIVOT} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{Q3_PIVOT} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate, orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): 3-way join with the segment "
    "filter reducing customer to a broadcast build side, both date "
    "filters pushed into the scans, group-by on the order key, top-10 by "
    "revenue via TakeOrderedAndProject — no global sort materialization. "
    "orderkey added to the sort keys so rounded-revenue ties stay "
    "deterministic across engines.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(f"{Q3_PIVOT} 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(f"{Q3_PIVOT} 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), "orderdate", "orderkey")
        .limit(10)
    )


@register(
    "orders_above_customer_avg",
    oracle="""
    WITH oc AS (
        SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    ca AS (
        SELECT o_custkey, count(*) AS n, sum(cents) AS total
        FROM oc GROUP BY o_custkey
    )
    SELECT o.o_custkey AS custkey,
           any_value(ca.n) AS n_orders,
           CAST(sum(CASE WHEN o.cents * ca.n > ca.total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above,
           CAST(round(max(o.cents * ca.n - ca.total) * 1.0 / any_value(ca.n))
                AS BIGINT) AS max_above_avg_cents
    FROM oc o JOIN ca USING (o_custkey)
    GROUP BY o.o_custkey
    HAVING sum(CASE WHEN o.cents * ca.n > ca.total THEN 1 ELSE 0 END) >= 1
    ORDER BY custkey
    """,
    doc="Correlated-subquery shape ('orders above this customer's "
    "average') rewritten as a window: the naive self-join against a "
    "per-customer aggregate shuffles orders twice and dedups once; the "
    "window formulation shuffles ONCE on the customer key and computes "
    "the comparison in the same exchange — the canonical decorrelation "
    "rewrite at scale. The above-average test and the reported margin "
    "run in integer cents (cents * n > total) so no float average ever "
    "enters a comparison or a representation-boundary rounding — "
    "cross-engine exact.",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = W.partitionBy("o_custkey")
    enriched = orders.select(
        "o_custkey",
        cents.alias("cents"),
    ).select(
        "o_custkey",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("total"),
    )
    over = F.col("cents") * F.col("n") - F.col("total")
    return (
        enriched.groupBy("o_custkey")
        .agg(
            F.first("n").alias("n_orders"),
            F.sum(F.when(over > 0, 1).otherwise(0)).alias("n_above"),
            F.round(F.max(over) / F.first("n"), 0).cast("long")
            .alias("max_above_avg_cents"),
        )
        .filter(F.col("n_above") >= 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            "n_orders", "n_above", "max_above_avg_cents",
        )
        .orderBy("custkey")
    )


# --------------------------------------- TPC-H Q5: local supplier volume

Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1997-01-01"


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{Q5_FROM} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q5_TO} 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: the 6-way join at fact scale — lineitem joins "
    "orders on the fact keys while supplier/customer/nation/region stay "
    "broadcast dims; the same-nation predicate (c_nationkey = "
    "s_nationkey) rides the supplier broadcast join instead of forcing "
    "a customer x supplier shuffle, and the region/date filters prune "
    "BEFORE the fact join (Catalyst pushes both into the dim/fact "
    "scans). One fact-keyed shuffle (l_orderkey = o_orderkey) plus the "
    "final small n_name aggregate — the canonical star-join plan a "
    "1000-executor cluster wants.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(f"{Q5_FROM} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q5_TO} 00:00:00").cast("timestamp"))
    )
    # broadcast hints are always honored, so hint only the two join
    # columns the query needs — broadcasting the full customer row would
    # pin every column executor-resident and risks driver OOM at scale
    # factors where the projected pair would still fit
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(dims),
            (li.l_suppkey == dims.s_suppkey)
            & (c.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ------------------------------- TPC-H Q18: large-volume order lookup

Q18_QTY = 300


@register(
    "q18_large_volume_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING round(sum(l_quantity), 2) > {Q18_QTY}
    )
    SELECT c.c_name,
           o.o_custkey                  AS custkey,
           o.o_orderkey                 AS orderkey,
           o.o_orderdate                AS orderdate,
           round(o.o_totalprice, 2)     AS totalprice,
           b.total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, orderkey
    """,
    doc="TPC-H Q18 shape: aggregate-filter-join-back — the fact table is "
    "FIRST reduced to qualifying order keys (groupBy + HAVING with "
    "map-side partial sums), and only that small survivor set joins "
    "back to orders and customer — unhinted, so AQE broadcasts the "
    "survivor side from runtime stats instead of pinning the full "
    "customer table executor-resident. The order matters at 100 TB: "
    "filtering AFTER a "
    "full fact x orders join would shuffle every line item; aggregating "
    "first means the fact shuffles once on its own key and everything "
    "downstream is survivor-sized.",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY)
    )
    # deliberately NO broadcast hint on customer: after the aggregate
    # reduction the SURVIVOR side is the small one, and AQE broadcasts it
    # from runtime stats; forcing customer (the only unreduced wide table
    # here) executor-resident would override the size threshold and risk
    # OOM at larger scale factors
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), "orderkey")
    )
