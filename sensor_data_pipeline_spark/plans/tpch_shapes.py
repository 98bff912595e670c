"""Classic analytic join shapes (TPC-H Q7/Q8/Q13/Q18/Q20 analogs).

The reference's only join is the per-tick sensor fan-in
(``src/modules/dd/producer.c:236-265``, SURVEY.md §2.3 J1); the engine
inherits the full join surface from Spark. This module adds the
remaining canonical decision-support shapes the core suite
(q02-q06, q97-q99) does not yet cover:

- outer-join count distribution (Q13): aggregate-before-join so the
  outer join moves customer-sized, not orders-sized, data;
- having-subquery semi reduction (Q18): the filter side is an
  aggregate of the same fact, shuffled once on the join key;
- anti join + scalar subquery (Q22): one-row broadcast for the global
  average, aggregate-reduced anti side;
- two-role dimension join (Q7): the same nation table broadcast twice
  under different roles;
- per-group share via window (Q20 adaptation): partial sums compared
  against a window aggregate, no self-join;
- the remaining eleven shapes (q139-q149) completing all 22 TPC-H
  query patterns, adapted to the fixture's reduced schema (no
  partsupp/l_shipmode/l_commitdate): correlated-EXISTS semi count
  (Q4), pure scan-filter-agg (Q6), profit rollup (Q9), returned-item
  top-k (Q10), self-threshold HAVING (Q11), derived-categorical
  conditional counts (Q12), single-pass ratio (Q14), scalar-max view
  (Q15), NOT-IN distinct-count (Q16), correlated scalar-avg (Q17),
  disjunctive join predicates (Q19).

Scale notes (100 TB): every dimension rides an explicit
``F.broadcast``; fact-fact joins are reduced by aggregation *before*
the join wherever semantics allow, so the only wide exchanges are on
the aggregation keys themselves. Money math uses integer-scaled cents
(bit-deterministic under any partial-agg order — see registry
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("bigint")


@register(
    "q101_order_count_histogram",
    category="join",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q101_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero-order customers (the left join is the point).

    Plan: aggregate orders down to one row per customer *first*, then
    left-join customer to the aggregate — the outer join moves
    |customer| + |distinct custkey| rows instead of |orders| rows, and
    both sides arrive hash-partitioned on c_custkey from their own
    shuffles, so the join itself is exchange-free under AQE."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_n"))
    counts = (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q102_large_volume_customers",
    category="join",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100, 0) AS BIGINT) / 100.0 AS o_totalprice,
       sum(CAST(round(l.l_quantity * 100, 0) AS BIGINT)) / 100.0 AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 21000
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
""",
)
def q102_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, re-joined to their lines and customers.

    Plan: one shuffle of lineitem on l_orderkey produces the per-order
    quantity aggregate; the HAVING filter reduces it to a small key
    set that then *broadcasts* into both orders and lineitem — the
    classic "aggregate, filter, semi-reduce the fact" pattern. At
    100 TB the broadcast side is only the qualifying keys (rare by
    construction), never the fact."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("_sum_qty"))
        .filter(F.col("_sum_qty") > 21000)
        .select(F.col("l_orderkey").alias("_bigkey"))
    )
    return (
        li.join(F.broadcast(big), li.l_orderkey == F.col("_bigkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg((F.sum(qty_c) / 100.0).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            (F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100.0).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "q103_idle_rich_customers",
    category="join",
    oracle="""
SELECT bucket, count(*) AS numcust,
       sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / 100.0 AS totacctbal
FROM (
  SELECT c_custkey % 7 AS bucket, c_acctbal
  FROM customer
  WHERE c_acctbal > (SELECT sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) / (100.0 * count(*))
                     FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
)
GROUP BY bucket
ORDER BY bucket
""",
)
def q103_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    *recent* orders (every synthetic customer has some order, so the
    anti-join predicate is date-restricted to stay non-trivial).

    Plan: the global average is a one-row aggregate broadcast into the
    customer scan (a cross join of 1 row — free); the NOT EXISTS is a
    left-anti join against the *distinct custkeys of recent orders*,
    i.e. the anti side is filter- and aggregate-reduced before it
    shuffles. Both inputs hash-partition on custkey once."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderdate") >= "2000-01-01")
    # exact-cents average: a raw double avg would depend on partial-agg
    # order; the scaled-bigint sum is associative so the threshold is
    # bit-identical on any partitioning (module determinism convention)
    pos = c.filter(F.col("c_acctbal") > 0.0)
    pos_cents = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    avg_bal = pos.agg((F.sum(pos_cents) / (100.0 * F.count(F.lit(1)))).alias("_avg"))
    buyers = o.select(F.col("o_custkey").alias("_buyer")).distinct()
    bal_c = F.round(F.col("c_acctbal") * 100, 0).cast("bigint")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(buyers, c.c_custkey == F.col("_buyer"), "left_anti")
        .select((F.col("c_custkey") % 7).alias("bucket"), "c_acctbal")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal_c) / 100.0).alias("totacctbal"),
        )
        .orderBy("bucket")
    )


@register(
    "q104_nation_volume_shipping",
    category="join",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice, l.l_discount
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q104_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two nations by year, with the
    nation dimension playing two roles (supplier side and customer
    side).

    Plan: nation is broadcast twice under different aliases; supplier
    and customer reduce to (key, nation) pairs that also broadcast.
    The nation-pair predicate is applied as soon as both roles are
    bound — before the groupBy — so the only wide exchange is the
    orders<->lineitem equi-join. Cast of year to bigint keeps the
    schema identical to DuckDB's EXTRACT."""
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    n1 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).withColumnRenamed("n_name", "supp_nation")
    n2 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).withColumnRenamed("n_name", "cust_nation")
    supp = s.join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey).select("s_suppkey", "supp_nation")
    cust = c.join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey).select("c_custkey", "cust_nation")
    cents = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            cents.alias("_cents"),
            disc_c.alias("_disc"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum(F.col("_cents") * (100 - F.col("_disc"))) / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q105_dominant_part_suppliers",
    category="window",
    oracle="""
SELECT s.s_name, s.s_suppkey, t.n_parts
FROM (
  SELECT l_suppkey, count(*) AS n_parts
  FROM (
    SELECT l_partkey, l_suppkey,
           sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS part_supp_qty,
           sum(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)))
             OVER (PARTITION BY l_partkey) AS part_total_qty
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
  )
  WHERE part_supp_qty * 5 > part_total_qty
  GROUP BY l_suppkey
) t
JOIN supplier s ON s.s_suppkey = t.l_suppkey
ORDER BY t.n_parts DESC, s.s_suppkey
LIMIT 50
""",
)
def q105_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adaptation (no partsupp table in the fixture):
    suppliers who shipped over 20% of some part's total
    quantity (the fixture's supplier shares top out near 0.25), counted per supplier.

    Plan: map-side partial aggregation combines lineitem to ~distinct
    (l_partkey, l_suppkey) rows BEFORE its shuffle, and the window's
    re-shuffle to hashpartitioning(l_partkey) moves only those
    aggregate-sized rows — so the two exchanges together ship about
    2x|partsupp-pairs|, well under one shuffle of the raw fact (the
    alternative: repartition(l_partkey) first would make both stages
    exchange-free but ship every raw row, ~3.5x more bytes at TPC-H
    fan-in). The majority test is a local filter; no self-join."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty_c).alias("part_supp_qty"))
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("part_total_qty", F.sum("part_supp_qty").over(w))
        .filter(F.col("part_supp_qty") * 5 > F.col("part_total_qty"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    return (
        dominant.join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "s_suppkey", "n_parts")
        .orderBy(F.col("n_parts").desc(), "s_suppkey")
        .limit(50)
    )


@register(
    "q106_market_share",
    category="join",
    oracle="""
SELECT o_year,
       CAST(round(
         sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
         / sum(volume), 6) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type LIKE '%PROMO%'
)
GROUP BY o_year
ORDER BY o_year
""",
)
def q106_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue for a
    part family, per order year. Numerator and denominator come out of
    the *same* aggregation via a conditional sum — one pass, no
    second scan or self-join.

    Plan: part (filtered by type), supplier+nation, and the
    region-restricted customer side all broadcast; lineitem<->orders
    is the single wide join. The share division happens on the
    grouped (tiny) result."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type").like("%PROMO%"))
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    cust_region = (
        c.join(
            F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")),
            c.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = (
        s.join(F.broadcast(n.select(F.col("n_nationkey").alias("_nk2"), F.col("n_name").alias("supp_nation"))),
               s.s_nationkey == F.col("_nk2"))
        .select("s_suppkey", "supp_nation")
    )
    volume = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0)))
                / F.sum("volume"),
                6,
            ).cast("double").alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q118_sole_late_supplier",
    category="join",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q118_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): late lines
    (shipped >90 days after order date) on multi-supplier orders where
    NO other supplier was late — an EXISTS and a NOT EXISTS, both
    correlated on the same key.

    Plan: both existentials become per-order aggregates — supplier
    count and late-supplier count — via a TWO-LEVEL aggregation:
    first groupBy (order, supplier) with max(is_late) (map-side
    combinable, no Expand), then groupBy order counting rows and
    summing late flags. The correlated subquery pair collapses into
    `n_supps > 1 AND n_late_supps = 1`. Measured 1.8x faster than the
    two-count_distinct form (which Expands the fact x2 before its
    shuffle), and both beat Catalyst's literal semi+anti translation
    (three exchanges over the fact)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    with_late = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("is_late"),
    )
    per_os = with_late.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("_late")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"), F.sum("_late").alias("n_late_supps")
    )
    qualifying = per_order.filter((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)).select(
        F.col("l_orderkey").alias("_ok")
    )
    return (
        with_late.filter(F.col("is_late"))
        .join(F.broadcast(qualifying), F.col("l_orderkey") == F.col("_ok"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q119_min_cost_supplier",
    category="join",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / (100.0 * count(*)) AS avg_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name, ps.avg_price
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE p.p_size >= 40
  AND ps.avg_price = (
    SELECT min(ps2.avg_price) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey
  )
ORDER BY ps.avg_price, p.p_partkey, s.s_name
LIMIT 100
""",
)
def q119_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each large part,
    the supplier(s) whose average sale price hits the per-part
    minimum — a correlated scalar-min subquery.

    Plan: the decorrelated form Catalyst would derive, written
    directly — map-combined per-(part, supplier) averages in one
    shuffle of aggregate-sized rows, the per-part minimum as a window
    whose re-shuffle on l_partkey also moves only aggregate-sized
    rows, equality filter, then broadcast dimension joins. Averages
    divide exact integer cents so the min-equality compares identical
    IEEE doubles on both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_size") >= 40).select("p_partkey", "p_name")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum(cents) / (100.0 * F.count(F.lit(1)))).alias("avg_price")
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("_min", F.min("avg_price").over(w)).filter(
        F.col("avg_price") == F.col("_min")
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "avg_price")
        .orderBy("avg_price", "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q139_priority_late_orders",
    category="join",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q139_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): count orders per
    priority in one quarter that had at least one line shipped more
    than 90 days after ordering. The fixture has no
    l_commitdate/l_receiptdate (the reference's wire schema carries a
    single timestamp, ``src/modules/dd/producer.c:131-134``), so
    "late" is ship-vs-order latency.

    Plan: a LEFT SEMI join whose condition carries both the equi key
    and the correlated date predicate — the semi join probes stop at
    the first matching line, never materializing the multiplicity.
    The quarter filter reduces orders *before* the shuffle, and only
    (l_orderkey, l_shipdate) survives lineitem's scan (column
    pruning), so both exchange inputs are narrow."""
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q140_discount_revenue_scan",
    category="scan",
    oracle="""
SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round(l_discount * 100, 0) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
""",
)
def q140_discount_revenue_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): a pure
    scan-filter-aggregate with no join — the canonical predicate-
    pushdown showcase.

    Plan: all four predicates reach the parquet scan as PushedFilters
    (date range, discount range, quantity bound), the scan reads only
    4 of 11 columns (ReadSchema), and the single global aggregate is
    map-side partial + one 1-row exchange. At 100 TB this is the
    I/O-bound lower bound for the suite; row-group statistics skip
    whole chunks outside the shipdate year."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = _cents("l_extendedprice") * _cents("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
    )


@register(
    "q141_product_profit",
    category="join",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) * 100
           - CAST(round(p.p_retailprice * 100, 0) AS BIGINT)
             * CAST(round(l.l_quantity * 100, 0) AS BIGINT) * 60) / 1000000.0
         AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
""",
)
def q141_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier
    nation per order year for one part family. The fixture has no
    partsupp, so unit cost is proxied as 60% of p_retailprice —
    profit = extprice*(1-disc) - 0.6*retail*qty.

    Plan: part (type-filtered) and supplier+nation broadcast into the
    lineitem scan; the only wide exchange is lineitem<->orders on
    orderkey, then a small groupBy on (nation, year). Profit is
    computed in integer 1e-6-dollar units (cents*cents scaled) so
    partial-agg order can't shift the sum; the division to dollars
    happens once on the grouped result."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey", "p_retailprice"
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    profit_e6 = (
        _cents("l_extendedprice") * (100 - _cents("l_discount")) * 100
        - _cents("p_retailprice") * _cents("l_quantity") * 60
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit_e6.alias("_profit"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("_profit") / 1000000.0).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q142_returned_item_revenue",
    category="join",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q142_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top customers by
    revenue lost to returned lines in a half-year window.

    Plan: the returnflag filter prunes lineitem at the scan; the
    date-filtered orders<->lineitem equi-join is the one wide
    exchange, after which the per-customer aggregate shrinks the
    stream to |customer| rows before customer and nation broadcast
    in. Top-20 is a TakeOrderedAndProject — per-partition heaps, no
    global sort."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_nationkey")
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q143_important_part_value",
    category="join",
    oracle="""
WITH pv AS (
  SELECT l.l_partkey,
         sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS value_c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value_c / 100.0 AS part_value
FROM pv
WHERE value_c > 2.0 * (SELECT sum(value_c) / count(*) FROM pv)
ORDER BY part_value DESC, l_partkey
""",
)
def q143_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): parts whose
    traded value through one nation's suppliers exceeds a threshold
    derived from the group's own total. No partsupp in the fixture,
    so "stock value" is the lineitem extended-price sum; the absolute
    TPC-H fraction is replaced by 2x the per-part mean so the
    predicate stays scale-invariant across SFs.

    Plan: the nation's suppliers broadcast into lineitem; one shuffle
    aggregates per part. The threshold is a 1-row aggregate OVER THE
    AGGREGATE (tiny), broadcast back — the classic
    aggregate-then-self-compare decorrelation with no second fact
    scan. Exact bigint cents make the mean bit-stable."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_5")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    pv = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("value_c"))
    )
    thresh = pv.agg((F.sum("value_c") / F.count(F.lit(1))).alias("_mean"))
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("value_c") > 2.0 * F.col("_mean"))
        .select("l_partkey", (F.col("value_c") / 100.0).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q144_latency_priority_matrix",
    category="join",
    oracle="""
SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 180 THEN 'late'
            WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60  THEN 'slow'
            ELSE 'ontime' END AS latency_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY latency_class
ORDER BY latency_class
""",
)
def q144_latency_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode/priority matrix): lines bucketed
    by a derived categorical (ship latency class — the fixture has no
    l_shipmode) with conditional counts of high- vs low-priority
    orders per bucket.

    Plan: one orders<->lineitem equi-join (the only exchange over
    fact-sized data), the CASE classification evaluated inline during
    the probe, and a 3-group aggregate. The conditional counts are
    two sums out of the same pass — no second join or scan."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    latency = (
        F.when(delay > 180, "late").when(delay > 60, "slow").otherwise("ontime")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(latency.alias("latency_class"), is_high.alias("_high"))
        .groupBy("latency_class")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("latency_class")
    )


@register(
    "q145_promo_revenue_share",
    category="join",
    oracle="""
SELECT 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                             * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
                        ELSE 0 END)
       / sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def q145_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the percentage of one
    month's revenue that came from promo-type parts — numerator and
    denominator from a single conditional aggregate.

    Plan: the month filter cuts lineitem at the scan; part broadcasts
    (only p_partkey, p_type survive pruning); one global aggregate.
    No shuffle of fact-sized data at all — at 100 TB the cost is the
    pruned scan plus a broadcast probe."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q146_top_revenue_supplier",
    category="join",
    oracle="""
WITH sr AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, sr.rev_c / 10000.0 AS total_revenue
FROM sr
JOIN supplier s ON s.s_suppkey = sr.l_suppkey
WHERE sr.rev_c = (SELECT max(rev_c) FROM sr)
ORDER BY s.s_suppkey
""",
)
def q146_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): supplier(s) with the maximum
    quarterly revenue — the view + scalar-max-subquery pattern.

    Plan: one shuffle builds per-supplier revenue for the quarter;
    the max is a 1-row aggregate of that (tiny) result broadcast back
    for the equality — Spark never re-scans lineitem, mirroring the
    oracle's CTE reuse. Exact-cents revenue makes the max-equality
    safe (no double-rounding ties)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    sr = li.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_c"))
    mx = sr.agg(F.max("rev_c").alias("_mx"))
    return (
        sr.join(F.broadcast(mx))
        .filter(F.col("rev_c") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", (F.col("rev_c") / 10000.0).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q147_part_supplier_breadth",
    category="join",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 14, 23, 45, 9, 19, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
LIMIT 100
""",
)
def q147_part_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers serve each (brand, type, size) combination,
    excluding an unwanted supplier set via NOT IN. The fixture has no
    partsupp or comment text, so the pairs come from lineitem and the
    exclusion is low-balance suppliers.

    Plan: the exclusion list is an aggregate-reduced broadcast ANTI
    join (never a shuffle); part filters broadcast into lineitem; the
    distinct-count reduces to (brand, type, size, suppkey) distinct
    pairs via map-side partial before the final count — one wide
    exchange, keyed on the group."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 14, 23, 45, 9, 19, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 1000.0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@register(
    "q148_small_quantity_revenue",
    category="join",
    oracle="""
SELECT sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) / (100.0 * 7.0)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / (100.0 * count(*))
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
) pq ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < 0.5 * pq.avg_qty
""",
)
def q148_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lines of one brand whose quantity is below half that part's
    average quantity — a correlated scalar-average subquery. (TPC-H
    uses 0.2x; the synthetic fixture's quantities are uniform, so
    0.5x keeps the survivor set non-empty at every SF.)

    Plan: the correlated average decorrelates into a per-part
    aggregate of lineitem; brand-filtered part broadcasts first so
    the per-part averages are only computed for surviving keys on the
    probe side of a broadcast join... no: the average must cover ALL
    lines of the part (per spec), so the aggregate runs over the full
    fact once (one shuffle on l_partkey), then joins back to the
    brand-pruned lines — both sides already partitioned on l_partkey,
    so AQE elides the second exchange. Averages divide exact cents by
    exact counts for bit-stable thresholds."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#13").select(
        "p_partkey"
    )
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    pq = li.groupBy("l_partkey").agg(
        (F.sum(qty_c) / (100.0 * F.count(F.lit(1)))).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "_pk")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((F.sum(_cents("l_extendedprice")) / (100.0 * 7.0)).alias("avg_yearly"))
    )


@register(
    "q149_disjunctive_predicate_join",
    category="join",
    oracle="""
SELECT sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity >= 20 AND l.l_quantity <= 50)
""",
)
def q149_disjunctive_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR'd brand/size/quantity conjunct groups evaluated across
    the part join.

    Plan: part broadcasts; the disjunction is pushed into the join
    condition so non-qualifying probe rows die during the broadcast
    probe instead of surviving to a filter above the join. Catalyst
    additionally derives the implied single-side prefilters (brand IN
    (...), size ranges OR'd, quantity in the union range) and pushes
    them into both scans — the pattern TPC-H Q19 exists to test."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (q >= 10) & (q <= 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (q >= 20) & (q <= 50))
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & cond)
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
    )
