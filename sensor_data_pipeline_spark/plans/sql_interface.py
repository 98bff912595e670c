"""SQL-text interface (SURVEY.md §2.9: the reference has no SQL parser;
the engine inherits Spark SQL whole).

The strongest possible demonstration: ONE ANSI-SQL string, executed
verbatim by both engines — ``spark.sql(SQL)`` over temp views on the
Spark side, the exact same text as the DuckDB oracle. CTEs, a
dimension join, conditional aggregation, and a ranking window all go
through the parser/optimizer instead of the DataFrame builder, proving
the two front ends hit the same Catalyst plan space.

Scale note: views registered by ``register_views`` are plain parquet
scans — SQL text gets identical predicate pushdown / pruning /
broadcast treatment as the DataFrame API (same logical plan), so
nothing here costs more than its q0x DataFrame twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensor_data_pipeline_spark.plans.registry import register
from sensor_data_pipeline_spark.sources.tables import register_views

# Engine-portable ANSI SQL: runs unmodified on Spark SQL and DuckDB.
# Integer-scaled money sums keep the hash bit-deterministic (registry
# docstring); CAST(... AS BIGINT) after round matches both engines.
_PORTABLE_SQL = """
WITH order_revenue AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_scaled,
         count(*) AS n_lines
  FROM lineitem
  GROUP BY l_orderkey
),
ranked AS (
  SELECT o.o_orderpriority,
         r.rev_scaled,
         r.n_lines,
         row_number() OVER (PARTITION BY o.o_orderpriority
                            ORDER BY r.rev_scaled DESC, o.o_orderkey) AS rk
  FROM order_revenue r
  JOIN orders o ON o.o_orderkey = r.l_orderkey
)
SELECT o_orderpriority,
       count(*) AS n_top,
       sum(rev_scaled) / CAST(10000.0 AS DOUBLE) AS top_revenue,
       CAST(sum(CASE WHEN n_lines >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_wide_orders
FROM ranked
WHERE rk <= 100
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q111_sql_text_interface",
    category="sql",
    oracle=_PORTABLE_SQL,
)
def q111_sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact oracle SQL string executed by ``spark.sql`` over temp
    views — zero DataFrame code, so any divergence from DuckDB is a
    parser/semantics bug, not a translation bug. Covers CTE chaining,
    fact self-aggregation before the join, a per-group ranking window,
    and conditional aggregation in one statement."""
    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_SQL)


@register(
    "q201_sql_scripting",
    category="sql",
    oracle="""
WITH thresh AS (
  SELECT sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // count(*) AS avg_cents
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(t.avg_cents AS BIGINT) AS avg_cents
FROM orders, thresh t
WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > t.avg_cents
GROUP BY o_orderpriority, t.avg_cents
ORDER BY o_orderpriority
""",
)
def q201_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (BEGIN...END, DECLARE, SET, compound statements —
    the ISO/IEC 9075 procedural surface Spark 4 adds): a scalar is
    computed into a session variable, then parameterizes the final
    SELECT — the two-phase 'compute threshold, then filter by it'
    pattern analysts otherwise do with string interpolation. The
    threshold is integer cents DIV count so the scalar is
    summation-order independent; the oracle inlines the same logic as
    a CTE. Scripting stays a driver-side control plane: each statement
    still compiles to a distributed Catalyst plan, so nothing here
    fights the optimizer at 100 TB."""
    register_views(spark, sf_dir)
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        df = spark.sql(
            """
BEGIN
  DECLARE avg_cents BIGINT DEFAULT 0;
  SET avg_cents = (
    SELECT sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) DIV count(*)
    FROM orders
  );
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_above,
         CAST(avg_cents AS BIGINT) AS avg_cents
  FROM orders
  WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > avg_cents
  GROUP BY o_orderpriority
  ORDER BY o_orderpriority;
END
"""
        )
        df.collect()  # force execution under the scoped conf
        return df
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


@register(
    "q203_recursive_cte_rollup",
    category="sql",
    oracle="""
WITH RECURSIVE anc(c_custkey, anc_key, cents) AS (
  SELECT c_custkey, c_custkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT a.c_custkey, a.anc_key // 10, a.cents
  FROM anc a WHERE a.anc_key >= 10
)
SELECT CAST(anc_key AS BIGINT) AS root_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(cents) AS BIGINT) AS sum_bal_cents
FROM anc
WHERE anc_key < 10
GROUP BY anc_key
ORDER BY root_id
""",
)
def q203_recursive_cte_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (WITH RECURSIVE ... UNION ALL, new in Spark 4):
    every customer walks its decimal-digit ancestry (parent = id DIV
    10 — an id-encoded taxonomy, the same shape as account charts or
    org paths packed into key prefixes) and the rollup aggregates
    members and balances under each single-digit root. The recursion
    is a DAG walk with strictly decreasing keys, so it terminates in
    <= 7 iterations regardless of data size, and each iteration is a
    full distributed plan — no driver-side looping. (Cyclic closure
    needs distinct-UNION recursion, which Spark does not support yet —
    dedup_components covers that case as an operator.) The oracle runs
    the same recursion in DuckDB (`//` = Spark's DIV)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH RECURSIVE anc(c_custkey, anc_key, cents) AS (
  SELECT c_custkey, c_custkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT a.c_custkey, a.anc_key DIV 10, a.cents
  FROM anc a WHERE a.anc_key >= 10
)
SELECT CAST(anc_key AS BIGINT) AS root_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(cents) AS BIGINT) AS sum_bal_cents
FROM anc
WHERE anc_key < 10
GROUP BY anc_key
ORDER BY root_id
"""
    )


@register(
    "q209_collated_grouping",
    category="sql",
    oracle="""
WITH mixed AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src_mixed,
         doc_id
  FROM documents
)
SELECT lower(src_mixed) AS src_norm,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM mixed GROUP BY lower(src_mixed) ORDER BY src_norm
""",
)
def q209_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION surface (Spark 4): grouping under UTF8_LCASE merges
    case variants ENGINE-SIDE — no lower() rewrite of the data, the
    comparison itself is case-insensitive, which is what lets a
    collated column keep its original bytes while joins/groups behave
    case-insensitively (the i18n-correct path; lower() breaks for
    Turkish dotless-i etc.). The fixture is deterministic mixed case
    (even doc_ids upper-cased); output normalizes for the oracle,
    which states the same semantics as lower()-grouping (equivalent
    for ASCII). Plan: same single map-side-combinable shuffle as any
    groupBy — collation changes the comparator, not the shape."""
    from sensor_data_pipeline_spark.sources.tables import load_table

    d = load_table(spark, "documents", sf_dir)
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(F.col("source"))
    return (
        d.select(F.collate(mixed, "UTF8_LCASE").alias("src_ci"), "doc_id")
        .groupBy("src_ci")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .select(F.lower(F.col("src_ci")).cast("string").alias("src_norm"), "n", "first_doc")
        .orderBy("src_norm")
    )


@register(
    "q210_parameterized_sql",
    category="sql",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders
WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q210_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL + IDENTIFIER clause: the threshold arrives as
    a named parameter (:threshold) and the table as IDENTIFIER(:tbl) —
    the injection-safe way to template queries (values are bound as
    literals by the parser, identifiers validated as names; string
    interpolation is how SQL injection and plan-cache misses happen).
    Semantically identical to the static oracle."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :threshold
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"tbl": "orders", "threshold": 150000.0},
    )


@register(
    "q242_sql_pipe_syntax",
    category="functions",
    # DuckDB has no pipe syntax; the oracle is the same dataflow in
    # classic ANSI form — which is the point: |> is pure front-end
    # sugar over the identical logical plan.
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING count(*) > 10
ORDER BY l_returnflag, l_linestatus
""",
)
def q242_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4 `|>`, from the SQL:has-pipes lineage
    popularized by GoogleSQL): the pricing-summary dataflow written as
    a linear pipeline — FROM |> WHERE |> AGGREGATE ... GROUP BY |>
    WHERE (post-aggregation filter) |> ORDER BY. Front-end surface
    only: the parser lowers each stage onto the same Catalyst
    operators as the classic form (the oracle IS the classic form),
    so pushdown/pruning/codegen are unchanged — proven by the
    hash-equal result.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_lines > 10
        |> SELECT l_returnflag, l_linestatus, n_lines, sum_qty, sum_price_cents
        |> ORDER BY l_returnflag, l_linestatus
        """
    )
