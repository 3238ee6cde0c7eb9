"""Relational surface queries (SURVEY.md §2.3 E1-E10).

All pure Catalyst — built-in functions only, no UDFs — so every one of
these gets predicate pushdown, column pruning, broadcast joins, and
whole-stage codegen for free. Each query has a DuckDB oracle; floats
rounded identically on both sides (4 digits for money aggregates, 6 for
ratios) and all ranked output carries full deterministic tie-breaks.

Type alignment notes (Spark ↔ DuckDB):
- DuckDB SUM(BIGINT) returns HUGEINT → cast AS BIGINT in oracle SQL.
- DuckDB year()/row_number() return BIGINT → cast AS INT to match Spark.
- Session timezone pinned to UTC (session.py) so timestamps agree.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- E4: TPC-H Q1
@register("q1_pricing_summary", sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary (E4): 8 aggregates over 2 group
    keys; partial aggregation map-side, one shuffle on the tiny key."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.where(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
                 F.round(F.sum(disc), 4).alias("sum_disc_price"),
                 F.round(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


# ------------------------------------------------------- E2: filter/projection
@register("q_filter_project", sql="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
       l_returnflag
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_returnflag IN ('A', 'R')
  AND l_quantity > 45
  AND NOT (l_discount = 0.0)
""")
def q_filter_project(spark, sf_dir):
    """Projection + compound predicate (E2): BETWEEN, IN, NOT, > — all
    pushed to the parquet scan (verify PushedFilters in explain)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_shipdate").between("1996-01-01", "1996-12-31")
                     & F.col("l_returnflag").isin("A", "R")
                     & (F.col("l_quantity") > 45)
                     & ~(F.col("l_discount") == 0.0))
            .select("l_orderkey", "l_linenumber",
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                     .alias("net_price"),
                    "l_returnflag"))


# ------------------------------------------------------------- E3: star join
@register("q_star_join_revenue", sql="""
SELECT r.r_name AS region, n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
GROUP BY r.r_name, n.n_name
""")
def q_star_join_revenue(spark, sf_dir):
    """4-way star join (E3): fact-fact shuffle join lineitem⋈orders, then
    broadcast the small dims (customer/nation/region) — no shuffle for
    the dimension side at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"),
                 F.count("*").alias("n_items")))


@register("q_left_join_counts", sql="""
SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 4) AS total_spend
FROM customer c
LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT'
GROUP BY c.c_custkey, c.c_name
""")
def q_left_join_counts(spark, sf_dir):
    """Left outer join with ON-clause filter (E3): count preserves
    customers with zero urgent orders (COUNT of null key = 0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority == "1-URGENT")
    return (c.join(o, cond, "left")
            .groupBy("c_custkey", "c_name")
            .agg(F.count("o_orderkey").alias("n_orders"),
                 F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4)
                  .alias("total_spend")))


@register("q_semi_join", sql="""
SELECT c.c_nationkey, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
GROUP BY c.c_nationkey
""")
def q_semi_join(spark, sf_dir):
    """Left-semi join = EXISTS (E3): customers having any order above a
    threshold, counted per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n_customers")))


@register("q_anti_join", sql="""
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
""")
def q_anti_join(spark, sf_dir):
    """Left-anti join = NOT EXISTS (E3): customers with no urgent
    orders, per market segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_customers")))


# ---------------------------------------------------------------- E5: windows
@register("q_topn_per_group", sql="""
SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INT) AS rn
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn <= 3
""")
def q_topn_per_group(spark, sf_dir):
    """Top-3 customers by balance per nation (E5): the canonical
    windowed top-N; tie-break on custkey for determinism."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(),
                                             F.col("c_custkey").asc())
    return (c.select("c_nationkey", "c_custkey", "c_acctbal",
                     F.row_number().over(w).alias("rn"))
            .where(F.col("rn") <= 3))


@register("q_window_running", sql="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
       ROUND(COALESCE(LAG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC), 0.0), 4)
         AS prev_price
FROM orders
""")
def q_window_running(spark, sf_dir):
    """Running sum + lag per customer order history (E5), ordered by
    (orderdate, orderkey) so ties are deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(),
                                           F.col("o_orderkey").asc())
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 4)
         .alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 4)
         .alias("prev_price"))


@register("q_window_moving_avg", sql="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       ROUND(AVG(l_extendedprice) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
                  l_extendedprice ASC
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg3
FROM lineitem
""")
def q_window_moving_avg(spark, sf_dir):
    """Moving average with an explicit ROWS frame (E5).

    The synthetic lineitem has NO unique key — (l_orderkey,
    l_linenumber) duplicates exist — so the ROWS frame's order must
    tie-break all the way down to l_extendedprice: rows still tied
    after that are identical in every frame-relevant column, making
    the output a deterministic multiset on any engine. Without it,
    full-tie peers order engine-arbitrarily and the averages around
    them are nondeterministic (observed at sf0.1)."""
    li = _t(spark, sf_dir, "lineitem")
    w = (W.partitionBy("l_suppkey")
         .orderBy(F.col("l_shipdate").asc(), F.col("l_orderkey").asc(),
                  F.col("l_linenumber").asc(),
                  F.col("l_extendedprice").asc())
         .rowsBetween(-2, 0))
    return li.select("l_suppkey", "l_orderkey", "l_linenumber",
                     F.round(F.avg("l_extendedprice").over(w), 4).alias("mavg3"))


@register("q_rank_dense_rank", sql="""
SELECT p_brand, p_partkey, p_retailprice,
       CAST(rank() OVER (PARTITION BY p_brand
                         ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice DESC, p_partkey ASC) AS INT)
         AS drnk
FROM part
""")
def q_rank_dense_rank(spark, sf_dir):
    """rank + dense_rank (E5) over parts per brand."""
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(),
                                         F.col("p_partkey").asc())
    return p.select("p_brand", "p_partkey", "p_retailprice",
                    F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"))


# ------------------------------------------------------- E4: rollup/cube/pivot
@register("q_rollup", sql="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def q_rollup(spark, sf_dir):
    """ROLLUP grouping sets (E4): subtotals + grand total."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                 F.count("*").alias("n")))


@register("q_cube", sql="""
SELECT o_orderstatus, o_orderpriority,
       ROUND(SUM(o_totalprice), 4) AS sum_price, COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def q_cube(spark, sf_dir):
    """CUBE grouping sets (E4): all 4 grouping combinations."""
    o = _t(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
                 F.count("*").alias("n")))


@register("q_pivot", sql="""
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_F
FROM lineitem
GROUP BY l_returnflag
""")
def q_pivot(spark, sf_dir):
    """Pivot on linestatus (E4) with explicit value list (no extra scan
    for value discovery — required at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (li.groupBy("l_returnflag")
           .pivot("l_linestatus", ["O", "F"])
           .agg(F.round(F.sum("l_quantity"), 4)))
    return out.withColumnRenamed("O", "qty_O").withColumnRenamed("F", "qty_F")


@register("q_having", sql="""
SELECT l_suppkey, ROUND(SUM(l_extendedprice), 4) AS total
FROM lineitem
GROUP BY l_suppkey
HAVING SUM(l_extendedprice) > 20000000 AND COUNT(*) > 100
""")
def q_having(spark, sf_dir):
    """GROUP BY + HAVING on two aggregate predicates (E4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_suppkey")
            .agg(F.round(F.sum("l_extendedprice"), 4).alias("total"),
                 F.count("*").alias("_n"))
            .where((F.col("total") > 20000000) & (F.col("_n") > 100))
            .select("l_suppkey", "total"))


@register("q_distinct_agg", sql="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(COUNT(DISTINCT CAST(YEAR(o_orderdate) AS INT)) AS BIGINT) AS n_years,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""")
def q_distinct_agg(spark, sf_dir):
    """Multiple COUNT(DISTINCT) in one aggregation (E4) — Catalyst
    expands to grouping-set style plan automatically."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_customers"),
                 F.countDistinct(F.year("o_orderdate")).alias("n_years"),
                 F.count("*").alias("n_orders")))


# ----------------------------------------------------------- E6: order/limit
@register("q_top20_lineitems", sql="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
""")
def q_top20_lineitems(spark, sf_dir):
    """Global ORDER BY + LIMIT (E6): Spark plans TakeOrderedAndProject
    (per-partition partial top-k, no global sort). Full tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.select("l_orderkey", "l_linenumber", "l_extendedprice")
            .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
                     F.col("l_linenumber").asc())
            .limit(20))


# ----------------------------------------------------------------- E7: setops
@register("q_set_ops", sql="""
WITH urgent AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'),
     big    AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_totalprice > 300000)
SELECT 'both' AS tag, COUNT(*) AS n FROM (SELECT * FROM urgent INTERSECT SELECT * FROM big)
UNION ALL
SELECT 'urgent_only' AS tag, COUNT(*) AS n FROM (SELECT * FROM urgent EXCEPT SELECT * FROM big)
UNION ALL
SELECT 'either' AS tag, COUNT(*) AS n FROM (SELECT * FROM urgent UNION SELECT * FROM big)
""")
def q_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION-distinct / UNION ALL (E7) in one
    result, tagged."""
    o = _t(spark, sf_dir, "orders")
    urgent = (o.where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey").distinct())
    big = o.where(F.col("o_totalprice") > 300000).select("o_custkey").distinct()
    both = urgent.intersect(big).agg(F.count("*").alias("n")) \
                 .select(F.lit("both").alias("tag"), "n")
    only = urgent.exceptAll(big).agg(F.count("*").alias("n")) \
                 .select(F.lit("urgent_only").alias("tag"), "n")
    either = urgent.union(big).distinct().agg(F.count("*").alias("n")) \
                   .select(F.lit("either").alias("tag"), "n")
    return both.unionAll(only).unionAll(either)


# ------------------------------------------------------- E8: scalar functions
@register("q_string_funcs", sql="""
SELECT p_partkey,
       LOWER(p_name) AS lname,
       UPPER(p_brand) AS ubrand,
       SUBSTR(p_name, 1, 8) AS prefix8,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       CAST(LENGTH(p_name) AS INT) AS name_len,
       (p_name LIKE '%blue%') AS has_blue,
       SPLIT_PART(p_type, ' ', 1) AS type_head
FROM part
WHERE p_size BETWEEN 10 AND 30
""")
def q_string_funcs(spark, sf_dir):
    """String function battery (E8): lower/upper/substr/concat/length/
    like/split_part."""
    p = _t(spark, sf_dir, "part")
    return (p.where(F.col("p_size").between(10, 30))
            .select("p_partkey",
                    F.lower("p_name").alias("lname"),
                    F.upper("p_brand").alias("ubrand"),
                    F.substring("p_name", 1, 8).alias("prefix8"),
                    F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
                    F.length("p_name").alias("name_len"),
                    F.col("p_name").like("%blue%").alias("has_blue"),
                    F.split_part(F.col("p_type"), F.lit(" "), F.lit(1))
                     .alias("type_head")))


@register("q_date_funcs", sql="""
SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(MONTH(o_orderdate) AS INT) AS mo,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS revenue,
       CAST(MAX(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01'))
            AS INT) AS max_age_days
FROM orders
GROUP BY 1, 2
""")
def q_date_funcs(spark, sf_dir):
    """Date function battery (E8): year/month extraction + datediff,
    grouped monthly revenue."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy(F.year("o_orderdate").alias("yr"),
                      F.month("o_orderdate").alias("mo"))
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 4).alias("revenue"),
                 F.max(F.datediff(F.lit("2002-01-01").cast("date"),
                                  F.col("o_orderdate").cast("date")))
                  .alias("max_age_days")))


@register("q_math_case", sql="""
SELECT c_custkey,
       ROUND(ABS(c_acctbal), 4) AS abs_bal,
       ROUND(SQRT(ABS(c_acctbal)), 6) AS sqrt_bal,
       ROUND(LN(ABS(c_acctbal) + 1), 6) AS ln_bal,
       ROUND(POWER(c_acctbal / 1000, 2), 6) AS pow_bal,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS bal_bucket,
       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg
FROM customer
""")
def q_math_case(spark, sf_dir):
    """Math + conditional battery (E8): abs/sqrt/ln/power, CASE WHEN,
    coalesce/nullif."""
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(F.abs(bal), 4).alias("abs_bal"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("ln_bal"),
        F.round(F.pow(bal / 1000, 2), 6).alias("pow_bal"),
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("rich")
         .alias("bal_bucket"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER"))
         .alias("seg"))


# ------------------------------------------------------------ E9: array/JSON
@register("q_array_ops", sql="""
SELECT vec_id,
       CAST(LEN(embedding) AS INT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       ROUND(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]),
                                     x -> x * x)), 6) AS sq_norm,
       ROUND(LIST_MAX(CAST(embedding AS DOUBLE[])), 6) AS max_elem
FROM embeddings WHERE vec_id < 100
""")
def q_array_ops(spark, sf_dir):
    """Array expression battery (E9): size, element_at, transform +
    aggregate (sum of squares), array_max — all Catalyst built-ins."""
    e = _t(spark, sf_dir, "embeddings")
    arr = F.col("embedding").cast("array<double>")
    return (e.where(F.col("vec_id") < 100)
            .select("vec_id",
                    F.size("embedding").alias("dim"),
                    F.round(F.element_at(arr, 1), 6).alias("first_elem"),
                    F.round(F.aggregate(F.transform(arr, lambda x: x * x),
                                        F.lit(0.0), lambda a, b: a + b), 6)
                     .alias("sq_norm"),
                    F.round(F.array_max(arr), 6).alias("max_elem")))


@register("q_json_extract", sql="""
SELECT CAST(FLOOR(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS INT)
         AS k_bucket,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1
""")
def q_json_extract(spark, sf_dir):
    """JSON extraction from events.props (E9): get_json_object → int
    bucket, aggregated."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.groupBy(F.floor(k / 10).cast("int").alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value")))


# ---------------------------------------------------------- E10: stats/approx
@register("q_stats", sql="""
SELECT l_returnflag,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
       ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
       ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS median_qty,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95_price
FROM lineitem
GROUP BY l_returnflag
""")
def q_stats(spark, sf_dir):
    """Statistical aggregates (E10): corr, stddev, variance, exact
    interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                  .alias("corr_qty_price"),
                 F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
                 F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
                 F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
                 F.round(F.percentile("l_extendedprice", 0.95), 4)
                  .alias("p95_price")))


@register("q_approx_distinct", sql="""
SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_within_5pct
FROM lineitem
""")
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (E10), oracle-checked by *tolerance*: the
    query emits whether the HLL estimate lands within 5% of the exact
    count; the oracle asserts TRUE. Hash-matches iff the bound holds."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(F.countDistinct("l_partkey").alias("exact_parts"),
                 F.approx_count_distinct("l_partkey").alias("_approx"))
    return agg.select(
        "exact_parts",
        (F.abs(F.col("_approx") - F.col("exact_parts"))
         <= 0.05 * F.col("exact_parts")).alias("approx_within_5pct"))


# ------------------------------------------------- E3: full outer / right join
@register("q_full_outer", sql="""
WITH a AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
           WHERE o_totalprice > 150000 GROUP BY o_custkey),
     b AS (SELECT o_custkey, COUNT(*) AS n_recent FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY o_custkey)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       CAST(COALESCE(a.n_big, 0) AS BIGINT) AS n_big,
       CAST(COALESCE(b.n_recent, 0) AS BIGINT) AS n_recent
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
""")
def q_full_outer(spark, sf_dir):
    """FULL OUTER equi-join (E3) of two partial aggregates over orders —
    genuine null rows on both sides. Both inputs shuffle once on the
    join key; the upstream groupBys already partition by it, so AQE
    reuses the exchange."""
    o = _t(spark, sf_dir, "orders")
    a = (o.where(F.col("o_totalprice") > 150000)
         .groupBy("o_custkey").agg(F.count("*").alias("n_big")))
    b = (o.where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
         .groupBy("o_custkey").agg(F.count("*").alias("n_recent")))
    return (a.join(b, "o_custkey", "full_outer")
            .select(F.col("o_custkey").alias("custkey"),
                    F.coalesce("n_big", F.lit(0)).alias("n_big"),
                    F.coalesce("n_recent", F.lit(0)).alias("n_recent")))


@register("q_right_join", sql="""
SELECT c.c_custkey, c.c_mktsegment,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_urgent
FROM orders o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
  AND o.o_orderpriority = '1-URGENT'
GROUP BY c.c_custkey, c.c_mktsegment
""")
def q_right_join(spark, sf_dir):
    """RIGHT OUTER join (E3) preserving every customer, with a join-side
    predicate (urgent orders only) so unmatched rows survive rather than
    being filtered post-join. The preserved (customer) side cannot be
    the broadcast side, so Spark shuffles both; at scale flip to a left
    join + broadcast when the dim is the preserved side."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cond = (o.o_custkey == c.c_custkey) & \
        (o.o_orderpriority == "1-URGENT")
    return (o.join(c, cond, "right")
            .groupBy("c_custkey", "c_mktsegment")
            .agg(F.count("o_orderkey").alias("n_urgent")))


# ------------------------------------------------------ E2: null-safe equality
@register("q_null_safe_eq", sql="""
SELECT (NULLIF(o_orderstatus, 'F') IS NOT DISTINCT FROM
        NULLIF(substr(o_orderpriority, 1, 1), '1')) AS null_safe_same,
       COALESCE(CAST((NULLIF(o_orderstatus, 'F') =
                      NULLIF(substr(o_orderpriority, 1, 1), '1')) AS VARCHAR),
                'null') AS plain_eq,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2
""")
def q_null_safe_eq(spark, sf_dir):
    """Null-safe equality `<=>` vs plain `=` (E2) over derived nullable
    columns: the both-NULL group is TRUE under <=> and NULL under = —
    the oracle pins the three-valued-logic difference."""
    o = _t(spark, sf_dir, "orders")
    a = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    b = F.nullif(F.substring("o_orderpriority", 1, 1), F.lit("1"))
    return (o.select(a.eqNullSafe(b).alias("null_safe_same"),
                     F.coalesce((a == b).cast("string"), F.lit("null"))
                      .alias("plain_eq"))
            .groupBy("null_safe_same", "plain_eq")
            .agg(F.count("*").alias("n")))


# ------------------------------------------------------- E5: lead / order gaps
@register("q_order_gaps", sql="""
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(next_date AS DATE))
            AS INT) AS gap_days
FROM (SELECT o_custkey, o_orderkey, o_orderdate,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS next_date
      FROM orders)
WHERE next_date IS NOT NULL
""")
def q_order_gaps(spark, sf_dir):
    """lead() + datediff (E5/E8): days until each customer's next order.
    Single shuffle on the window partition key; full (ts, key) ordering
    for determinism."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.select("o_custkey", "o_orderkey", "o_orderdate",
                     F.lead("o_orderdate").over(w).alias("next_date"))
            .where(F.col("next_date").isNotNull())
            .select("o_custkey", "o_orderkey",
                    F.datediff("next_date", "o_orderdate").alias("gap_days")))


# -------------------------------------------------------- E4: GROUPING SETS
@register("q_grouping_sets", sql="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""")
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (E4) — disjoint from rollup/cube — with
    GROUPING() markers disambiguating the NULL group keys. One Expand +
    one shuffle; partial aggregation still applies."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gsets")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")


# ----------------------------------------------- E4 at scale: skewed keys
@register("q_skew_salted_agg", sql="""
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY event_type
""")
def q_skew_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation (E4 + skew handling): low-cardinality
    hot keys (event_type) first aggregate on (key, salt) — spreading each
    hot key over 16 reducers — then combine partials per key. Same result
    as the direct groupBy (the oracle), shuffle skew bounded by the salt
    fan-out. Spark's partial aggregation makes the direct plan fine for
    algebraic aggs; the salted shape is the template for holistic aggs
    (collect_list / percentile) where map-side combine can't help."""
    ev = _t(spark, sf_dir, "events")
    partial = (ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"),
                                             F.lit(16)))
               .groupBy("event_type", "_salt")
               .agg(F.count("*").alias("c"), F.sum("value").alias("s")))
    return (partial.groupBy("event_type")
            .agg(F.sum("c").alias("n_events"),
                 F.round(F.sum("s"), 4).alias("sum_value")))


@register("q_string_funcs2", sql="""
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
       lpad(p_brand, 12, '*') AS brand_padded,
       CAST(instr(p_type, 'ED') AS INT) AS ed_pos,
       reverse(p_brand) AS brand_rev,
       translate(p_brand, 'B#', 'b_') AS brand_tr,
       repeat(substr(p_brand, 1, 2), 2) AS b2x2,
       starts_with(p_type, 'STANDARD') AS is_standard,
       ends_with(p_type, 'STEEL') AS is_steel
FROM part
WHERE p_size <= 15
""")
def q_string_funcs2(spark, sf_dir):
    """Second string battery (E8): regexp_replace, lpad, instr,
    reverse, translate, repeat, startswith/endswith — all codegen'd."""
    p = _t(spark, sf_dir, "part")
    return (p.where(F.col("p_size") <= 15)
            .select("p_partkey",
                    F.regexp_replace("p_name", "[aeiou]", "")
                     .alias("no_vowels"),
                    F.lpad("p_brand", 12, "*").alias("brand_padded"),
                    F.instr("p_type", "ED").alias("ed_pos"),
                    F.reverse("p_brand").alias("brand_rev"),
                    F.translate("p_brand", "B#", "b_").alias("brand_tr"),
                    F.repeat(F.substring("p_brand", 1, 2), 2).alias("b2x2"),
                    F.startswith("p_type", F.lit("STANDARD"))
                     .alias("is_standard"),
                    F.endswith("p_type", F.lit("STEEL")).alias("is_steel")))


@register("q_from_json", sql="""
SELECT CAST(json_extract(props, '$.k') AS INT) % 2 = 0 AS k_even,
       COUNT(*) AS n,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY 1
""")
def q_from_json(spark, sf_dir):
    """Structured JSON parsing (E9): from_json with an explicit schema
    (vs q_json_extract's path extraction), aggregated over the parsed
    struct field."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k INT").getField("k").alias("k"))
    return (parsed.groupBy((F.col("k") % 2 == 0).alias("k_even"))
            .agg(F.count("*").alias("n"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


# --------------------------------------------------- TPC-H classics Q3 / Q10
@register("q3_shipping_priority", sql="""
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-03-15'
  AND l.l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""")
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast into the fact-fact
    join, aggregate, global top-10 with full tie-break (E3+E4+E6).
    lineitem⋈orders shuffles on orderkey; customer broadcasts."""
    c = (_t(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment") == "BUILDING"))
    o = (_t(spark, sf_dir, "orders")
         .where(F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")))
    li = (_t(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate",
                    "o_orderpriority")
            .orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                     F.asc("l_orderkey"))
            .limit(10))


@register("q10_returned_items", sql="""
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       n.n_name, c.c_mktsegment
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""")
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer over a date
    window, dims broadcast, top-20 deterministic (E3+E4+E6)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = (_t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))))
    li = (_t(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name",
                    "c_mktsegment")
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@register("q_unpivot", sql="""
SELECT l_orderkey, l_linenumber, charge, amount
FROM (
  SELECT l_orderkey, l_linenumber,
         ROUND(l_extendedprice * l_discount, 4) AS discount_amt,
         ROUND(l_extendedprice * l_tax, 4) AS tax_amt
  FROM lineitem WHERE l_orderkey < 100
)
UNPIVOT (amount FOR charge IN (discount_amt, tax_amt))
ORDER BY l_orderkey, l_linenumber, charge
""")
def q_unpivot(spark, sf_dir):
    """UNPIVOT / melt (E4 reshape): wide per-line charges to long
    (charge, amount) rows — narrow transform, no shuffle until the
    deterministic output ordering."""
    li = (_t(spark, sf_dir, "lineitem")
          .where(F.col("l_orderkey") < 100)
          .select("l_orderkey", "l_linenumber",
                  F.round(F.col("l_extendedprice") * F.col("l_discount"), 4)
                   .alias("discount_amt"),
                  F.round(F.col("l_extendedprice") * F.col("l_tax"), 4)
                   .alias("tax_amt")))
    return (li.unpivot(["l_orderkey", "l_linenumber"],
                       ["discount_amt", "tax_amt"], "charge", "amount")
            .orderBy("l_orderkey", "l_linenumber", "charge"))


@register("q_approx_percentile", sql="""
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS exact_p50,
       TRUE AS approx_within_2pct
FROM lineitem
GROUP BY l_returnflag
""")
def q_approx_percentile(spark, sf_dir):
    """approx_percentile (E10), oracle-checked by tolerance like
    q_approx_distinct: emits whether the sketch estimate lands within
    2% of the exact interpolated median; the oracle asserts TRUE."""
    li = _t(spark, sf_dir, "lineitem")
    agg = (li.groupBy("l_returnflag")
           .agg(F.round(F.percentile("l_extendedprice", 0.5), 4)
                 .alias("exact_p50"),
                F.approx_percentile("l_extendedprice", 0.5, 10000)
                 .alias("_approx")))
    return agg.select(
        "l_returnflag", "exact_p50",
        (F.abs(F.col("_approx") - F.col("exact_p50"))
         <= 0.02 * F.col("exact_p50")).alias("approx_within_2pct"))


@register("q4_order_priority", sql="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS (E3 semi join with a non-equi
    conjunct). Catalyst plans the EXISTS as a left-semi hash join on
    l_orderkey with the l_shipdate > o_orderdate residual — one shuffle
    on the join key, then a tiny 5-group aggregate."""
    o = (_t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))))
    li = _t(spark, sf_dir, "lineitem")
    return (o.join(li, (li.l_orderkey == o.o_orderkey)
                   & (li.l_shipdate > o.o_orderdate), "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


@register("q5_local_supplier_volume", sql="""
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
""")
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with region filter and the
    customer-nation = supplier-nation locality predicate (E3). Only
    lineitem⋈orders is a shuffle join; supplier, customer, nation,
    region all broadcast (dims), so the fact table is read once and
    never re-shuffled for the dim lookups."""
    r = (_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = (_t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))))
    li = _t(spark, sf_dir, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 4)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name")))


@register("q18_large_volume_customer", sql="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
       ROUND(big.sum_qty, 4) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250) big
  ON o.o_orderkey = big.l_orderkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
""")
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: aggregate subquery as a join input (E3+E4).
    The HAVING filter shrinks the aggregated lineitem to ~1% before it
    joins orders — the selective side of a shuffle join — then customer
    broadcasts into the survivors."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = (_t(spark, sf_dir, "lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 250))
    return (o.join(big, o.o_orderkey == big.l_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey", "o_totalprice",
                    F.round("sum_qty", 4).alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(20))


@register("q_window_extras", sql="""
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       first_value(c_custkey) OVER w AS richest_custkey,
       last_value(c_custkey) OVER (
         PARTITION BY c_mktsegment
         ORDER BY c_acctbal DESC, c_custkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS poorest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey ASC)
""")
def q_window_extras(spark, sf_dir):
    """Remaining E5 window functions: ntile, percent_rank, cume_dist,
    first_value, and last_value with an explicit unbounded frame (the
    default frame would stop at CURRENT ROW). One shuffle on the
    partition key serves all five functions — same window spec reused."""
    c = _t(spark, sf_dir, "customer")
    w = (W.partitionBy("c_mktsegment")
          .orderBy(F.desc("c_acctbal"), F.asc("c_custkey")))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey", "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_custkey"),
        F.last("c_custkey").over(w_full).alias("poorest_custkey"))


@register("q_profile_orders", sql="""
SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_orderstatus),
       CAST(MIN(o_orderstatus) AS VARCHAR),
       CAST(MAX(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*),
       CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_totalprice),
       CAST(MIN(o_totalprice) AS VARCHAR),
       CAST(MAX(o_totalprice) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*),
       CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_orderdate),
       CAST(MIN(o_orderdate) AS VARCHAR),
       CAST(MAX(o_orderdate) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       COUNT(DISTINCT o_orderpriority),
       CAST(MIN(o_orderpriority) AS VARCHAR),
       CAST(MAX(o_orderpriority) AS VARCHAR)
FROM orders
""")
def q_profile_orders(spark, sf_dir):
    """Dataset profiling (training-data QA): one aggregate pass emits
    per-column count/null/distinct/min/max for the orders table —
    operators/profiling.py::profile."""
    from quake_vector_search_spark.operators.profiling import profile

    o = _t(spark, sf_dir, "orders")
    return profile(o, ["o_orderkey", "o_orderstatus", "o_totalprice",
                       "o_orderdate", "o_orderpriority"])


@register("q17_small_quantity_revenue", sql="""
WITH pa AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS cut
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 4) AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < pa.cut
""")
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    threshold) decorrelated into an aggregate + self-join — the form
    Catalyst itself rewrites scalar subqueries into. The aggregate
    shrinks lineitem to one row per part before the join, so the
    shuffle moves |parts| rows, not |lineitem|."""
    li = _t(spark, sf_dir, "lineitem")
    pa = (li.groupBy("l_partkey")
          .agg((F.avg("l_quantity") * 0.2).alias("cut")))
    return (li.join(pa, "l_partkey")
            .where(F.col("l_quantity") < F.col("cut"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 4)
                  .alias("avg_yearly"),
                 F.count("*").alias("n_small")))


@register("q_regex_funcs", sql="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS color,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT)
         AS n_vowels,
       CASE WHEN regexp_matches(p_name, '^(red|blue|green)')
            THEN TRUE ELSE FALSE END AS primary_color
FROM part
WHERE p_partkey < 500
""")
def q_regex_funcs(spark, sf_dir):
    """Regexp battery (E8): extract with group, global replace,
    match-count via extract_all, anchored rlike — all JVM-side codegen
    expressions, no UDFs."""
    p = (_t(spark, sf_dir, "part")
         .where(F.col("p_partkey") < 500))
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 1)
         .alias("color"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0))
         .alias("n_vowels"),
        F.col("p_name").rlike("^(red|blue|green)")
         .alias("primary_color"))


@register("q_map_ops", sql="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k_typed,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       CASE WHEN json_extract(props, '$.missing') IS NULL
            THEN TRUE ELSE FALSE END AS missing_is_null
FROM events
WHERE event_id < 2000
""")
def q_map_ops(spark, sf_dir):
    """Map-typed JSON handling (E9): parse props into MAP<STRING,INT>,
    read through the map, count keys, prove absent keys are null —
    from_json to a map type instead of a fixed struct schema."""
    ev = (_t(spark, sf_dir, "events")
          .where(F.col("event_id") < 2000))
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        m.getItem("k").alias("k_typed"),
        F.size(F.map_keys(m)).alias("n_keys"),
        m.getItem("missing").isNull().alias("missing_is_null"))


@register("q22_global_sales_opportunity", sql="""
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 4) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""")
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average
    broadcast as a 1-row cross join) + NOT EXISTS anti join on a
    filtered order window (E3+E4).
    The anti join shuffles on custkey; the scalar is a literal by the
    time the filter runs."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (c.where(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("a")))
    return (c.crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("a"))
            .join(o.where(F.col("o_orderdate")
                          >= F.lit("2000-01-01").cast("timestamp")),
                  c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("numcust"),
                 F.round(F.sum("c_acctbal"), 4).alias("totacctbal"))
            .orderBy("c_mktsegment"))


@register("q_salted_join", sql="""
SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber,
       ROUND(l.l_extendedprice, 4) AS price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey < 1000
""")
def q_salted_join(spark, sf_dir):
    """Salted skew join (scale pattern next to q_skew_salted_agg): the
    fact side carries a deterministic per-row salt, the other side is
    replicated per salt value, and the join key becomes (key, salt) —
    row-identical to the plain join (the oracle IS the plain join) with
    a hot key spread over n_salt reducers."""
    from quake_vector_search_spark.operators.sampling import salted_join

    li = _t(spark, sf_dir, "lineitem")
    o = (_t(spark, sf_dir, "orders")
         .where(F.col("o_orderkey") < 1000)
         .withColumnRenamed("o_orderkey", "l_orderkey"))
    out = salted_join(li, o.select("l_orderkey", "o_orderpriority"),
                      key="l_orderkey", n_salt=8)
    return out.select(F.col("l_orderkey").alias("o_orderkey"),
                      "o_orderpriority", "l_linenumber",
                      F.round("l_extendedprice", 4).alias("price"))


@register("q_date_funcs2", sql="""
SELECT o_orderkey,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3mo,
       CAST(dayofweek(o_orderdate) AS INT) AS dow,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       CAST(weekofyear(o_orderdate) AS INT) AS woy,
       CAST(quarter(o_orderdate) AS INT) AS qtr
FROM orders
WHERE o_orderkey < 2000
""")
def q_date_funcs2(spark, sf_dir):
    """Second datetime battery (E8): last_day, add_months, day-of-week/
    year, ISO week, quarter — all codegen expressions. (DuckDB
    dayofweek is 0-based Sunday; Spark's is 1-based → align with -1.)"""
    o = (_t(spark, sf_dir, "orders")
         .where(F.col("o_orderkey") < 2000))
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3mo"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.quarter("o_orderdate").alias("qtr"))


@register("q_min_by_max_by", sql="""
SELECT o_orderpriority,
       arg_min(o_orderkey, o_totalprice) AS cheapest_order,
       arg_max(o_orderkey, o_totalprice) AS priciest_order,
       ROUND(MIN(o_totalprice), 4) AS min_price,
       ROUND(MAX(o_totalprice), 4) AS max_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def q_min_by_max_by(spark, sf_dir):
    """min_by/max_by (E4): argmin/argmax aggregates — fetch the key of
    the extreme row without a self-join or window. (o_totalprice values
    are distinct per group at this scale, so the result is
    deterministic; a production query would tie-break via struct
    ordering.)"""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.min_by("o_orderkey", "o_totalprice")
                  .alias("cheapest_order"),
                 F.max_by("o_orderkey", "o_totalprice")
                  .alias("priciest_order"),
                 F.round(F.min("o_totalprice"), 4).alias("min_price"),
                 F.round(F.max("o_totalprice"), 4).alias("max_price"))
            .orderBy("o_orderpriority"))


@register("q_histogram", sql="""
WITH b AS (
  SELECT LEAST(CAST(floor((l_extendedprice - 900.0) / 10500.0)
               AS INT), 9) AS bucket
  FROM lineitem
)
SELECT bucket,
       ROUND(900.0 + bucket * 10500.0, 4) AS bucket_lo,
       ROUND(900.0 + (bucket + 1) * 10500.0, 4) AS bucket_hi,
       COUNT(*) AS n
FROM b GROUP BY bucket ORDER BY bucket
""")
def q_histogram(spark, sf_dir):
    """Equal-width histogram (profiling/E10): 10 fixed buckets over
    l_extendedprice — one scan, one tiny aggregate; the data-QA
    companion to q_profile_orders. Fixed bounds keep it deterministic
    (a data-driven min/max would add one cheap bounds pass, as
    ts_gapfill_ffill does)."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - 900.0) / 10500.0)
         .cast("int"),
        F.lit(9))
    return (li.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n"))
            .select("bucket",
                    F.round(900.0 + F.col("bucket") * 10500.0, 4)
                     .alias("bucket_lo"),
                    F.round(900.0 + (F.col("bucket") + 1) * 10500.0, 4)
                     .alias("bucket_hi"),
                    "n")
            .orderBy("bucket"))


@register("q_redact_ids", sql="""
SELECT c_custkey,
       regexp_replace(c_name, '[0-9]', 'X', 'g') AS redacted_name,
       CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT)
         AS n_digits_masked
FROM customer
WHERE c_custkey < 500
""")
def q_redact_ids(spark, sf_dir):
    """Identifier redaction (training-data pipeline: PII-style masking
    as a pure codegen transform): digits in customer names masked with
    a count of masked characters — the same regexp_replace shape an
    email/phone scrubber uses, applied pre-export."""
    c = (_t(spark, sf_dir, "customer")
         .where(F.col("c_custkey") < 500))
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]", "X").alias("redacted_name"),
        F.size(F.regexp_extract_all("c_name", F.lit("[0-9]"), 0))
         .alias("n_digits_masked"))


@register("q_weighted_sample", sql="""
WITH keyed AS (
  SELECT o_orderkey, o_totalprice,
         ln((CAST(concat('0x', substr(md5(concat('44', ':',
               CAST(o_orderkey AS VARCHAR))), 1, 15)) AS BIGINT) + 1)
            / 1152921504606846976.0) / o_totalprice AS sample_key
  FROM orders WHERE o_totalprice > 0
)
SELECT o_orderkey, o_totalprice
FROM keyed
ORDER BY sample_key DESC, o_orderkey ASC
LIMIT 100
""")
def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (training-pipeline: importance-weighted corpus subsetting).
    Efraimidis-Spirakis A-Res keys from the portable md5 hash —
    operators/sampling.py::weighted_sample — so the winning 100 orders
    (weight = o_totalprice) are a pure function of (ids, weights,
    seed): identical on every engine and partitioning. Plan is a
    narrow projection + TakeOrdered(100), no full sort."""
    from quake_vector_search_spark.operators.sampling import (
        weighted_sample,
    )

    orders = _t(spark, sf_dir, "orders")
    out = weighted_sample(orders, weight_col="o_totalprice", n=100,
                          id_col="o_orderkey", seed=44)
    # the keys are ~1e-10 magnitude: rounding them for display would
    # collapse to ±0.0 (whose sign hashes differently across engines),
    # so the output is the selected rows — the semantic result
    return out.select("o_orderkey", "o_totalprice")


# ------------------------------------------------------- layout: z-order curve
from quake_vector_search_spark.operators.layout import (  # noqa: E402
    interleave_bits,
    interleave_sql,
)

_Z_SQL = interleave_sql("(user_id % 65536)", "(event_id % 65536)")


@register("q_zorder_values", sql=f"""
SELECT event_id, user_id,
       {_Z_SQL} AS zval
FROM events
ORDER BY zval ASC, event_id ASC
LIMIT 100
""")
def q_zorder_values(spark, sf_dir):
    """Morton/z-order curve position for (user_id, event_id) — the
    clustering key operators/layout.py::zorder_write sorts by. Pure
    integer shift/mask arithmetic expanded into one codegen expression;
    the DuckDB oracle is built from the SAME interleave_sql text, so
    the engines compute bit-identical curve positions. (The min-max
    scaling used for float columns is pinned by unit tests instead —
    float division parity across engines is not hash-stable.)"""
    ev = _t(spark, sf_dir, "events")
    a = F.col("user_id") % 65536
    b = F.col("event_id") % 65536
    return (ev.select("event_id", "user_id",
                      interleave_bits(a, b).alias("zval"))
            .orderBy(F.asc("zval"), F.asc("event_id"))
            .limit(100))


@register("q_kmv_distinct", sql="""
WITH hashes AS (
  SELECT DISTINCT
    (CAST(concat('0x', substr(md5(concat('kmv', ':',
         CAST(o_custkey AS VARCHAR))), 1, 15)) AS BIGINT) + 1)
      / 1152921504606846976.0 AS u
  FROM orders
), mins AS (
  SELECT u FROM hashes ORDER BY u ASC LIMIT 256
), agg AS (
  SELECT MAX(u) AS kth, CAST(COUNT(*) AS BIGINT) AS n_kept FROM mins
)
SELECT ROUND(kth, 10) AS kth_min_hash,
       ROUND(CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                  ELSE 255.0 / kth END, 4) AS est_distinct,
       n_kept
FROM agg
""")
def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch over orders.o_custkey
    (operators/sketch.py::kmv_distinct): k=256 minimum portable
    hashes → estimate (k−1)/kth_min, exact below k. Constant-size
    mergeable state (the at-scale alternative to exact
    count_distinct's full shuffle); deterministic, so the DuckDB
    oracle builds the identical sketch and the estimate hash-matches
    with NO tolerance — unlike approx_count_distinct's HLL."""
    from quake_vector_search_spark.operators.sketch import kmv_distinct

    orders = _t(spark, sf_dir, "orders")
    return kmv_distinct(orders, "o_custkey", k=256)


_SHARED_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       ROUND(AVG(l_quantity), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


@register("q_shared_sql_text", sql=_SHARED_SQL)
def q_shared_sql_text(spark, sf_dir):
    """The SQL-surface proof: this query's oracle string IS its
    implementation — one dialect-shared ANSI text executed verbatim by
    Spark SQL (over the register_all temp views) and by DuckDB, and
    the results hash-match. Demonstrates that a SQL-string user gets
    the same engine semantics as the DataFrame API (same Catalyst
    plan: pushdown + partial agg)."""
    from quake_vector_search_spark.sources.catalog import register_all

    register_all(spark, sf_dir, names=("lineitem",))
    return spark.sql(_SHARED_SQL)


@register("q_histogram_equidepth", sql="""
WITH n AS (SELECT COUNT(*) AS total FROM orders)
SELECT b.bucket, TRUE AS within_tol, n.total AS n_total
FROM (SELECT unnest(range(1, 11)) AS bucket) b, n
""")
def q_histogram_equidepth(spark, sf_dir):
    """Equi-depth histogram, DEFAULT scale path: approx_percentile
    boundary sketch (one pass, mergeable, no global sort) + a narrow
    bucket-assignment scan + a 10-row spine join (all buckets present
    even if a sketched cut collapses one empty). The oracle checks the
    properties a sketch can promise: all 10 buckets exist, every
    bucket holds its fair share ±5%, and no row is lost — n_total is
    the SUM of per-bucket counts, so it equals DuckDB's COUNT(*) only
    if the CASE ladder assigned every row. The exact global-ntile form
    is demoted to q_histogram_equidepth_oracle (its ORDER BY-only
    window funnels the whole table through one task at scale)."""
    orders = _t(spark, sf_dir, "orders")
    qs = [i / 10.0 for i in range(1, 10)]
    head = orders.agg(
        F.percentile_approx("o_totalprice", qs, 100_000).alias("b"),
        F.count("*").alias("total")).head()
    bounds, total = list(head["b"]), int(head["total"])
    # CASE ladder over the 9 sketched cuts, lowest upward → buckets 1..10
    cases = F.when(F.col("o_totalprice") <= float(bounds[0]), F.lit(1))
    for i in range(1, 9):
        cases = cases.when(F.col("o_totalprice") <= float(bounds[i]),
                           F.lit(i + 1))
    cases = cases.otherwise(F.lit(10))
    per = (orders.withColumn("bucket", cases)
           .groupBy("bucket").agg(F.count("*").alias("n")))
    spine = spark.range(1, 11).withColumnRenamed("id", "bucket")
    fair = total / 10.0
    return (spine
            .join(per.withColumn("bucket", F.col("bucket").cast("long")),
                  "bucket", "left")
            .join(per.agg(F.sum("n").alias("n_total")))
            .select("bucket",
                    (F.abs(F.coalesce(F.col("n"), F.lit(0)) - F.lit(fair))
                     / F.lit(fair) < 0.05).alias("within_tol"),
                    "n_total"))


@register("q_histogram_equidepth_oracle", sql="""
WITH t AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC)
           AS bucket
  FROM orders
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(o_totalprice), 4) AS lo,
       ROUND(MAX(o_totalprice), 4) AS hi
FROM t GROUP BY bucket
""")
def q_histogram_equidepth_oracle(spark, sf_dir):
    """Equi-depth histogram, EXACT oracle form (deliberately NOT the
    default — *_oracle naming, same convention as the dedup family):
    ntile(10) over a fully tie-broken global order. The ORDER BY-only
    window moves every row through a single task, which is the honest
    cost of exact equi-depth; it exists as the hash-matched reference
    the sketch default is judged against, never as the scale path."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = W.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (orders
            .withColumn("bucket", F.ntile(10).over(w))
            .groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.round(F.min("o_totalprice"), 4).alias("lo"),
                 F.round(F.max("o_totalprice"), 4).alias("hi")))


@register("q_stratified_sample", sql="""
SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
FROM orders
WHERE CAST(concat('0x', substr(md5(concat('45', ':',
       CAST(o_orderkey AS VARCHAR))), 1, 15)) AS BIGINT) % 10000 < 1000
""")
def q_stratified_sample(spark, sf_dir):
    """Deterministic 10% stratified sample of orders
    (operators/sampling.py::stratified_sample): portable-hash bucket
    < frac — a narrow transform with no shuffle and no stratum
    counting, stable under reruns and incremental ingest. The strata
    column rides along untouched; every stratum is sampled at the
    same rate by hash independence."""
    from quake_vector_search_spark.operators.sampling import (
        stratified_sample,
    )

    orders = _t(spark, sf_dir, "orders")
    samp = stratified_sample(orders, "o_orderpriority", 0.10,
                             id_col="o_orderkey", seed=45)
    return samp.select("o_orderpriority", "o_orderkey",
                       F.round("o_totalprice", 4).alias("o_totalprice"))
