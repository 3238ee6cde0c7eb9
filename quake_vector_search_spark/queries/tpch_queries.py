"""TPC-H-shaped queries Q6-Q21 adapted to the driver's star schema.

Widens the relational surface (SURVEY.md §2.3 E2-E6) with the classic
optimizer shapes the earlier battery (relational_queries.py: Q1/3/4/5/
10/17/18/22) doesn't cover yet:

- Q6  pure scan-filter-aggregate (the predicate-pushdown showcase)
- Q7  two-sided dimension join with a disjunctive nation-pair predicate
- Q8  market-share ratio (conditional sum over a 7-table join)
- Q9  product-type profit by (nation, year)
- Q12 join + conditional classification counts (lateness analog)
- Q13 outer join with join-condition filter + two-level aggregation
- Q14 conditional-numerator ratio over a join
- Q15 top-supplier via scalar max subquery over a grouped CTE
- Q16 count-distinct with NOT-IN subquery exclusion
- Q19 disjunction of conjunctive range clauses (OR pushdown)
- Q20 nested semi-join chain with a HAVING-gated subquery
- Q21 EXISTS + NOT EXISTS self-joins (semi/anti at scale)

The driver testdata has no partsupp table and no commit/receipt dates,
so the shapes are adapted: "late" means l_shipdate > o_orderdate + N
days, Q9's profit omits supplycost, Q16/Q20 use lineitem as the
part-supplier relation. Every adaptation keeps the plan shape (and
therefore the optimizer exercise) of the original.

All pure Catalyst; dimension sides are explicitly broadcast. Money
aggregates round 4, ratios round 6, all ranked output fully tie-broken
(queries/__init__.py determinism rules).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quake_vector_search_spark.queries import register
from quake_vector_search_spark.sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _disc():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------- Q6
@register("q6_forecast_revenue", sql="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: the canonical scan-filter-aggregate. No join, no
    shuffle beyond the single-row final agg — at 100 TB this is one
    pass with every predicate pushed to the parquet scan (shipdate
    range + discount range + quantity all appear in PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                     & F.col("l_discount").between(0.04, 0.08)
                     & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
                  .alias("revenue"),
                 F.count("*").alias("n_lines")))


# --------------------------------------------------------------------- Q7
@register("q7_volume_shipping", sql="""
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume between two nations by year.
    The disjunctive nation-pair predicate can't be pushed into either
    nation scan alone, but both nation joins are broadcasts, so the
    pair filter runs stream-side inside codegen; only the final 4-group
    agg shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
            .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
            .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
            .where(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(_disc()), 4).alias("revenue")))


# --------------------------------------------------------------------- Q8
@register("q8_market_share", sql="""
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
""")
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: one supplier-nation's share of PROMO-part revenue sold
    into ASIA, by order year. Seven-table join where every dimension
    side (part, supplier, nation x2, region) broadcasts — the only
    shuffles are the two fact-side joins (orders, customer) and the
    2-row final agg. Conditional-sum ratio, round 6."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n1 = nation.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    n2 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("nation"))
    return (li
            .join(F.broadcast(part.where(F.col("p_type") == "PROMO")),
                  F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))),
                F.col("o_orderkey") == F.col("l_orderkey"))
            .join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n1), F.col("c_nk") == F.col("c_nationkey"))
            .join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
                  F.col("r_regionkey") == F.col("n_regionkey"))
            .join(F.broadcast(n2), F.col("s_nk") == F.col("s_nationkey"))
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", _disc())
                       .otherwise(F.lit(0.0))) / F.sum(_disc()), 6)
                .alias("mkt_share")))


# --------------------------------------------------------------------- Q9
@register("q9_product_type_profit", sql="""
SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
""")
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 (adapted: no partsupp, so profit = discounted revenue
    without supplycost): per-(supplier-nation, order-year) profit on
    widget parts. The LIKE filter prunes part before the broadcast; the
    orders join is the one big shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (li
            .join(F.broadcast(part.where(F.col("p_name").like("%widget%"))),
                  F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(nation),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(_disc()), 4).alias("sum_profit")))


# --------------------------------------------------------------------- Q12
@register("q12_late_shipment_priority", sql="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
""")
def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 (adapted: no shipmode/commitdate — "late" means
    shipped >90 days after the order date, classified by linestatus):
    did late shipments hit urgent orders? Join + post-join inter-column
    predicate + conditional counts; one shuffle on the orderkey join
    (the lateness predicate needs both sides), one on the 2-row agg."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .where((F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
                   & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                   & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


# --------------------------------------------------------------------- Q13
@register("q13_customer_order_distribution", sql="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""")
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of per-customer order counts, with the
    priority filter inside the LEFT JOIN condition (so order-less
    customers still count at 0 — a WHERE would silently drop them).
    Two-level aggregation: the big one keys on custkey (same key as
    the join, so AQE can reuse the exchange), the second collapses to
    the tiny distinct-count domain."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderpriority") != "5-LOW"),
        "left")
    return (joined.groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


# --------------------------------------------------------------------- Q14
@register("q14_promo_revenue", sql="""
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
       AS promo_revenue_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""")
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: percent of March-1996 revenue from PROMO parts.
    Conditional-numerator ratio over a broadcast part join; the month
    filter reaches the lineitem scan so only ~1/80th of the fact table
    is read."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (li.where((F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .agg(F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", _disc())
                               .otherwise(F.lit(0.0))) / F.sum(_disc()), 6)
                .alias("promo_revenue_pct"),
                F.count("*").alias("n_lines")))


# --------------------------------------------------------------------- Q15
@register("q15_top_supplier", sql="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       ROUND(r.total_revenue, 4) AS total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: the supplier(s) with maximum Q1-1996 revenue — the
    grouped-CTE + scalar-max-subquery shape. The revenue aggregate is
    tiny (one row per supplier) so the max is a broadcast-able scalar;
    Spark plans the self-reference as a reused exchange, not a second
    lineitem scan."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    revenue = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc()).alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (sup.join(revenue, F.col("supplier_no") == F.col("s_suppkey"))
            .join(F.broadcast(max_rev),
                  F.col("total_revenue") == F.col("mx"))
            .select("s_suppkey", "s_name",
                    F.round("total_revenue", 4).alias("total_revenue")))


# --------------------------------------------------------------------- Q16
@register("q16_supplier_part_count", sql="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""")
def q16_supplier_part_count(spark, sf_dir):
    """TPC-H Q16 (adapted: lineitem stands in for partsupp): how many
    distinct suppliers ship each qualifying (brand, type, size)?
    Exclusion list (negative-balance suppliers ~ the original's
    complaints filter) via NOT IN — a broadcast null-aware anti-join
    over a provably non-null key. count_distinct shuffles on the group
    key with partial distinct-aggregation map-side."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    bad = sup.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = part.where((F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    return (li.join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(bad),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("l_suppkey").alias("supplier_cnt")))


# --------------------------------------------------------------------- Q19
@register("q19_disjunctive_revenue", sql="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: revenue under a disjunction of conjunctive clauses
    mixing part and lineitem columns. Catalyst derives the implied
    single-side filters (p_brand IN (..) onto part, l_quantity 1..30
    onto lineitem) and pushes them below the join even though the OR
    itself must evaluate post-join — the classic CNF-extraction test."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30)))
    return (li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .where(clause)
            .agg(F.round(F.sum(_disc()), 4).alias("revenue"),
                 F.count("*").alias("n_lines")))


# --------------------------------------------------------------------- Q20
@register("q20_heavy_shippers", sql="""
SELECT s.s_suppkey, s.s_name, n.n_name,
       ROUND(s.s_acctbal, 4) AS s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
  HAVING SUM(l.l_quantity) > 390
)
""")
def q20_heavy_shippers(spark, sf_dir):
    """TPC-H Q20 (adapted: shipped quantity stands in for partsupp
    availqty): suppliers who moved >390 units of small-named parts in
    1996 — the IN-subquery-with-HAVING shape. The inner aggregate is
    per-supplier (tiny), so the outer IN becomes a broadcast semi-join;
    no correlated re-execution."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    heavy = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(F.broadcast(part.where(F.col("p_name").like("small%"))),
              F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 390)
        .select("l_suppkey"))
    return (sup.join(F.broadcast(heavy),
                     F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
            .join(F.broadcast(nation),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .select("s_suppkey", "s_name", "n_name",
                    F.round("s_acctbal", 4).alias("s_acctbal")))


# --------------------------------------------------------------------- Q21
@register("q21_waiting_supplier", sql="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
""")
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 (adapted: "late" = shipped >60 days after order date,
    no receipt/commit dates): suppliers solely responsible for holding
    up failed multi-supplier orders. The EXISTS becomes a left-semi and
    the NOT EXISTS a left-anti join — both on l_orderkey with an
    extra inequality conjunct, which Spark executes as shuffled
    semi/anti hash joins; no per-row subquery re-execution."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    late = (li.join(orders.where(F.col("o_orderstatus") == "F"),
                    F.col("o_orderkey") == F.col("l_orderkey"))
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
            .select("l_orderkey", "l_suppkey"))
    l1 = late.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_suppkey").alias("sk"))
    l2 = li.select(F.col("l_orderkey").alias("ok2"),
                   F.col("l_suppkey").alias("sk2"))
    l3 = late.select(F.col("l_orderkey").alias("ok3"),
                     F.col("l_suppkey").alias("sk3"))
    cand = (l1.join(l2, (F.col("ok2") == F.col("ok"))
                    & (F.col("sk2") != F.col("sk")), "left_semi")
            .join(l3, (F.col("ok3") == F.col("ok"))
                  & (F.col("sk3") != F.col("sk")), "left_anti"))
    return (cand.join(F.broadcast(sup),
                      F.col("s_suppkey") == F.col("sk"))
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait")))


# --------------------------------------------------------------------- Q2
@register("q2_min_balance_supplier", sql="""
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
       ROUND(s.s_acctbal, 4) AS s_acctbal
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p     ON p.p_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE p.p_size = 25 AND p.p_type = 'STANDARD'
  AND s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    WHERE ps2.l_partkey = p.p_partkey)
""")
def q2_min_balance_supplier(spark, sf_dir):
    """TPC-H Q2 (adapted: lineitem's distinct (part, supplier) pairs
    stand in for partsupp, min account balance for min supplycost):
    for each size-25 STANDARD part, the cheapest supplier(s) that ship
    it. The correlated MIN decorrelates into a per-part window minimum
    — one shuffle on partkey, no re-executed subquery."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    pf = part.where((F.col("p_size") == 25)
                    & (F.col("p_type") == "STANDARD"))
    w = W.partitionBy("l_partkey")
    return (ps.join(F.broadcast(sup),
                    F.col("s_suppkey") == F.col("l_suppkey"))
            .withColumn("_mn", F.min("s_acctbal").over(w))
            .where(F.col("s_acctbal") == F.col("_mn"))
            .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
            .select("p_partkey", "p_name", "s_suppkey", "s_name",
                    F.round("s_acctbal", 4).alias("s_acctbal")))


# --------------------------------------------------------------------- Q11
@register("q11_important_parts", sql="""
WITH nat_lines AS (
  SELECT l.l_partkey, l.l_extendedprice
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
)
SELECT l_partkey, ROUND(SUM(l_extendedprice), 4) AS value
FROM nat_lines
GROUP BY l_partkey
HAVING SUM(l_extendedprice) > (
  SELECT SUM(l_extendedprice) * 0.0008 FROM nat_lines)
""")
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 (adapted: shipped extendedprice stands in for
    partsupp stock value): parts representing a significant fraction
    of one nation's shipped value. The HAVING threshold is a scalar
    subquery over the same filtered join — Spark reuses the per-part
    aggregate (one more 1-row reduction) and broadcasts the scalar
    instead of rescanning lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    nat_sup = (sup.join(F.broadcast(
        nation.where(F.col("n_name") == "NATION_3")),
        F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey"))
    per_part = (li.join(F.broadcast(nat_sup),
                        F.col("s_suppkey") == F.col("l_suppkey"))
                .groupBy("l_partkey")
                .agg(F.sum("l_extendedprice").alias("_v")))
    thresh = per_part.agg((F.sum("_v") * 0.0008).alias("_t"))
    return (per_part.join(F.broadcast(thresh), F.col("_v") > F.col("_t"))
            .select("l_partkey", F.round("_v", 4).alias("value")))
