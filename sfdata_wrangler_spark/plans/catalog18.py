"""Catalog wave 18 (round 4): the remaining TPC-H relational shapes,
completing the 22-query family started in rounds 2-3 (a0≈Q1, q2, q5,
q7, q13, q14, q18, q19, q21, q22 already declared). The testdata
schema has no partsupp table and no commit/receipt dates, so Q4, Q9,
Q11, Q12, Q16, Q17, Q20 keep their SHAPE (the join/subquery/agg
pattern that matters for the planner) with adapted predicates, same
as round 3 did for Q21/Q22.

Determinism rules follow plans/catalog.py: money sums accumulate
exact integer ten-thousandths (_msum2), top-N orders by the exact
BIGINT sum with a unique-key tiebreak, ratios divide two exact
BIGINTs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.metrics import portable_round as _pr
from .catalog import _msum2, _msum2_sql, _register, _t

# exact integer ten-thousandths of a money expression, for ordering
# and thresholding before the final 2-dp conversion
def _tt(expr):
    return F.sum(F.floor(expr * 10000 + 0.5).cast("long"))


_TT_SQL = "sum(CAST(floor(({e}) * 10000 + 0.5) AS BIGINT))"


_Q3_ORACLE = """
WITH agg AS (
  SELECT l.l_orderkey,
         {tt} AS rev_tt,
         o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST((floor((rev_tt + 50) / 100.0) / 100.0) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM agg
ORDER BY rev_tt DESC, l_orderkey
LIMIT 10
""".format(tt=_TT_SQL.format(e="l.l_extendedprice * (1 - l.l_discount)"))


@_register("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join, per-order revenue
    rollup, deterministic top-10. The order-by key is the exact
    BIGINT ten-thousandths sum (ties broken by orderkey), so the
    LIMIT selects the same rows in every engine. customer filters
    early (predicate above the scan); the two fact joins shuffle on
    their keys."""
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    agg = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_tt(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_tt"))
    )
    return (
        agg.orderBy(F.col("rev_tt").desc(), "l_orderkey")
        .limit(10)
        .select(
            F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
            (F.floor((F.col("rev_tt") + 50) / 100.0) / 100.0)
            .cast("double")
            .alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


_Q4_ORACLE = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o.o_orderpriority
"""


@_register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS rewritten as a left-semi
    join whose condition references both sides (shipdate vs the
    order's own date + 90 days — the late-shipment proxy for the
    missing commit/receipt columns). The semi join deduplicates
    multi-line orders before the count, exactly what EXISTS
    semantics require."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


_Q6_ORACLE = """
SELECT CAST((floor(({tt} + 50) / 100.0) / 100.0) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""".format(tt=_TT_SQL.format(e="l_extendedprice * l_discount"))


@_register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side aggregation — every predicate
    (date range, discount band, quantity cap) pushes into the parquet
    scan, no join, no shuffle beyond the final 1-row combine. The
    plan to beat at 100 TB is scan + partial agg + single exchange;
    anything else is a bug."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _msum2(F.col("l_extendedprice") * F.col("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


_Q8_ORACLE = """
WITH j AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5)
              AS BIGINT) AS vol_tt,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                            THEN vol_tt ELSE 0 END) AS DOUBLE)
                  / CAST(sum(vol_tt) AS DOUBLE), 6) AS DOUBLE) AS mkt_share,
       CAST(count(*) AS BIGINT) AS n_rows
FROM j
GROUP BY o_year
"""


@_register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the deepest join tree in the family — 7 joins,
    nation aliased twice, region reached only through the customer
    side — feeding a conditional-share ratio per year. Dims
    (supplier, nation, region, part-filtered) broadcast; orders and
    customer stay shuffle joins (fact-sized at real scale). Share =
    ratio of two exact BIGINT sums, rounded once."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_reg") == reg.r_regionkey)
    )
    vol_tt = F.floor(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000 + 0.5
    ).cast("long")
    return (
        j.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol_tt.alias("vol_tt"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            _pr(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("vol_tt"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.sum("vol_tt").cast("double"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


_Q9_ORACLE = """
WITH j AS (
  SELECT sn.n_name AS nation,
         CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity)
                    * 10000 + 0.5) AS BIGINT) AS amount_tt
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE p.p_name LIKE '%red%'
)
SELECT nation, o_year,
       CAST((floor((sum(amount_tt) + 50) / 100.0) / 100.0) AS DOUBLE)
         AS sum_profit,
       CAST(count(*) AS BIGINT) AS n_rows
FROM j
GROUP BY nation, o_year
"""


@_register("q9_product_type_profit", _Q9_ORACLE)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part dim over a 5-way join,
    profit per (nation, year). The partsupp supply cost is absent
    from this schema, so cost = 10% of retail price × quantity — the
    same fact⨝dims⨝orders profit pattern with a deterministic IEEE
    expression. Amounts accumulate as exact ten-thousandths (they can
    be negative — floor-based half-up rounds identically in both
    engines either side of zero... because floor(x+0.5) is total on
    the reals, not symmetric-away-from-zero)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.floor(amount * 10000 + 0.5).cast("long").alias("amount_tt"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.floor((F.sum("amount_tt") + 50) / 100.0) / 100.0)
            .cast("double")
            .alias("sum_profit"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


_Q10_ORACLE = """
WITH agg AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         {tt} AS rev_tt
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_acctbal, n_name,
       CAST((floor((rev_tt + 50) / 100.0) / 100.0) AS DOUBLE) AS revenue
FROM agg
ORDER BY rev_tt DESC, c_custkey
LIMIT 20
""".format(tt=_TT_SQL.format(e="l.l_extendedprice * (1 - l.l_discount)"))


@_register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter slice of returned lineitems, revenue
    per customer with nation decoration, deterministic top-20 (exact
    BIGINT ordering key, custkey tiebreak). The returnflag filter
    rides down to the lineitem scan; nation broadcasts; the
    customer⨝orders⨝lineitem chain shuffles on its keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    agg = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_tt(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_tt"))
    )
    return (
        agg.orderBy(F.col("rev_tt").desc(), "c_custkey")
        .limit(20)
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            "c_acctbal",
            "n_name",
            (F.floor((F.col("rev_tt") + 50) / 100.0) / 100.0)
            .cast("double")
            .alias("revenue"),
        )
    )


_Q11_ORACLE = """
WITH val AS (
  SELECT l.l_partkey,
         {tt} AS value_tt
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
  GROUP BY l.l_partkey
)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST((floor((value_tt + 50) / 100.0) / 100.0) AS DOUBLE) AS value
FROM val
WHERE CAST(value_tt AS DOUBLE)
      > 0.001 * (SELECT CAST(sum(value_tt) AS DOUBLE) FROM val)
""".format(tt=_TT_SQL.format(e="l.l_extendedprice * (1 - l.l_discount)"))


@_register("q11_important_stock", _Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group-value vs global-fraction scalar
    subquery — the same aggregation consumed twice (per-part and
    grand total), with the scalar side broadcast back. The value
    table is computed once and reused (Spark reuses the exchange
    under the self-referencing plan); the threshold compare happens
    on exact BIGINT sums cast to double identically in both
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_13")
    )
    val = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(_tt(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value_tt"))
    )
    total = val.agg(F.sum("value_tt").cast("double").alias("total_tt"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value_tt").cast("double") > 0.001 * F.col("total_tt"))
        .select(
            F.col("l_partkey").cast("bigint").alias("l_partkey"),
            (F.floor((F.col("value_tt") + 50) / 100.0) / 100.0)
            .cast("double")
            .alias("value"),
        )
    )


_Q12_ORACLE = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
"""


@_register("q12_shipping_modes", _Q12_ORACLE)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment join (post-join non-equi
    predicate against the other side's column) with paired
    conditional counts per category — returnflag stands in for the
    absent shipmode. Both counts come out of one aggregation pass;
    integer counts need no rounding discipline."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         {tt} AS rev_tt
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       CAST((floor((r.rev_tt + 50) / 100.0) / 100.0) AS DOUBLE)
         AS total_revenue
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.rev_tt = (SELECT max(rev_tt) FROM rev)
""".format(tt=_TT_SQL.format(e="l_extendedprice * (1 - l_discount)"))


@_register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a derived revenue view consumed twice — once
    for the scalar max, once to select the argmax rows (keeping
    ties, per the spec). Exact BIGINT revenue makes the max and the
    equality both deterministic. The view is quarter-filtered at the
    scan; the scalar side is one broadcast row."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        _tt(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_tt")
    )
    top = rev.agg(F.max("rev_tt").alias("max_tt"))
    sup = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("rev_tt") == F.col("max_tt"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            (F.floor((F.col("rev_tt") + 50) / 100.0) / 100.0)
            .cast("double")
            .alias("total_revenue"),
        )
    )


_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@_register("q16_supplier_relationship", _Q16_ORACLE)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT-IN exclusion subquery (anti join against
    a filtered dim — negative-balance suppliers stand in for the
    complaints LIKE) over a part-attribute slice, then COUNT
    DISTINCT suppliers per (brand, type, size). The distinct-agg
    dedups (partkey-attrs, suppkey) pairs before counting —
    lineitem's repeated pairs collapse in the partial phase."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad_sup = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad_sup, li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("int").alias("p_size"),
            "supplier_cnt",
        )
    )


_Q17_ORACLE = """
WITH thresh AS (
  SELECT l_partkey,
         0.2 * (CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                / CAST(count(*) AS DOUBLE)) AS qty_cut
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST((floor((sum(CAST(floor(l.l_extendedprice * 10000 + 0.5)
                         AS BIGINT)) + 50) / 100.0) / 100.0) / 7.0
       AS DOUBLE) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN thresh t ON l.l_partkey = t.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_size < 15
  AND l.l_quantity < t.qty_cut
"""


@_register("q17_small_quantity_revenue", _Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average subquery
    (decorrelated into a grouped threshold table joined back on
    partkey). Quantities are integral doubles, so sum-as-BIGINT /
    count is the bit-exact mean in both engines, and the 0.2× cut
    compares identically. Revenue accumulates exact ten-thousandths,
    divided by 7.0 once at the end."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("bigint")).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
        ).alias("qty_cut")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresh, li.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
    )
    return j.agg(
        (
            (
                F.floor(
                    (F.sum(F.floor(F.col("l_extendedprice") * 10000 + 0.5).cast("long")) + 50)
                    / 100.0
                )
                / 100.0
            )
            / 7.0
        )
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


_Q20_ORACLE = """
WITH heavy AS (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 300
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
  AND n.n_regionkey = 2
"""


@_register("q20_part_promotion", _Q20_ORACLE)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN chain — parts filtered by name,
    rolled up to suppliers who moved enough volume (the availqty >
    half-shipped proxy, partsupp being absent), used as a semi-join
    filter on the supplier dim, narrowed to one region. The heavy-key
    set is aggregate-sized → broadcast semi join at any scale."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("__q"))
        .where(F.col("__q") > 300)
        .select("l_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            "n_name",
        )
    )
