"""TPC-H queries 2/7/8/9/11/15/16/17/18/20/21 — completing the 22-query
relational surface (SURVEY.md §2.7 joins/aggregations/subqueries).

The driver's star schema has no partsupp table and no
commit/receipt dates, so the queries that need them (q2, q9, q11, q16,
q17, q20, q21) are ADAPTED: the part↔supplier relationship comes from
``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` and q21's
"kept waiting" predicate becomes "only supplier with a returned
('R') line in a multi-supplier order". Every structural shape of the
original is preserved — correlated min/max subquery (q2, q15), scalar
subquery threshold (q11), correlated-average predicate (q17),
double-nested semi-join (q20), EXISTS + NOT EXISTS correlation (q21),
conditional share aggregation (q8), two-sided nation pairing (q7) —
which is what exercises the optimizer; the predicates just target the
columns this dataset has.

Cross-engine rules as in queries.py: integer metrics only
(cents / x100 / x10000 scaling), explicit FLOOR for integer division,
deterministic tie-breaks on every top-k.

Scale notes (100 TB): every dimension side (part 2k, supplier 100,
nation, region) broadcasts; the distinct part↔supplier pairs reduce
map-side before their shuffle; correlated aggregates are expressed as
self-agg + broadcast-back joins, never per-row subqueries; q11/q15's
scalar threshold is a driver-side scalar from an already-reduced agg
(one row), the same shape as tpch_q22.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sjot_spark.queries import _cents, _rev_x10000, _sql_cents, _SQL_REV, load


def _sp_pairs(spark, sf_dir):
    """Distinct part↔supplier pairs from the facts — the dataset's
    partsupp analog. Map-side combine collapses the ~16× duplication
    before the shuffle."""
    return (load(spark, sf_dir, "lineitem")
            .select("l_partkey", "l_suppkey").distinct())


_SQL_SP = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


# --------------------------------------------------------------- q2

def q_tpch_q2(spark, sf_dir):
    """Max-acctbal supplier per qualifying part (correlated-max shape;
    acctbal stands in for the missing ps_supplycost min)."""
    sp = _sp_pairs(spark, sf_dir)
    pa = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 10) & (F.col("p_type") == "SMALL"))
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cand = (
        sp.join(F.broadcast(pa), sp.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), sp.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select("p_partkey", "p_type", "s_name", "n_name",
                _cents("s_acctbal").alias("acctbal_cents"))
    )
    best = cand.groupBy(F.col("p_partkey").alias("bp")) \
        .agg(F.max("acctbal_cents").alias("max_bal"))
    return (
        cand.join(F.broadcast(best),
                  (cand.p_partkey == best.bp)
                  & (cand.acctbal_cents == best.max_bal))
        .select("acctbal_cents", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("acctbal_cents"), "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_TPCH_Q2 = f"""
WITH sp AS ({_SQL_SP}),
cand AS (
  SELECT p_partkey, p_type, s_name, n_name,
         {_sql_cents('s_acctbal')} AS acctbal_cents
  FROM sp
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 10 AND p_type = 'SMALL' AND r_name = 'EUROPE')
SELECT acctbal_cents, s_name, n_name, p_partkey, p_type
FROM cand c
WHERE acctbal_cents = (SELECT MAX(acctbal_cents) FROM cand c2
                       WHERE c2.p_partkey = c.p_partkey)
ORDER BY acctbal_cents DESC, s_name, p_partkey LIMIT 100
"""


# --------------------------------------------------------------- q7

def q_tpch_q7(spark, sf_dir):
    """Volume shipping between two nations, both directions, by year."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    su = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") <= "1997-12-31"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("c_nk"))
        .where(((F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2"))
               | ((F.col("supp_nation") == "NATION_2")
                  & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_x10000()).alias("revenue_x10000"))
    )


ORACLE_TPCH_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       SUM(volume)::BIGINT AS revenue_x10000
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate)::INT AS l_year,
         {_SQL_REV} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
GROUP BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------- q8

def q_tpch_q8(spark, sf_dir):
    """National market share within a region per year. The share is
    reported as the exact integer pair (nation volume, total volume)
    instead of a float ratio — cross-engine FP division is banned."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    su = load(spark, sf_dir, "supplier")
    pa = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    re = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = _rev_x10000()
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .where((F.col("o_orderdate") >= "1996-01-01")
               & (F.col("o_orderdate") <= "1997-12-31"))
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), cu.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(re), F.col("c_rk") == re.r_regionkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n2), su.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                  .otherwise(F.lit(0))).alias("nation_volume_x10000"),
            F.sum(vol).alias("total_volume_x10000"),
        )
    )


ORACLE_TPCH_Q8 = f"""
SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year,
       SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_SQL_REV}
                ELSE 0 END)::BIGINT AS nation_volume_x10000,
       SUM({_SQL_REV})::BIGINT AS total_volume_x10000
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate BETWEEN '1996-01-01' AND '1997-12-31'
GROUP BY 1
"""


# --------------------------------------------------------------- q9

def q_tpch_q9(spark, sf_dir):
    """Profit by supplier nation and year; p_retailprice stands in for
    the missing ps_supplycost. amount = revenue − cost, all x10000."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    su = load(spark, sf_dir, "supplier")
    pa = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    na = load(spark, sf_dir, "nation")
    amount = _rev_x10000() - _cents("p_retailprice") * _cents("l_quantity")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).alias("sum_profit_x10000"))
    )


ORACLE_TPCH_Q9 = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate)::INT AS o_year,
       SUM({_SQL_REV} - {_sql_cents('p_retailprice')}
             * {_sql_cents('l_quantity')})::BIGINT AS sum_profit_x10000
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------- q11

def q_tpch_q11(spark, sf_dir):
    """Important stock: parts whose value (from one nation's suppliers)
    exceeds 1/5000 of the total — scalar-subquery threshold. The
    threshold compare is exact integer math:
    value_cents * 5000 > total_cents."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    val = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents")).first()[0] or 0
    return (
        val.where(F.col("value_cents") * 5000 > F.lit(int(total)))
        .orderBy(F.desc("value_cents"), "l_partkey")
    )


ORACLE_TPCH_Q11 = f"""
WITH val AS (
  SELECT l_partkey,
         SUM({_sql_cents('l_extendedprice')})::BIGINT AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey)
SELECT l_partkey, value_cents FROM val
WHERE value_cents * 5000 > (SELECT SUM(value_cents)::BIGINT FROM val)
ORDER BY value_cents DESC, l_partkey
"""


# --------------------------------------------------------------- q15

def q_tpch_q15(spark, sf_dir):
    """Top supplier(s) by quarter revenue — revenue view + max scalar
    subquery, ties all returned."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    rev = (
        li.where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1996-04-01"))
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_x10000()).alias("total_revenue_x10000"))
    )
    top = rev.agg(F.max("total_revenue_x10000")).first()[0] or 0
    return (
        rev.where(F.col("total_revenue_x10000") == F.lit(int(top)))
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_x10000")
        .orderBy("s_suppkey")
    )


ORACLE_TPCH_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_SQL_REV})::BIGINT AS total_revenue_x10000
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue_x10000
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_x10000 = (SELECT MAX(total_revenue_x10000) FROM rev)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------- q16

def q_tpch_q16(spark, sf_dir):
    """Supplier counts per (brand, type, size), excluding suppliers in
    a NOT-IN subquery (negative-balance suppliers stand in for the
    complaint-comment pattern)."""
    sp = _sp_pairs(spark, sf_dir)
    su = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0) \
        .select("s_suppkey")
    pa = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    return (
        sp.join(F.broadcast(su), sp.l_suppkey == su.s_suppkey, "left_anti")
        .join(F.broadcast(pa), sp.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_TPCH_Q16 = f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ({_SQL_SP}) sp
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------- q17

def q_tpch_q17(spark, sf_dir):
    """Small-quantity revenue: lines with quantity below 20% of the
    part's average — correlated-average predicate, made exact:
    qty < 0.2 * (sum/cnt)  ⇔  qty_x100 * cnt * 5 < sum_x100
    (all positive integers). avg_yearly = FLOOR(sum_cents / 7)."""
    li = load(spark, sf_dir, "lineitem")
    pa = load(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
    fact = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey) \
        .select("l_partkey", _cents("l_quantity").alias("qty_x100"),
                _cents("l_extendedprice").alias("price_cents"))
    stats = fact.groupBy(F.col("l_partkey").alias("sp")) \
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("qty_x100").alias("sum_qty_x100"))
    return (
        fact.join(F.broadcast(stats), fact.l_partkey == stats.sp)
        .where(F.col("qty_x100") * F.col("cnt") * 5 < F.col("sum_qty_x100"))
        .agg(F.floor(F.sum("price_cents") / 7).cast("long")
             .alias("avg_yearly_cents"),
             F.count(F.lit(1)).alias("n_rows"))
    )


ORACLE_TPCH_Q17 = f"""
WITH fact AS (
  SELECT l_partkey, {_sql_cents('l_quantity')} AS qty_x100,
         {_sql_cents('l_extendedprice')} AS price_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
stats AS (
  SELECT l_partkey AS sp, COUNT(*) AS cnt,
         SUM(qty_x100)::BIGINT AS sum_qty_x100
  FROM fact GROUP BY 1)
SELECT FLOOR(SUM(price_cents) / 7)::BIGINT AS avg_yearly_cents,
       COUNT(*) AS n_rows
FROM fact JOIN stats ON l_partkey = sp
WHERE qty_x100 * cnt * 5 < sum_qty_x100
"""


# --------------------------------------------------------------- q18

def q_tpch_q18(spark, sf_dir):
    """Large orders: IN-subquery over a grouped HAVING, top 100."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    big = li.groupBy(F.col("l_orderkey").alias("bk")) \
        .agg(F.sum(_cents("l_quantity")).alias("sum_qty_x100")) \
        .where(F.col("sum_qty_x100") > 25000)
    return (
        o.join(big, o.o_orderkey == F.col("bk"))
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("string").alias("o_orderdate"),
                _cents("o_totalprice").alias("totalprice_cents"),
                "sum_qty_x100")
        .orderBy(F.desc("totalprice_cents"), "o_orderkey")
        .limit(100)
    )


ORACLE_TPCH_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       {_sql_cents('o_totalprice')} AS totalprice_cents, sum_qty_x100
FROM orders
JOIN (SELECT l_orderkey AS bk,
             SUM({_sql_cents('l_quantity')})::BIGINT AS sum_qty_x100
      FROM lineitem GROUP BY 1
      HAVING SUM({_sql_cents('l_quantity')}) > 25000) ON o_orderkey = bk
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice_cents DESC, o_orderkey LIMIT 100
"""


# --------------------------------------------------------------- q20

def q_tpch_q20(spark, sf_dir):
    """Nested semi-join chain: suppliers in one region who shipped more
    than a threshold of any 'red…' part in 1996."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    pa = load(spark, sf_dir, "part").where(F.col("p_name").like("red%")) \
        .select("p_partkey")
    shippers = (
        li.where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1997-01-01"))
        .join(F.broadcast(pa), li.l_partkey == pa.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_cents("l_quantity")).alias("qty_x100"))
        .where(F.col("qty_x100") > 5000)
        .select("l_suppkey").distinct()
    )
    return (
        su.join(shippers, su.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


ORACLE_TPCH_Q20 = f"""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM({_sql_cents('l_quantity')}) > 5000)
AND s_nationkey IN (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
ORDER BY s_suppkey
"""


# --------------------------------------------------------------- q21

def q_tpch_q21(spark, sf_dir):
    """Suppliers at fault: finished multi-supplier orders where this
    supplier returned a line ('R') and no OTHER supplier did —
    correlated EXISTS + NOT EXISTS, the hardest subquery shape.
    Returned-ness stands in for the missing receipt/commit delay."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = li.where(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("k2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = li.where(F.col("l_returnflag") == "R") \
        .select(F.col("l_orderkey").alias("k3"),
                F.col("l_suppkey").alias("s3"))
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(l2, (F.col("l_orderkey") == F.col("k2"))
              & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3"))
              & (F.col("l_suppkey") != F.col("s3")), "left_anti")
        .join(F.broadcast(su), F.col("l_suppkey") == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


ORACLE_TPCH_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R'
  AND n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'AMERICA')
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


TPCH2_QUERIES = {
    "tpch_q2": q_tpch_q2,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
}

TPCH2_ORACLES = {
    "tpch_q2": ORACLE_TPCH_Q2,
    "tpch_q7": ORACLE_TPCH_Q7,
    "tpch_q8": ORACLE_TPCH_Q8,
    "tpch_q9": ORACLE_TPCH_Q9,
    "tpch_q11": ORACLE_TPCH_Q11,
    "tpch_q15": ORACLE_TPCH_Q15,
    "tpch_q16": ORACLE_TPCH_Q16,
    "tpch_q17": ORACLE_TPCH_Q17,
    "tpch_q18": ORACLE_TPCH_Q18,
    "tpch_q20": ORACLE_TPCH_Q20,
    "tpch_q21": ORACLE_TPCH_Q21,
}
