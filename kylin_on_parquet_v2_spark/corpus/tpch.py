"""TPC-H-shaped core SQL surface: scan, filter, joins, aggregate, sort/limit.

Reference corpus parity: ``sql/`` (108 base queries), ``sql_join/``,
``sql_orderby/``, ``sql_limit/`` — SURVEY.md §2.1-2.4, §2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kylin_on_parquet_v2_spark.corpus.base import views


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filter -> groupBy -> 8 aggregates -> sort."""
    views(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join x2 + filter + agg + topk (sort/limit); small dims broadcast."""
    views(spark, sf_dir)
    cust = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = spark.table("orders").filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("date"))
    li = spark.table("lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake joins (depth 4) + region filter + agg."""
    views(spark, sf_dir)
    li = spark.table("lineitem")
    orders = spark.table("orders")
    cust = spark.table("customer")
    nation = spark.table("nation")
    region = spark.table("region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-only global aggregate (no group)."""
    views(spark, sf_dir)
    li = spark.table("lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


def agg_count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT (reference bitmap measure semantics)."""
    views(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("nd_supp"),
            F.countDistinct("l_partkey").alias("nd_part"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def cross_join_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (no equi keys) — reference JoinPlan.scala:53-54."""
    views(spark, sf_dir)
    region = spark.table("region").select("r_name")
    status = spark.table("lineitem").select("l_linestatus").distinct()
    return region.crossJoin(status).orderBy("r_name", "l_linestatus")


def outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT/RIGHT/FULL outer joins — customers without orders keep NULLs."""
    views(spark, sf_dir)
    cust = spark.table("customer")
    orders = spark.table("orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), adapted to the fixture's
    columns: EXISTS decorrelates to a left-semi join, then count by
    priority. (The fixture has no l_commitdate/l_receiptdate; the late-line
    predicate uses l_shipdate > o_orderdate instead.)"""
    views(spark, sf_dir)
    return spark.sql(
        """
        select o_orderpriority, count(*) as order_count
        from orders
        where o_orderdate >= date '1996-01-01'
          and exists (select 1 from lineitem
                      where l_orderkey = o_orderkey and l_shipdate > o_orderdate)
        group by o_orderpriority
        order by o_orderpriority
        """
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by returned-item revenue — 3-way
    join, filter on the fact, group by customer attributes, top-k."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
        from customer
          join orders on c_custkey = o_custkey
          join lineitem on l_orderkey = o_orderkey
          join nation on c_nationkey = n_nationkey
        where l_returnflag = 'R'
        group by c_custkey, c_name, n_name
        order by revenue desc, c_custkey
        limit 20
        """
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate over a
    join, one output row (the classic CASE-inside-SUM ratio)."""
    views(spark, sf_dir)
    return spark.sql(
        """
        select round(100.0 * sum(case when p_type = 'PROMO'
                                      then l_extendedprice * (1 - l_discount)
                                      else 0.0 end)
                     / sum(l_extendedprice * (1 - l_discount)), 4) as promo_pct
        from lineitem join part on l_partkey = p_partkey
        where l_shipdate >= date '1997-03-01' and l_shipdate < date '1997-04-01'
        """
    )


_Q7_SQL = """
    select n1.n_name as supp_nation, n2.n_name as cust_nation,
           cast(extract(year from l_shipdate) as int) as l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from lineitem
      join supplier on s_suppkey = l_suppkey
      join orders on o_orderkey = l_orderkey
      join customer on c_custkey = o_custkey
      join nation n1 on s_nationkey = n1.n_nationkey
      join nation n2 on c_nationkey = n2.n_nationkey
    where (n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
       or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1')
    group by supp_nation, cust_nation, l_year
    order by supp_nation, cust_nation, l_year
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): the nation dimension joined TWICE
    under different roles (supplier vs customer side), a disjunctive filter
    over the pair, and a group over an extracted year expression. Exercises
    dimension-table aliasing — the same snowflake arm reached through two
    FKs must not collapse into one join."""
    views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


_Q12_SQL = """
    select l_linestatus,
           cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                         then 1 else 0 end) as bigint) as high_line_count,
           cast(sum(case when o_orderpriority not in ('1-URGENT', '2-HIGH')
                         then 1 else 0 end) as bigint) as low_line_count
    from orders join lineitem on o_orderkey = l_orderkey
    where l_shipdate >= date '1996-01-01' and l_shipdate < date '1997-01-01'
    group by l_linestatus
    order by l_linestatus
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority): CASE-inside-SUM pivoted
    counts over a fact-to-fact join with a date range. (The fixture has no
    l_shipmode, so l_linestatus plays the mode column.)"""
    views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


#: Q12's TRUE dual-shipmode form needs l_shipmode / l_commitdate /
#: l_receiptdate, which the driver fixture lacks — they are SYNTHESIZED as
#: deterministic pure functions of existing columns (same definition on
#: both engines, so the oracle compares real dual-mode semantics):
#:   l_shipmode    = 7-way decode of (l_orderkey + l_linenumber) % 7
#:   l_commitdate  = shipdate + ((l_orderkey + l_linenumber) % 61 - 30) days
#:   l_receiptdate = shipdate + (1 + l_partkey % 30) days
#: Only the date-add spelling differs per dialect (Spark date_add vs
#: DuckDB date + int).
_Q12_SHIPMODE_DERIVED = """
    select l_orderkey,
           case cast((l_orderkey + l_linenumber) % 7 as int)
                when 0 then 'REG AIR' when 1 then 'AIR' when 2 then 'RAIL'
                when 3 then 'SHIP' when 4 then 'TRUCK' when 5 then 'MAIL'
                else 'FOB' end as l_shipmode,
           cast(l_shipdate as date) as l_shipdate_d,
           {commit} as l_commitdate,
           {receipt} as l_receiptdate
    from lineitem
"""

_Q12_SHIPMODE_OUTER = """
    select l_shipmode,
           cast(sum(case when o_orderpriority in ('1-URGENT','2-HIGH')
                         then 1 else 0 end) as bigint) as high_line_count,
           cast(sum(case when o_orderpriority not in ('1-URGENT','2-HIGH')
                         then 1 else 0 end) as bigint) as low_line_count
    from orders join li on o_orderkey = l_orderkey
    where l_shipmode in ('MAIL','SHIP')
      and l_commitdate < l_receiptdate
      and l_shipdate_d < l_commitdate
      and l_receiptdate >= date '1997-01-01'
      and l_receiptdate < date '1998-01-01'
    group by l_shipmode
    order by l_shipmode
"""

_Q12_SHIPMODE_SPARK = (
    "with li as ("
    + _Q12_SHIPMODE_DERIVED.format(
        commit="date_add(cast(l_shipdate as date), "
        "cast((l_orderkey + l_linenumber) % 61 - 30 as int))",
        receipt="date_add(cast(l_shipdate as date), cast(1 + l_partkey % 30 as int))",
    )
    + ")"
    + _Q12_SHIPMODE_OUTER
)

_Q12_SHIPMODE_ORACLE = (
    "with li as ("
    + _Q12_SHIPMODE_DERIVED.format(
        commit="cast(l_shipdate as date) + "
        "cast((l_orderkey + l_linenumber) % 61 - 30 as int)",
        receipt="cast(l_shipdate as date) + cast(1 + l_partkey % 30 as int)",
    )
    + ")"
    + _Q12_SHIPMODE_OUTER
)


def q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12, TRUE dual-shipmode form (COVERAGE §2.3a 22/22): the real
    IN ('MAIL','SHIP') mode filter plus the commit/receipt/ship date chain
    (l_commitdate < l_receiptdate AND l_shipdate < l_commitdate AND receipt
    in year), priority pivoted with CASE-inside-SUM — the shape the
    reference's converted Q12 runs (query/src/test resources q12). Mode and
    the two extra dates are deterministic derived columns (see
    _Q12_SHIPMODE_DERIVED); the DuckDB oracle applies the identical
    definitions, so the comparison exercises genuine dual-mode grouping."""
    views(spark, sf_dir)
    return spark.sql(_Q12_SHIPMODE_SPARK)


_Q18_SQL = """
    select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) as total_qty
    from customer
      join orders on c_custkey = o_custkey
      join lineitem on o_orderkey = l_orderkey
    where o_orderkey in (
        select l_orderkey from lineitem
        group by l_orderkey having sum(l_quantity) > 200)
    group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    order by o_totalprice desc, o_orderkey
    limit 20
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN over a grouped HAVING
    subquery on the fact itself (decorrelates to a semi-join against an
    aggregate), then a 3-way join + group + top-k."""
    views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


_Q19_SQL = """
    select round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from lineitem join part on p_partkey = l_partkey
    where (p_brand = 'Brand#12' and p_size between 1 and 15
           and l_quantity between 1 and 11)
       or (p_brand = 'Brand#23' and p_size between 10 and 30
           and l_quantity between 10 and 20)
       or (p_brand = 'Brand#34' and p_size between 20 and 50
           and l_quantity between 20 and 30)
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): a disjunction of conjunctive
    ranges spanning BOTH join sides — the classic test that OR-of-ANDs
    still partially pushes (each disjunct's single-side conjuncts reach the
    scans as derived filters) while the join stays a plain equi-join."""
    views(spark, sf_dir)
    return spark.sql(_Q19_SQL)



_Q8_SQL = """
    select o_year,
           round(sum(case when nation = 'NATION_3' then volume else 0.0 end)
                 / sum(volume), 4) as mkt_share
    from (
        select cast(extract(year from o_orderdate) as int) as o_year,
               l_extendedprice * (1 - l_discount) as volume,
               n2.n_name as nation
        from lineitem
          join supplier on s_suppkey = l_suppkey
          join orders on o_orderkey = l_orderkey
          join customer on c_custkey = o_custkey
          join nation n1 on c_nationkey = n1.n_nationkey
          join region on n1.n_regionkey = r_regionkey
          join nation n2 on s_nationkey = n2.n_nationkey
        where r_name = 'ASIA'
    ) all_nations
    group by o_year
    order by o_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): 6-way snowflake with nation
    joined twice (customer-region gate vs supplier nationality), a derived
    table, and the CASE-share ratio per year."""
    views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


_Q9_SQL = """
    select nation, o_year, round(sum(amount), 2) as sum_profit
    from (
        select n_name as nation,
               cast(extract(year from o_orderdate) as int) as o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity as amount
        from lineitem
          join supplier on s_suppkey = l_suppkey
          join part on p_partkey = l_partkey
          join orders on o_orderkey = l_orderkey
          join nation on s_nationkey = n_nationkey
        where p_name like '%bolt%'
    ) profit
    group by nation, o_year
    order by nation, o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): 5-way join, LIKE-filtered
    part names, profit expression over both join sides, nation x year
    rollup. (No partsupp table in the fixture — supply cost is modeled as
    a retail-price fraction; the join/agg shape is the point.)"""
    views(spark, sf_dir)
    return spark.sql(_Q9_SQL)


_Q13_SQL = """
    select c_count, cast(count(*) as bigint) as custdist
    from (
        select c_custkey, count(o_orderkey) as c_count
        from customer left join orders
          on c_custkey = o_custkey and o_orderpriority <> '1-URGENT'
        group by c_custkey
    ) c_orders
    group by c_count
    order by custdist desc, c_count desc
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): LEFT OUTER join with
    an extra non-key join predicate, then a DOUBLE aggregation — count per
    customer, histogram of those counts. Customers with zero orders survive
    as c_count = 0 (the outer-join semantics the query exists to test)."""
    views(spark, sf_dir)
    return spark.sql(_Q13_SQL)


_Q15_SQL = """
    with revenue as (
        select l_suppkey as supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as total_revenue
        from lineitem
        where l_shipdate >= date '1996-01-01' and l_shipdate < date '1996-04-01'
        group by l_suppkey
    )
    select s_suppkey, s_name, total_revenue
    from supplier join revenue on s_suppkey = supplier_no
    where total_revenue = (select max(total_revenue) from revenue)
    order by s_suppkey
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): a CTE referenced twice — once as the
    join input, once inside a scalar MAX subquery — selecting the argmax
    row(s). Rounding inside the CTE pins the equality comparison to exact
    2-decimal values on both engines."""
    views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


_Q17_SQL = """
    select round(sum(l_extendedprice) / 7.0, 2) as avg_yearly
    from lineitem join part on p_partkey = l_partkey
    where p_brand = 'Brand#23'
      and l_quantity < (
          select 0.2 * avg(l_quantity) from lineitem l2
          where l2.l_partkey = p_partkey)
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): a CORRELATED scalar
    subquery per part (average quantity), decorrelated by both engines into
    an aggregate + join."""
    views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


_Q22_SQL = """
    select c_mktsegment, cast(count(*) as bigint) as numcust,
           round(sum(c_acctbal), 2) as totacctbal
    from customer
    where c_acctbal > (select avg(c_acctbal) from customer
                       where c_acctbal > 0.0)
      and not exists (select 1 from orders where o_custkey = c_custkey)
    group by c_mktsegment
    order by c_mktsegment
"""


def q22_missed_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): an uncorrelated AVG
    scalar subquery as a filter bound plus NOT EXISTS anti-join — customers
    with above-average balances and no orders. (c_mktsegment stands in for
    the phone country code the fixture lacks.)"""
    views(spark, sf_dir)
    return spark.sql(_Q22_SQL)



_Q11_SQL = """
    with v as (
        select l_partkey, sum(l_extendedprice * l_quantity) as val
        from lineitem
          join supplier on l_suppkey = s_suppkey
          join nation on s_nationkey = n_nationkey
        where n_name like 'NATION_1%'
        group by l_partkey
    )
    select l_partkey, round(val, 2) as value
    from v
    where val > (select 1.5 * avg(val) from v)
    order by value desc, l_partkey
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): the same aggregation referenced
    twice — per-part values filtered against a scalar aggregate OF the
    aggregate (scale-free 2.5x-average threshold instead of the fixed
    fraction, since the fixture has no partsupp)."""
    views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


_Q16_SQL = """
    select p_brand, p_type, p_size,
           count(distinct l_suppkey) as supplier_cnt
    from lineitem join part on p_partkey = l_partkey
    where p_brand <> 'Brand#23'
      and p_type not like 'PROMO%'
      and p_size in (1, 5, 9, 15, 20, 25, 30, 35)
      and l_suppkey not in (select s_suppkey from supplier where s_acctbal < 0)
    group by p_brand, p_type, p_size
    order by supplier_cnt desc, p_brand, p_type, p_size
"""


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN over a
    filtered subquery (excluded suppliers), negated LIKE and IN-list dims,
    count distinct per 3-dim group."""
    views(spark, sf_dir)
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
    select s_name, s_suppkey
    from supplier join nation on s_nationkey = n_nationkey
    where n_name like 'NATION_1%'
      and s_suppkey in (
          select l_suppkey from lineitem join part on p_partkey = l_partkey
          where p_name like 'small%'
            and l_shipdate >= date '1996-01-01'
            and l_shipdate < date '1997-01-01'
          group by l_suppkey
          having sum(l_quantity) > 20)
    order by s_name, s_suppkey
"""


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): IN over a joined,
    grouped, HAVING-filtered subquery nested inside a dimension filter."""
    views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
    select s_name, count(*) as numwait
    from supplier
      join lineitem l1 on s_suppkey = l1.l_suppkey
      join orders on o_orderkey = l1.l_orderkey
      join nation on s_nationkey = n_nationkey
    where o_orderstatus = 'F'
      and n_name like 'NATION_1%'
      and l1.l_shipdate > o_orderdate + interval 30 days
      and exists (select 1 from lineitem l2
                  where l2.l_orderkey = l1.l_orderkey
                    and l2.l_suppkey <> l1.l_suppkey)
      and not exists (select 1 from lineitem l3
                      where l3.l_orderkey = l1.l_orderkey
                        and l3.l_suppkey <> l1.l_suppkey
                        and l3.l_shipdate > o_orderdate + interval 30 days)
    group by s_name
    order by numwait desc, s_name
    limit 20
"""


def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS + NOT
    EXISTS self-joins on the fact, both correlated through the outer order
    AND its date — the hardest decorrelation in the TPC-H suite. (Late =
    shipped >60 days after the order date; the fixture has no
    commit/receipt dates.)"""
    views(spark, sf_dir)
    return spark.sql(_Q21_SQL)



_Q2_SQL = """
    with ps as (
        select l_partkey as ps_partkey, l_suppkey as ps_suppkey,
               min(l_extendedprice) as ps_supplycost
        from lineitem
        group by 1, 2
    )
    select s_acctbal, s_name, n_name, p_partkey, p_brand
    from part
      join ps on p_partkey = ps_partkey
      join supplier on s_suppkey = ps_suppkey
      join nation on s_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
    where p_size = 15 and p_type = 'STANDARD' and r_name = 'ASIA'
      and ps_supplycost = (
          select min(ps2.ps_supplycost)
          from ps ps2
            join supplier s2 on s2.s_suppkey = ps2.ps_suppkey
            join nation n2 on s2.s_nationkey = n2.n_nationkey
            join region r2 on n2.n_regionkey = r2.r_regionkey
          where ps2.ps_partkey = p_partkey and r2.r_name = 'ASIA')
    order by s_acctbal desc, n_name, s_name, p_partkey
    limit 10
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): a CORRELATED scalar MIN
    subquery re-traversing the same 4-way join as the outer query, argmin
    row selection by equality against it. The fixture has no partsupp, so
    a CTE derives (part, supplier, min price) from lineitem and is
    referenced both outside and inside the correlation — exact decimal
    min, no division, so the argmin ties identically on every engine."""
    views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_relationship": q16_supplier_relationship,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_suppliers_waiting": q21_suppliers_waiting,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q22_missed_opportunity": q22_missed_opportunity,
    "q7_volume_shipping": q7_volume_shipping,
    "q12_priority_lines": q12_priority_lines,
    "q12_shipmode": q12_shipmode,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q4_order_priority": q4_order_priority,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_nation_revenue": q5_nation_revenue,
    "q6_revenue_change": q6_revenue_change,
    "agg_count_distinct_exact": agg_count_distinct_exact,
    "cross_join_small": cross_join_small,
    "outer_join_agg": outer_join_agg,
}

ORACLES = {
    "q2_min_cost_supplier": _Q2_SQL,
    "q11_important_parts": _Q11_SQL,
    "q16_supplier_relationship": _Q16_SQL,
    "q20_potential_promotion": _Q20_SQL,
    "q21_suppliers_waiting": _Q21_SQL,
    "q8_market_share": _Q8_SQL,
    "q9_product_profit": _Q9_SQL,
    "q13_customer_distribution": _Q13_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q17_small_quantity": _Q17_SQL,
    "q22_missed_opportunity": _Q22_SQL,
    "q7_volume_shipping": _Q7_SQL,
    "q12_priority_lines": _Q12_SQL,
    "q12_shipmode": _Q12_SHIPMODE_ORACLE,
    "q18_large_orders": _Q18_SQL,
    "q19_discounted_revenue": _Q19_SQL,
    "q4_order_priority": """
        select o_orderpriority, count(*) as order_count
        from orders
        where o_orderdate >= date '1996-01-01'
          and exists (select 1 from lineitem
                      where l_orderkey = o_orderkey and l_shipdate > o_orderdate)
        group by o_orderpriority
        order by o_orderpriority
    """,
    "q10_returned_items": """
        select c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
        from customer
          join orders on c_custkey = o_custkey
          join lineitem on l_orderkey = o_orderkey
          join nation on c_nationkey = n_nationkey
        where l_returnflag = 'R'
        group by c_custkey, c_name, n_name
        order by revenue desc, c_custkey
        limit 20
    """,
    "q14_promo_revenue": """
        select round(100.0 * sum(case when p_type = 'PROMO'
                                      then l_extendedprice * (1 - l_discount)
                                      else 0.0 end)
                     / sum(l_extendedprice * (1 - l_discount)), 4) as promo_pct
        from lineitem join part on l_partkey = p_partkey
        where l_shipdate >= date '1997-03-01' and l_shipdate < date '1997-04-01'
    """,
    "q1_pricing_summary": """
        select l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) as sum_qty,
               round(sum(l_extendedprice), 2) as sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
               round(avg(l_quantity), 2) as avg_qty,
               round(avg(l_extendedprice), 2) as avg_price,
               round(avg(l_discount), 4) as avg_disc,
               count(*) as count_order
        from lineitem
        where l_shipdate <= date '1998-09-02'
        group by l_returnflag, l_linestatus
        order by l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        select l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
        where c_mktsegment = 'BUILDING'
          and o_orderdate < date '1995-03-15'
          and l_shipdate > date '1995-03-15'
        group by l_orderkey, o_orderdate, o_orderpriority
        order by revenue desc, l_orderkey asc
        limit 10
    """,
    "q5_nation_revenue": """
        select n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
        from lineitem
          join orders on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation on c_nationkey = n_nationkey
          join region on n_regionkey = r_regionkey
        where r_name = 'ASIA'
        group by n_name
        order by revenue desc, n_name asc
    """,
    "q6_revenue_change": """
        select round(sum(l_extendedprice * l_discount), 2) as revenue
        from lineitem
        where l_shipdate >= date '1995-01-01'
          and l_shipdate < date '1996-01-01'
          and l_discount between 0.05 and 0.07
          and l_quantity < 24
    """,
    "agg_count_distinct_exact": """
        select l_returnflag,
               count(distinct l_suppkey) as nd_supp,
               count(distinct l_partkey) as nd_part,
               count(*) as n
        from lineitem
        group by l_returnflag
        order by l_returnflag
    """,
    "cross_join_small": """
        select r_name, l_linestatus
        from region
        cross join (select distinct l_linestatus from lineitem) t
        order by r_name, l_linestatus
    """,
    "outer_join_agg": """
        select c_mktsegment,
               count(o_orderkey) as n_orders,
               count(*) as n_rows,
               round(sum(coalesce(o_totalprice, 0.0)), 2) as sum_price
        from customer
          left join orders on c_custkey = o_custkey
        group by c_mktsegment
        order by c_mktsegment
    """,
}
