"""TPC-H Q2/Q9/Q11/Q16 over a DERIVED partsupp surrogate.

The driver testdata ships no ``partsupp`` table, which previously made
these four queries infeasible (COVERAGE.md). dbgen's convention is that
each part has exactly 4 suppliers at deterministic key offsets — so the
relation is DERIVABLE from part × supplier with integer-exact formulas
both engines reproduce bit-for-bit:

    ps_suppkey    = (p_partkey + i * (S // 4)) % S          for i in 0..3
    ps_availqty   = (p_partkey * 7 + i * 11) % 9999 + 1
    ps_supplycost = ((p_partkey * 13 + i * 17) % 100000) / 100.0 + 1.0

(S = supplier count; all operands are non-negative integers, and the
final /100.0 of an integer is correctly-rounded IEEE in both Spark and
DuckDB, so the doubles are identical.) The Spark side generates the
rows with one ``explode`` over the part scan — partsupp is never
materialized or shuffled on its own; it is 4× the part dim, i.e. still
a dim. The DuckDB oracles build the same relation in a CTE, so all
four queries get hard value-hash verification.

Schema deltas vs spec (testdata has no ps_comment/s_address/p_mfgr):
Q2 returns the available supplier/part columns; Q16's
"customer complaints" supplier exclusion uses s_acctbal < 0 as the
deterministic stand-in predicate; Q9's p_name LIKE filter uses the
testdata's color words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.joins import broadcast_if_small
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# The shared CTE for every oracle (DuckDB). `i` comes from range(4);
# s_cnt is a one-row scalar — the same values the Spark builder computes.
_PS_CTE = """
  s_cnt AS (SELECT CAST(count(*) AS BIGINT) AS s FROM supplier),
  partsupp AS (
    SELECT p_partkey AS ps_partkey,
           (p_partkey + i * (s // 4)) % s AS ps_suppkey,
           CAST((p_partkey * 7 + i * 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
           ((p_partkey * 13 + i * 17) % 100000) / 100.0 + 1.0 AS ps_supplycost
    FROM part CROSS JOIN s_cnt CROSS JOIN (SELECT unnest(range(4)) AS i)
  )"""


# supplier-count scalar per (sparkContext id, sf_dir): the count is a
# driver action, and rebuilding a partsupp-backed query used to re-run it
# on every invocation — once per session+dataset is enough. Keyed on the
# context id (not the session object) so a restarted session re-probes.
_S_CNT_CACHE: dict[tuple[int, str], int] = {}


def _supplier_count(spark: SparkSession, sf_dir: str) -> int:
    key = (id(spark.sparkContext), sf_dir)
    if key not in _S_CNT_CACHE:
        _S_CNT_CACHE[key] = _t(spark, sf_dir, "supplier").count()
    return _S_CNT_CACHE[key]


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp as a 4-rows-per-part projection of the part dim (one
    explode, no shuffle; the supplier count is a one-row scalar)."""
    s = _supplier_count(spark, sf_dir)
    p = _t(spark, sf_dir, "part")
    i = F.col("i")
    return p.select(
        F.col("p_partkey"),
        F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("i"),
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") + i * (s // 4)) % s).alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + i * 11) % 9999 + 1).cast("long").alias("ps_availqty"),
        (((F.col("p_partkey") * 13 + i * 17) % 100000) / 100.0 + 1.0).alias(
            "ps_supplycost"
        ),
    )


@query(
    "tpch_q2_min_cost_supplier",
    f"""WITH {_PS_CTE}
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           ps.ps_supplycost
    FROM part p
    JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size <= 15 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 — minimum-cost supplier per part within a region.

    Spark-first: the correlated min subquery is a window min over
    (ps_partkey) on the region-filtered join — one pass, no
    re-aggregation join. The part predicate is applied BELOW the window
    (the per-part regional min is independent of part attributes, so
    restricting to qualifying parts first is semantics-preserving):
    only ~2% of partsupp rows pay the window shuffle, which is what made
    the 10× probe drop from 8.0 s to sub-second. partsupp and every dim
    broadcast; no fact shuffle at all (partsupp IS a dim here)."""
    from pyspark.sql import Window

    ps = derived_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro = (
        ps.join(broadcast_if_small(p), ps.ps_partkey == p.p_partkey)
        .join(broadcast_if_small(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    best = euro.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        best.select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost"
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_type_profit",
    f"""WITH {_PS_CTE}
    SELECT n.n_name AS nation,
           CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - ps.ps_supplycost * l.l_quantity), 2) AS sum_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, o_year""",
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 — profit by nation and order year for a part family.

    One fact shuffle (lineitem⋈orders on orderkey); partsupp, part,
    supplier, nation all broadcast. The (partkey, suppkey) partsupp join
    keys resolve against the derived relation exactly like a real
    partsupp dim."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ps = derived_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(
            broadcast_if_small(ps),
            (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey),
        )
        .join(broadcast_if_small(p), l.l_partkey == p.p_partkey)
        .join(broadcast_if_small(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("ps_supplycost") * F.col("l_quantity")
                ),
                2,
            ).alias("sum_profit")
        )
    )


@query(
    "tpch_q11_important_stock",
    f"""WITH {_PS_CTE}
    SELECT ps.ps_partkey,
           round(sum(ps.ps_supplycost * ps.ps_availqty), 2) AS stock_value
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY ps.ps_partkey
    HAVING sum(ps.ps_supplycost * ps.ps_availqty) > (
      SELECT sum(ps2.ps_supplycost * ps2.ps_availqty) * 0.001
      FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      WHERE n2.n_name = 'NATION_7')""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 — parts whose stock value in one nation exceeds a
    fraction of that nation's total (testdata nations are NATION_0..24). The per-part aggregate is computed
    once and reused for the threshold via a 1-row cross join (the scalar
    subquery), not a second scan."""
    ps = derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    base = (
        ps.join(broadcast_if_small(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("raw_value"))
    )
    total = base.agg((F.sum("raw_value") * 0.001).alias("threshold"))
    return (
        base.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("ps_partkey", F.round("raw_value", 2).alias("stock_value"))
    )


@query(
    "tpch_q16_parts_supplier_relationship",
    f"""WITH {_PS_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#9'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size""",
)
def tpch_q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 — distinct supplier counts per (brand, type, size)
    excluding flagged suppliers (testdata has no s_comment, so the
    deterministic stand-in flag is s_acctbal < 0). The exclusion is a
    broadcast anti join; the distinct count is the only shuffle."""
    ps = derived_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(broadcast_if_small(flagged), "ps_suppkey", "left_anti")
        .join(broadcast_if_small(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )
