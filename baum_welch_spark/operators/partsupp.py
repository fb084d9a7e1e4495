"""Derived PARTSUPP + the five partsupp TPC-H shapes (q2/q9/q11/q16/q20).

The driver's testdata ships no partsupp table (SURVEY §8.2i), which blocked
five TPC-H queries through r11. This module closes the gap WITHOUT a
fixture: partsupp is a DETERMINISTIC PURE FUNCTION of the part and supplier
tables both engines can evaluate identically —

  * min(4, S) suppliers per part (dbgen's cardinality capped by the
    supplier count S), spread by a stride of ``S div 4`` floored at 1 —
    collision-free for EVERY S: for S >= 4, 3 * floor(S/4) < S so the four
    offsets are distinct mod S; for S < 4 the fanout itself is capped at S
    with stride 1 (offsets 0..S-1). (ps_partkey, ps_suppkey) is therefore
    always a key. Keys are 0-based to match the testdata's key domains;
  * ``ps_availqty``   = 1 + (ps_partkey*7 + ps_suppkey*11) % 9999
  * ``ps_supplycost`` = 1.0 + ((ps_partkey*13 + ps_suppkey*17) % 99900)/100.0

All arithmetic is integer except one final divide-by-100.0, so Spark and
DuckDB produce bit-identical doubles and the five faces stay in the exact
(hash-match) class. Monetary comparisons that TPC-H specifies against a
floating threshold (q11's HAVING) are done in EXACT INTEGER CENTS — the
supplycost's integer numerator is recovered with round(x*100) — so no
summation-order noise can flip a boundary row.

Scale posture: the derivation is a shuffle-free 4x fanout projection of
``part`` with two broadcast one-row scalars; at 100 TB partsupp is
generated-on-read (never materialized), and each query joins it exactly the
way a stored partsupp would join — hash on ps_partkey / ps_suppkey, with
the supplier/nation/region dimension legs broadcast.

Column adaptations vs pristine TPC-H (TESTDATA divergences, same precedent
as q4/q12/q21): q2 output omits p_mfgr/s_address/s_phone/s_comment (absent
columns); q16's "customer complaints" supplier exclusion becomes the
negative-account-balance suppliers; q20's 'forest' color prefix becomes the
testdata's adjective vocabulary.

Reference: the reference engine has no relational layer at all (SURVEY §2
"absent" categories); these faces extend the §2.7 relational surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared WITH-prefix for the five oracles (trailing comma — callers append)
PARTSUPP_CTE = """
WITH scnt AS (SELECT count(*) AS s_total FROM supplier),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + i.i * greatest(s.s_total // 4, 1)) % s.s_total AS ps_suppkey,
         1 + (p_partkey * 7 + ((p_partkey + i.i * greatest(s.s_total // 4, 1)) % s.s_total) * 11) % 9999 AS ps_availqty,
         1.0 + ((p_partkey * 13 + ((p_partkey + i.i * greatest(s.s_total // 4, 1)) % s.s_total) * 17) % 99900) / 100.0 AS ps_supplycost
  FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) i(i) CROSS JOIN scnt s
  WHERE i.i < s.s_total
),
"""


def derive_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """The derived partsupp as a DataFrame: ``(ps_partkey, ps_suppkey,
    ps_availqty, ps_supplycost)``. Fully lazy — the supplier count rides in
    as a broadcast one-row aggregate, not a driver collect."""
    i_df = part.sparkSession.range(4).select(F.col("id").cast("int").alias("i"))
    s_cnt = supplier.agg(F.count(F.lit(1)).alias("s_total"))
    stride = F.greatest(F.expr("s_total div 4"), F.lit(1).cast("bigint"))
    suppkey = (F.col("p_partkey") + F.col("i") * stride) % F.col("s_total")
    return (
        part.select("p_partkey")
        .crossJoin(F.broadcast(i_df))
        .crossJoin(F.broadcast(s_cnt))
        .filter(F.col("i") < F.col("s_total"))  # S < 4: cap fanout at S
        .withColumn("ps_suppkey", suppkey)
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            "ps_suppkey",
            (
                F.lit(1)
                + (F.col("p_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999
            ).alias("ps_availqty"),
            (
                F.lit(1.0)
                + ((F.col("p_partkey") * 13 + F.col("ps_suppkey") * 17) % 99900)
                / F.lit(100.0)
            ).alias("ps_supplycost"),
        )
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    size: int = 15,
    region_name: str = "EUROPE",
) -> DataFrame:
    """TPC-H Q2 shape: for each part of a given size, the EUROPE
    supplier(s) offering it at that part's REGION-MINIMUM supply cost.
    (Size-only part filter — the testdata's 6-value p_type plus 4-of-S
    derived suppliers makes size+type near-empty at small SF; a TESTDATA
    adaptation like q4/q12's.)

    Spark plan: the region-side partsupp (partsupp ⋈ supplier ⋈ nation ⋈
    region, dimension legs broadcast) is computed once; the per-part min
    cost is a groupBy over it; the equality join back on (partkey, cost)
    is exact because both sides carry the identical derived double.
    ORDER BY is a total order (s_acctbal DESC, n_name, s_name, p_partkey),
    so LIMIT 100 is deterministic."""
    ps = derive_partsupp(part, supplier)
    eu = (
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == region.r_regionkey,
        )
    )
    min_cost = eu.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    wanted = part.filter(F.col("p_size") == size).select("p_partkey")
    return (
        eu.join(wanted, eu.ps_partkey == wanted.p_partkey)
        .join(
            min_cost.withColumnRenamed("ps_partkey", "mc_partkey"),
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = PARTSUPP_CTE + """
eu AS (
  SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
),
mc AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM eu GROUP BY 1)
SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, eu.ps_supplycost
FROM eu
JOIN part p ON p.p_partkey = eu.ps_partkey AND p.p_size = 15
JOIN mc ON mc.ps_partkey = eu.ps_partkey AND eu.ps_supplycost = mc.min_cost
ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
LIMIT 100
"""


def q9_product_profit(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    name_like: str = "%gear%",
) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus supply cost) per supplier
    nation per order year, over parts whose name matches a pattern.

    The lineitem ⋈ partsupp leg joins on BOTH (l_partkey, l_suppkey) —
    only lines whose supplier actually carries the part contribute, the
    Q9 semantics. Spark plan: lineitem shuffles once on the composite key;
    part/supplier/nation/orders dimension legs broadcast where small.

    Exactness: like q11, the profit sum is computed in EXACT INTEGER
    1e-4-currency units (every input is a 2-dp decimal: extendedprice and
    supplycost recover their integer cents via round(x*100), the discount
    its integer percent) so the BIGINT sum is order-independent and no
    final rounding is involved — the cancellation-prone revenue-minus-cost
    sum would otherwise sit in the documented half-even/half-up divergence
    class near 2-dp boundaries."""
    ps = derive_partsupp(part, supplier)
    ep_cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    pct = F.round((1 - F.col("l_discount")) * 100).cast("bigint")
    sc_cents = F.round(F.col("ps_supplycost") * 100).cast("bigint")
    qty = F.col("l_quantity").cast("bigint")
    amount_e4 = ep_cents * pct - sc_cents * qty * 100
    return (
        lineitem.join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like(name_like))),
            F.col("l_partkey") == part.p_partkey,
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        # decimal(38,0) accumulator (ADVICE r12): amount_e4 is ~1e9 per row,
        # so a LongType sum would silently wrap around ~9e9 rows of one
        # (nation, year) group while the oracle's 128-bit sum errors on its
        # ::BIGINT cast — an asymmetric wrong-answer mode. The decimal sum
        # is overflow-safe to ~1e29 rows; the final /10000.0 stays the same
        # double division both engines perform.
        .agg((F.sum(amount_e4.cast("decimal(38,0)")) / F.lit(10000.0)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = PARTSUPP_CTE + """
profit AS (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
           - CAST(round(ps.ps_supplycost * 100) AS BIGINT)
             * CAST(l.l_quantity AS BIGINT) * 100 AS amount_e4
  FROM lineitem l
  JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT nation, o_year::BIGINT AS o_year, sum(amount_e4)::BIGINT / 10000.0 AS sum_profit
FROM profit GROUP BY nation, o_year ORDER BY nation, o_year DESC
"""


def q11_important_stock(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_7",
    fraction_bp: int = 1,
) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one nation's suppliers
    exceeds ``fraction_bp`` basis points (1/10000) of that nation's total.

    The HAVING threshold is evaluated in EXACT INTEGER CENTS (BIGINT):
    ``sum(cents*qty) * 10000 > total_cents * fraction_bp`` — no float
    summation order can flip a boundary row, in either engine. The output
    value is the cents sum divided by 100.0 (the identical double both
    engines derive)."""
    ps = derive_partsupp(part, supplier)
    cents = F.round(F.col("ps_supplycost") * 100).cast("bigint")
    nat = ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey).join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == nation.n_nationkey,
    )
    # per-part sums are 4 rows by construction (the derived-partsupp
    # fanout) — BIGINT-safe at any SF; the GRAND total scales with part
    # count, so it accumulates in decimal(38,0) like q9's profit sum
    # (a LongType wrap near ~9e18 cents would silently flip the HAVING
    # while the oracle's 128-bit sum errors on its BIGINT cast)
    per_part = nat.groupBy("ps_partkey").agg(
        F.sum(cents * F.col("ps_availqty")).alias("value_cents")
    )
    total = per_part.agg(
        F.sum(F.col("value_cents").cast("decimal(38,0)")).alias("total_cents")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents") * fraction_bp)
        .select(
            "ps_partkey",
            (F.col("value_cents") / F.lit(100.0)).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


Q11_SQL = PARTSUPP_CTE + """
nat AS (
  SELECT ps.ps_partkey,
         CAST(round(ps.ps_supplycost * 100) AS BIGINT) * ps.ps_availqty AS cents
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_7'
),
per_part AS (SELECT ps_partkey, sum(cents)::BIGINT AS value_cents FROM nat GROUP BY 1),
total AS (SELECT sum(value_cents)::BIGINT AS total_cents FROM per_part)
SELECT ps_partkey, value_cents / 100.0 AS value
FROM per_part CROSS JOIN total
WHERE value_cents * 10000 > total_cents * 1
ORDER BY value DESC, ps_partkey
"""


def q16_parts_supplier_cnt(
    part: DataFrame,
    supplier: DataFrame,
    brand_not: str = "Brand#4",
    type_not_prefix: str = "MEDIUM",
    sizes: tuple[int, ...] = (1, 4, 9, 14, 19, 23, 36, 45),
) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    bucket, excluding one brand, one type prefix, and the bad-standing
    suppliers (the testdata has no s_comment, so the 'Customer Complaints'
    exclusion becomes the negative-account-balance suppliers — a TESTDATA
    adaptation, documented in the module docstring).

    Spark plan: the supplier exclusion is a broadcast LEFT ANTI join on
    the key-only bad-supplier frame; countDistinct shuffles once on the
    (brand, type, size) grouping key."""
    ps = derive_partsupp(part, supplier)
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != brand_not)
                    & ~F.col("p_type").startswith(type_not_prefix)
                    & F.col("p_size").isin(*sizes)
                ).select("p_partkey", "p_brand", "p_type", "p_size")
            ),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad),
            ps.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = PARTSUPP_CTE + """
filtered AS (
  SELECT p.p_brand, p.p_type, p.p_size, ps.ps_suppkey
  FROM partsupp ps
  JOIN part p ON p.p_partkey = ps.ps_partkey
  WHERE p.p_brand <> 'Brand#4'
    AND p.p_type NOT LIKE 'MEDIUM%'
    AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
FROM filtered
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_promotion_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "small%",
    year: int = 1996,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding EXCESS stock of a name-prefixed
    part family — availqty above half the quantity they shipped of that
    part in one year. The quantity side is integer-valued (l_quantity is
    a whole number in this data), so ``0.5 * sum`` is exact and the
    comparison cannot flip cross-engine. (TESTDATA adaptation: the
    single-nation leg is dropped — the derived partsupp gives each part 4
    of S suppliers, so one 1-of-25 nation's intersection with the excess
    set is empty at most SFs; the semi-join CHAIN, Q20's actual shape, is
    unchanged.)

    Spark plan: the shipped-quantity aggregate shuffles lineitem once on
    (l_partkey, l_suppkey) AFTER the year + part-family filters prune it;
    the partsupp side joins that aggregate by the same composite key, then
    a semi-join reduces suppliers. No correlated subquery needed — the
    scalar-per-(part,supplier) is just a groupBy."""
    ps = derive_partsupp(part, supplier)
    fam = part.filter(F.col("p_name").like(name_prefix)).select("p_partkey")
    shipped = (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(F.broadcast(fam), F.col("l_partkey") == fam.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    excess = ps.join(
        shipped,
        (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
    ).filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
    return (
        supplier.join(
            excess.select("ps_suppkey").distinct(),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = PARTSUPP_CTE + """
fam AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem JOIN fam ON fam.p_partkey = lineitem.l_partkey
  WHERE year(l_shipdate) = 1996
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN shipped sh ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty > 0.5 * sh.qty
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (SELECT ps_suppkey FROM excess)
ORDER BY s.s_name
"""
