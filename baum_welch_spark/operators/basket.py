"""Market-basket association rules (support / confidence / lift) — the
classic co-occurrence analytics workload (Agrawal/Srikant's Apriori at the
pairwise level), run over the TPC-H-ish schema as order-baskets of part
BRANDS: "orders containing Brand#A also contain Brand#B".

The reference has no relational surface at all (SURVEY §2.5);
beyond-reference §2.7, the recommendation/affinity primitive next to the
near-dup and retrieval families.

Scale posture (100 TB of order lines):

- The item table collapses to DISTINCT (basket, item) first — one shuffled
  dedup, after which everything is basket-item-sized, not line-sized.
- Pair generation is the canonical co-occurrence SELF-JOIN on the basket
  key: each basket contributes C(k, 2) pairs, so the shuffle is bounded by
  the basket-size cap (``max_basket_items``, default 100 — a pathological
  mega-basket would otherwise contribute quadratically; capped baskets are
  DROPPED, deterministically, and the oracle mirrors the cap). The
  dimension join (part → brand) broadcasts.
- Measures are ratios of the pair/item/basket COUNTS — integers — so no
  second pass over the data: one count shuffle for items, one for pairs.

Exactness: support, confidence, and lift are emitted UNROUNDED — each is
a fixed expression over BIGINT counts, and IEEE division of identical
integers is bit-identical in any engine (the ewma lesson applied from the
start: with identical inputs and op order, rounding is the only thing
that could diverge, so don't round). Ranking ties break on the rule's
(antecedent, consequent) strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def basket_rules(
    lineitem: DataFrame,
    part: DataFrame,
    min_pair_count: int = 10,
    top_k: int = 20,
    max_basket_items: int = 100,
) -> DataFrame:
    """Pairwise association rules over order-baskets of part brands.

    For every directed rule A -> B whose unordered pair appears in at
    least ``min_pair_count`` baskets (an absolute count, not a fraction —
    identical filtering at any scale factor):

    - ``support``    = pair_baskets / n_baskets
    - ``confidence`` = pair_baskets / baskets(A)
    - ``lift``       = confidence / (baskets(B) / n_baskets)

    Output: top ``top_k`` rules by (confidence DESC, lift DESC,
    antecedent ASC, consequent ASC) — ``(antecedent, consequent,
    pair_baskets, support, confidence, lift, rk)``.
    """
    items = (
        lineitem.select("l_orderkey", "l_partkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
        # materialized once (r14 optimization round, guide §3.3): the basket
        # size-cap below consumes the deduped table twice (the size aggregate
        # and the join's left side), and each consumer otherwise re-runs the
        # line-scale dedup shuffle
        .localCheckpoint(eager=False)
    )
    # cap pathological baskets BEFORE pair generation (C(k,2) growth)
    sizes = items.groupBy("basket").agg(F.count(F.lit(1)).alias("k"))
    items = items.join(
        sizes.filter(F.col("k") <= max_basket_items).select("basket"), "basket"
    )
    # eager-checkpoint the deduped item table: FOUR consumers read it (the
    # n_baskets count action below, item_cnt, and both sides of the pair
    # self-join) — without materialization the line-scale dedup chain
    # re-runs per consumer (the hll_overlap lesson; a persist could not be
    # safely unpersisted before the caller's lazy collect)
    items = items.localCheckpoint(eager=True)
    n_baskets = items.select("basket").distinct().count()
    if n_baskets == 0:
        return items.sparkSession.createDataFrame(
            [],
            "antecedent string, consequent string, pair_baskets bigint, "
            "support double, confidence double, lift double, rk bigint",
        )
    item_cnt = items.groupBy("item").agg(F.count(F.lit(1)).alias("item_baskets"))
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_pair_count)
    )
    # both rule directions from each unordered pair
    rules = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_baskets",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_baskets",
        )
    )
    ante = item_cnt.select(
        F.col("item").alias("antecedent"), F.col("item_baskets").alias("ante_baskets")
    )
    cons = item_cnt.select(
        F.col("item").alias("consequent"), F.col("item_baskets").alias("cons_baskets")
    )
    scored = (
        rules.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .select(
            "antecedent",
            "consequent",
            "pair_baskets",
            (F.col("pair_baskets") / F.lit(n_baskets)).alias("support"),
            (F.col("pair_baskets") / F.col("ante_baskets")).alias("confidence"),
            (
                (F.col("pair_baskets") / F.col("ante_baskets"))
                / (F.col("cons_baskets") / F.lit(n_baskets))
            ).alias("lift"),
        )
    )
    w = Window.orderBy(
        F.desc("confidence"), F.desc("lift"), F.asc("antecedent"), F.asc("consequent")
    )
    # the global top-k window runs over the already-thresholded rule list
    # (item-vocabulary-sized, never line-sized) — single partition is fine
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= top_k)
        .orderBy("rk")
    )


def basket_rules_sql(
    min_pair_count: int = 10, top_k: int = 20, max_basket_items: int = 100
) -> str:
    """DuckDB twin of :func:`basket_rules`: same distinct/cap/pair chain,
    same integer counts, the same unrounded ratio expressions (IEEE
    division of identical BIGINTs is bit-identical), same tiebreak."""
    return f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
kept AS (
  SELECT basket FROM items GROUP BY basket HAVING count(*) <= {max_basket_items}
),
it AS (SELECT i.* FROM items i JOIN kept USING (basket)),
nb AS (SELECT count(DISTINCT basket) AS n FROM it),
item_cnt AS (SELECT item, count(*) AS item_baskets FROM it GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_baskets
  FROM it a JOIN it b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {min_pair_count}
),
rules AS (
  SELECT item_a AS antecedent, item_b AS consequent, pair_baskets FROM pairs
  UNION ALL
  SELECT item_b, item_a, pair_baskets FROM pairs
),
scored AS (
  SELECT r.antecedent, r.consequent, r.pair_baskets,
         r.pair_baskets / CAST(nb.n AS DOUBLE) AS support,
         r.pair_baskets / CAST(ia.item_baskets AS DOUBLE) AS confidence,
         (r.pair_baskets / CAST(ia.item_baskets AS DOUBLE))
           / (ic.item_baskets / CAST(nb.n AS DOUBLE)) AS lift
  FROM rules r
  JOIN item_cnt ia ON ia.item = r.antecedent
  JOIN item_cnt ic ON ic.item = r.consequent
  CROSS JOIN nb
)
SELECT antecedent, consequent, pair_baskets, support, confidence, lift,
       CAST(row_number() OVER (
         ORDER BY confidence DESC, lift DESC, antecedent ASC, consequent ASC
       ) AS BIGINT) AS rk
FROM scored
QUALIFY rk <= {top_k}
ORDER BY rk
"""


#: the face's oracle (driver-contract parameters)
BASKET_RULES_SQL = basket_rules_sql()
