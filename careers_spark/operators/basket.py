"""Market-basket co-occurrence analysis (association rules).

The classic retail-analytics operator family (Agrawal & Srikant 1994):
which items co-occur in the same basket more than chance predicts —
support / confidence / lift over item pairs. On a KG corpus the same
shape mines "entities that co-appear in conversations"; here it runs on
the order/lineitem star as the canonical form.

Everything is integer counts with single final divisions, so the whole
rule table is oracle-checkable hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    lineitem: DataFrame,
    min_pair_orders: int = 3,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Item-pair association rules over baskets.

    support(a,b) = P(a,b), confidence(a->b) = P(b|a), and
    lift = P(a,b) / (P(a)P(b)) — lift > 1 means the pair co-occurs
    more than independent items would.

    Physical shape at scale: the basket self-join on the order key is
    the wedge shuffle (the triangle_stats / entity-edges shape) — its
    fan-out is sum over baskets of k^2, bounded by the max basket
    size, never corpus-quadratic; both count aggregations are
    partial-agg friendly; the min-support filter runs BEFORE the
    dimension joins so only surviving pairs pay them. The basket-count
    and item-count tables are broadcast-sized.

    Engine exactness: n_ab/n_a/n_b/n_orders are integers; support and
    the two confidences are one division each; lift is the fixed
    expression n_ab * N / (n_a * n_b) evaluated once — all rounded
    to 6.

    Output: (item_a, item_b, n_ab, support, conf_a_to_b, conf_b_to_a,
    lift) for pairs in >= min_pair_orders baskets, item_a < item_b.
    """
    b = lineitem.select(
        F.col(order_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    n_orders = b.agg(F.countDistinct("basket").alias("n_orders"))
    item_cnt = b.groupBy("item").agg(F.count("*").alias("n_item"))
    a = b.selectExpr("basket", "item as ia")
    c = b.selectExpr("basket as b2", "item as ib")
    pairs = (
        a.join(c, (a.basket == c.b2) & (F.col("ia") < F.col("ib")))
        .groupBy(F.col("ia").alias("item_a"), F.col("ib").alias("item_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_orders))
    )
    return (
        pairs.join(item_cnt.selectExpr("item as item_a", "n_item as n_a"), "item_a")
        .join(item_cnt.selectExpr("item as item_b", "n_item as n_b"), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.expr("round(n_ab / cast(n_orders as double), 6)").alias("support"),
            F.expr("round(n_ab / cast(n_a as double), 6)").alias("conf_a_to_b"),
            F.expr("round(n_ab / cast(n_b as double), 6)").alias("conf_b_to_a"),
            F.expr(
                "round(n_ab * cast(n_orders as double) / (n_a * n_b), 6)"
            ).alias("lift"),
        )
    )


def item_cosine_topk(
    lineitem: DataFrame,
    n_neighbors: int = 5,
    min_pair_orders: int = 2,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Item-item cosine similarity over co-purchase baskets (Sarwar et
    al. WWW'01) — the serving table of item-based collaborative
    filtering: for each item, its top-N most-similar items by

        cos(a, b) = n_ab / sqrt(n_a * n_b)

    on binary basket vectors. The companion to association_rules
    (which judges pairs by lift); this one NORMALIZES so popular items
    don't dominate, and ranks per item for the "customers also bought"
    list.

    Physical shape at scale: identical wedge shuffle as
    association_rules (fan-out bounded by max basket size, never
    corpus-quadratic); the min-support filter prunes pairs BEFORE the
    count joins; the per-item top-N is a window partitioned by item —
    a per-item sort over that item's (pruned) neighbor rows only,
    never a global sort.

    Engine exactness: n_ab/n_a/n_b are integers; n_a * n_b is an exact
    BIGINT product; sqrt is IEEE-correctly-rounded (the
    lang_temperature_weights argument) so cos is the identical double
    in both engines, rounded to 6 BEFORE the (cos desc, neighbor asc)
    rank.

    Output: (item, neighbor, n_ab, cos_sim, rk) — both orientations
    of every retained pair, rk 1..n_neighbors per item.
    """
    from pyspark.sql import Window

    b = lineitem.select(
        F.col(order_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    item_cnt = b.groupBy("item").agg(F.count("*").alias("n_item"))
    a = b.selectExpr("basket", "item as ia")
    c = b.selectExpr("basket as b2", "item as ib")
    pairs = (
        a.join(c, (a.basket == c.b2) & (F.col("ia") < F.col("ib")))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_orders))
    )
    both = pairs.selectExpr("ia as item", "ib as neighbor", "n_ab").unionByName(
        pairs.selectExpr("ib as item", "ia as neighbor", "n_ab")
    )
    scored = (
        both.join(item_cnt.selectExpr("item", "n_item as n_i"), "item")
        .join(
            item_cnt.selectExpr("item as neighbor", "n_item as n_j"),
            "neighbor",
        )
        .withColumn(
            "cos_sim",
            F.expr("round(n_ab / sqrt(cast(n_i * n_j as double)), 6)"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("cos_sim"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(n_neighbors))
        .select("item", "neighbor", "n_ab", "cos_sim", "rk")
    )
