"""Extended SQL-surface registrations: map-typed columns, value-range
window frames, relational division, mode-per-group.

Each key covers a SQL capability class a reference user would expect
from a general engine (SURVEY §2.8's "functions" axis) that wasn't yet
driver-visible: MapType construction/algebra, RANGE (value-based)
window frames vs the ROWS frames used elsewhere, the division idiom
("for all"), and deterministic mode extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query


@query(
    "q_map_fns",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice,
             CAST(o_orderkey % 1000 AS DOUBLE) AS keymod,
             CAST(LENGTH(o_orderstatus || o_orderpriority) AS DOUBLE) AS slen
      FROM orders
    )
    SELECT o_orderkey, 'price' AS k, o_totalprice AS v
    FROM base WHERE o_totalprice > 100
    UNION ALL
    SELECT o_orderkey, 'keymod' AS k, keymod AS v
    FROM base WHERE keymod > 100
    UNION ALL
    SELECT o_orderkey, 'strlen' AS k, slen AS v
    FROM base WHERE slen > 100
    """,
)
def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType algebra end-to-end: build a map per order
    (``map_from_arrays``), merge in a second map (``map_concat``),
    drop small values (``map_filter`` — a JVM lambda HOF, not a Python
    UDF), then ``explode`` to (key, value) rows. The oracle states the
    expected exploded relation directly, so the driver verifies the
    whole map pipeline by value. Map-only plan — zero shuffles."""
    o = catalog.load(spark, sf_dir, "orders")
    m1 = F.map_from_arrays(
        F.array(F.lit("price"), F.lit("keymod")),
        F.array(
            F.col("o_totalprice"),
            (F.col("o_orderkey") % 1000).cast("double"),
        ),
    )
    m2 = F.create_map(
        F.lit("strlen"),
        F.length(F.concat("o_orderstatus", "o_orderpriority")).cast("double"),
    )
    merged = F.map_concat(m1, m2)
    big = F.map_filter(merged, lambda k, v: v > 100)
    return (
        o.select("o_orderkey", F.explode(big).alias("k", "v"))
    )


@query(
    "q_range_frame",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW
           ), 2) AS spend_30d
    FROM orders
    """,
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day spend per customer with a VALUE-based (RANGE)
    frame — peers at the same timestamp all join the frame, unlike the
    ROWS frames used elsewhere. Ordered by integer epoch-micros on both
    engines so the frame boundary is exact. One shuffle on o_custkey."""
    o = catalog.load(spark, sf_dir, "orders")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(us.alias("_us"))
        .rangeBetween(-30 * 86_400 * 1_000_000, 0)
    )
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "q_relational_division",
    oracle="""
    SELECT o_custkey AS c_custkey
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT o_orderpriority) =
           (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
    """,
)
def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ("customers who used EVERY priority class"):
    per-key distinct count equals the global distinct count. The global
    side is a single-row aggregate broadcast into the filter — the
    only sound use of a cross join — so the plan is two aggregations
    plus a broadcast, never a correlated subquery per key."""
    o = catalog.load(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.countDistinct("o_orderpriority").alias("n_prio")
    )
    total = o.agg(F.countDistinct("o_orderpriority").alias("n_all"))
    return (
        per_key.join(F.broadcast(total))
        .filter(F.col("n_prio") == F.col("n_all"))
        .select("c_custkey")
    )


@query(
    "q_mode_per_group",
    oracle="""
    WITH counted AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_type, n AS n_occurrences
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY n DESC, event_type
      ) AS rk FROM counted
    )
    WHERE rk = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: each user's most frequent event type, ties
    broken lexicographically. Count-then-rank — the shuffle carries
    (user, type) partial counts, never raw events twice."""
    ev = catalog.load(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("n_occurrences"),
        )
    )


@query(
    "q_skyline",
    oracle="""
    WITH pts AS (
      SELECT p_partkey, p_size, p_retailprice FROM part
      WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
    )
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): parts not dominated on
    (minimize price, maximize size). Spark plan is the sweep-line
    rewrite, not the O(n^2) NOT EXISTS: collapse to price levels
    (groupBy), running max size over prior levels (ordered window on the
    LEVEL table — bounded by the 2-decimal price domain, not row count),
    then an equi-join back. Dominated iff a strictly cheaper level
    reaches its size, or its own level strictly exceeds it. All
    comparisons are raw double/int — no rounding, identical on both
    engines — so the brute-force oracle agrees exactly. Points with a
    NULL coordinate are excluded up front: NULL is outside any
    dominance order (NOT EXISTS would silently keep every such row
    while the sweep would rank it NULLS FIRST — the edge corpus
    exposed exactly that divergence)."""
    p = catalog.load(spark, sf_dir, "part").filter(
        F.col("p_size").isNotNull() & F.col("p_retailprice").isNotNull()
    )
    lvl = p.groupBy("p_retailprice").agg(F.max("p_size").alias("lvl_max"))
    w = Window.orderBy("p_retailprice")
    lvl2 = lvl.select(
        "p_retailprice",
        F.max("lvl_max").over(w.rowsBetween(Window.unboundedPreceding, -1)).alias("m1"),
        F.max("lvl_max").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("m2"),
    )
    joined = p.join(lvl2, "p_retailprice")
    survives = (
        (F.col("m1").isNull() | (F.col("m1") < F.col("p_size")))
        & (F.col("m2") <= F.col("p_size"))
    )
    return joined.filter(survives).select("p_partkey", "p_size", "p_retailprice")


@query(
    "q_global_rownum",
    oracle="""
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY o_orderkey) AS global_rn
    FROM orders
    """,
)
def q_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sequence assignment (training-shard example indices)
    WITHOUT the single-partition global window: range-repartition by the
    sort key, number rows per partition locally, then add broadcast
    per-partition offsets (counts → cumulative sum over the tiny
    partition table). Output is invariant to where the range boundaries
    land because offsets come from actual partition counts — so the
    plan parallelizes across all executors while the naive
    ``ROW_NUMBER() OVER (ORDER BY ...)`` oracle pins one task at scale.
    Requires a unique sort key (o_orderkey) for determinism. Now
    delegates to operators/ranking.global_rank, which also pins ONE
    sampled range-partitioning via lazy localCheckpoint (the offsets
    aggregate and the final join would otherwise re-sample boundaries
    independently and corrupt ranks — found by q_equidepth_histogram)."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    o = catalog.load(spark, sf_dir, "orders").select("o_orderkey")
    return ranking.global_rank(
        o, [F.col("o_orderkey").asc()], rank_col="global_rn"
    ).select("o_orderkey", "global_rn")


@query(
    "q_item_pairs",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
      SELECT l_partkey FROM baskets
      GROUP BY l_partkey HAVING COUNT(*) >= 3
    ), fb AS (
      SELECT b.l_orderkey, b.l_partkey FROM baskets b
      JOIN freq f ON b.l_partkey = f.l_partkey
    )
    SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
           COUNT(*) AS pair_support
    FROM fb a JOIN fb b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def q_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (market-basket mining, the
    A-Priori first pass): prune to items with support >= 3 BEFORE the
    basket self-join — the pruning is what bounds the join at 100 TB
    (pair candidates shrink quadratically with the item filter), then
    pairs with support >= 2 survive. Equi-join on the basket key;
    per-basket fan-out is C(|frequent items in basket|, 2)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        baskets.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
        .select("l_partkey")
    )
    fb = baskets.join(freq, "l_partkey").select("l_orderkey", "l_partkey")
    a = fb.select("l_orderkey", F.col("l_partkey").alias("item_a"))
    b = fb.select("l_orderkey", F.col("l_partkey").alias("item_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_support"))
        .filter(F.col("pair_support") >= 2)
    )


@query(
    "q_share_of_total",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment AS segment,
             CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS seg_rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c_mktsegment
    )
    SELECT segment, seg_rev,
           ROUND(seg_rev / SUM(seg_rev) OVER (), 6) AS share
    FROM seg
    """,
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total (the dashboard ratio): segment revenue over grand
    total via an unpartitioned window over the ALREADY-AGGREGATED
    5-row segment table — the window never touches raw orders, so the
    "global window" costs nothing. Revenue goes through the exact
    decimal lane; the final division divides identical operands on both
    engines."""
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")
    seg = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("seg_rev")
        )
    )
    w = Window.partitionBy()
    return seg.select(
        "segment",
        "seg_rev",
        F.round(F.col("seg_rev") / F.sum("seg_rev").over(w), 6).alias("share"),
    )


@query(
    "q_topn_plus_other",
    oracle="""
    WITH pc AS (
      SELECT p_brand, COUNT(*) AS n
      FROM part GROUP BY p_brand
    ), ranked AS (
      SELECT p_brand, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, p_brand) AS rk
      FROM pc
    )
    SELECT CASE WHEN rk <= 3 THEN p_brand ELSE 'OTHER' END AS brand,
           CAST(SUM(n) AS BIGINT) AS n_parts
    FROM ranked
    GROUP BY 1
    """,
)
def q_topn_plus_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 brands with everything else collapsed to an OTHER bucket —
    the long-tail fold every pie chart needs. Rank on the aggregated
    brand table (small), not on raw parts; deterministic tie-break on
    the brand name."""
    p = catalog.load(spark, sf_dir, "part")
    pc = p.groupBy("p_brand").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), "p_brand")
    ranked = pc.withColumn("rk", F.row_number().over(w))
    return (
        ranked.select(
            F.when(F.col("rk") <= 3, F.col("p_brand"))
            .otherwise("OTHER")
            .alias("brand"),
            "n",
        )
        .groupBy("brand")
        .agg(F.sum("n").alias("n_parts"))
    )


@query(
    "q_item_similarity",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), freq AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM baskets
      GROUP BY l_partkey HAVING COUNT(*) >= 3
    ), fb AS (
      SELECT b.l_orderkey, b.l_partkey FROM baskets b
      JOIN freq f ON b.l_partkey = f.l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             CAST(COUNT(*) AS BIGINT) AS co_count
      FROM fb a JOIN fb b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.item_a, p.item_b, p.co_count,
           p.co_count / (SQRT(CAST(fa.cnt AS DOUBLE)) * SQRT(CAST(fb2.cnt AS DOUBLE)))
               AS cosine
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.item_a
    JOIN freq fb2 ON fb2.l_partkey = p.item_b
    """,
)
def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity over co-purchase baskets — the
    classic collaborative-filtering neighborhood model (Amazon
    item-to-item): cosine(a,b) = co(a,b)/√(n_a·n_b) on binary basket
    vectors. Rides q_item_pairs' A-Priori pruning (only ≥3-support
    items enter the self-join, co ≥ 2 emitted), then two BROADCAST
    joins attach the item supports (the frequent-item table is tiny by
    construction). sqrt is IEEE-exact so the scores hash-match."""
    li = catalog.load(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        baskets.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 3)
    )
    fb = baskets.join(F.broadcast(freq.select("l_partkey")), "l_partkey")
    a = fb.select(F.col("l_orderkey"), F.col("l_partkey").alias("item_a"))
    b = fb.select(F.col("l_orderkey"), F.col("l_partkey").alias("item_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("co_count"))
        .filter(F.col("co_count") >= 2)
    )
    fa = freq.select(F.col("l_partkey").alias("item_a"), F.col("cnt").alias("cnt_a"))
    fb2 = freq.select(F.col("l_partkey").alias("item_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb2), "item_b")
        .select(
            "item_a",
            "item_b",
            "co_count",
            (
                F.col("co_count")
                / (F.sqrt(F.col("cnt_a").cast("double")) * F.sqrt(F.col("cnt_b").cast("double")))
            ).alias("cosine"),
        )
    )


@query(
    "q_string_agg",
    oracle="""
    SELECT r.r_name,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED string aggregation (LISTAGG/STRING_AGG WITHIN GROUP) —
    the report-building fold SQL warehouses ship natively and Spark
    does not: collect_list gives a nondeterministic partition order, so
    the deterministic form is collect → array_sort → array_join, all
    JVM-side. The sort is per-GROUP (bounded by the group's cardinality
    — here nations per region), never a global sort; at 100 TB the
    contract is 'ordered within key', which is exactly what a grouped
    array_sort provides."""
    n = catalog.load(spark, sf_dir, "nation")
    r = catalog.load(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return j.groupBy("r_name").agg(
        F.count("*").cast("bigint").alias("n_nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
    )


@query(
    "q_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM baskets),
    freq AS (
      SELECT l_partkey, COUNT(*) AS supp FROM baskets
      GROUP BY l_partkey HAVING COUNT(*) >= 3
    ),
    fb AS (
      SELECT b.l_orderkey, b.l_partkey FROM baskets b
      JOIN freq f ON b.l_partkey = f.l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, COUNT(*) AS supp_ab
      FROM fb a JOIN fb b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.item_a, p.item_b,
           CAST(p.supp_ab AS BIGINT) AS supp_ab,
           CAST(fa.supp AS BIGINT) AS supp_a,
           CAST(fb2.supp AS BIGINT) AS supp_b,
           CAST(p.supp_ab AS DOUBLE) / CAST(fa.supp AS DOUBLE)
               AS confidence_ab,
           CAST(p.supp_ab * nb.n_baskets AS DOUBLE)
                 / CAST(fa.supp * fb2.supp AS DOUBLE) AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.item_a
    JOIN freq fb2 ON fb2.l_partkey = p.item_b
    CROSS JOIN nb
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules a→b over the A-Priori-pruned pair table:
    confidence = supp(ab)/supp(a) and lift =
    supp(ab)·N / (supp(a)·supp(b)) — both computed as integer
    cross-products with ONE IEEE division each (never a ratio of two
    rounded doubles). Completes the market-basket family
    (q_item_pairs = mining, q_item_similarity = cosine, this = the
    rule scores a recommender actually ranks by). Plan: the pruned
    pair join from q_item_pairs + two broadcast support joins + a
    single-row basket-count broadcast."""
    li = catalog.load(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    nb = baskets.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    freq = (
        baskets.groupBy("l_partkey")
        .agg(F.count("*").alias("supp"))
        .filter(F.col("supp") >= 3)
    )
    fb = baskets.join(F.broadcast(freq.select("l_partkey")), "l_partkey")
    a = fb.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item_a"))
    b = fb.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("item_b"))
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("supp_ab"))
        .filter(F.col("supp_ab") >= 2)
    )
    fa = freq.select(F.col("l_partkey").alias("item_a"), F.col("supp").alias("supp_a"))
    fb2 = freq.select(F.col("l_partkey").alias("item_b"), F.col("supp").alias("supp_b"))
    out = (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb2), "item_b")
        .join(F.broadcast(nb))  # single-row broadcast, not a cartesian
    )
    return out.select(
        "item_a",
        "item_b",
        F.col("supp_ab").cast("bigint").alias("supp_ab"),
        F.col("supp_a").cast("bigint").alias("supp_a"),
        F.col("supp_b").cast("bigint").alias("supp_b"),
        (
            F.col("supp_ab").cast("double") / F.col("supp_a").cast("double")
        ).alias("confidence_ab"),
        (
            (F.col("supp_ab") * F.col("n_baskets")).cast("double")
            / (F.col("supp_a") * F.col("supp_b")).cast("double")
        ).alias("lift"),
    )


@query(
    "q_abc_classes",
    oracle="""
    WITH p AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM lineitem WHERE l_extendedprice IS NOT NULL
        GROUP BY l_partkey
    ),
    r AS (
        SELECT l_partkey, rev_cents,
               CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_cents,
               CAST(SUM(rev_cents) OVER () AS BIGINT) AS tot_cents
        FROM p
    )
    SELECT l_partkey, rev_cents, cum_cents,
           CASE WHEN 5 * cum_cents <= 4 * tot_cents THEN 'A'
                WHEN 20 * cum_cents <= 19 * tot_cents THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r
    """,
)
def q_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue,
    class A while cumulative share ≤ 80%, B to 95%, C after — with the
    share thresholds tested as INTEGER cross-products
    (5·cum ≤ 4·tot ⇔ cum/tot ≤ 0.8, zero float ambiguity at the
    boundary). The cumulative revenue comes from the scalable
    range-partition prefix sum (operators/ranking.global_prefix_sum) —
    the oracle's single-task ordered window is the semantics, not the
    plan — so the classification parallelizes over any catalog size."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import ranking

    li = catalog.load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    p = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    tot = p.agg(F.sum("rev_cents").cast("bigint").alias("tot_cents"))
    r = ranking.global_prefix_sum(
        p.join(F.broadcast(tot)),  # single-row broadcast
        [F.col("rev_cents").desc(), F.col("l_partkey").asc()],
        "rev_cents",
        out_col="cum_cents",
    )
    return r.select(
        "l_partkey",
        "rev_cents",
        "cum_cents",
        F.when(5 * F.col("cum_cents") <= 4 * F.col("tot_cents"), "A")
        .when(20 * F.col("cum_cents") <= 19 * F.col("tot_cents"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
