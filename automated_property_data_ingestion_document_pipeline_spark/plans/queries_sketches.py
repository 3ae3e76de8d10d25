"""Frequency/membership sketch registrations (operators/sketches.py).

Rows-only by design: cell contents hinge on xxhash64, a JVM expression
DuckDB cannot replay. Instead each key JOINS THE SKETCH BACK TO THE
EXACT ANSWER on the same corpus and emits the error profile as data —
the one-sided guarantees (Count-Min never underestimates, Bloom never
false-negatives) become hard zeros the driver and tests can see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import sketches
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query


@query("q_countmin_error")  # rows-only: xxhash64 cells, self-measured error
def q_countmin_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (4×256 cells) over the events stream's
    user ids, probed for every distinct user and joined to the exact
    counts. Output is the error profile: underestimates MUST be zero
    (CM's one-sided bound), mean overestimate is the accuracy cost of
    the fixed 8 KB memory budget. Sketch build is one aggregation; the
    probe joins against the broadcast 1024-row sketch."""
    ev = catalog.load(spark, sf_dir, "events")
    sk = sketches.count_min_build(ev, "user_id")
    users = ev.select("user_id").distinct()
    est = sketches.count_min_estimate(sk, users, "user_id")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact"))
    # finding 94: `est` is a per-user post-explode probe relation —
    # user-scale with Generate hiding the fan-out; pin the partitioned
    # join (exact, a clean aggregate, is the build side)
    err = est.join(exact.hint("shuffle_hash"), "user_id").select(
        "user_id", "est", "exact", (F.col("est") - F.col("exact")).alias("over")
    )
    out = err.agg(
        F.count("*").alias("n_keys"),
        F.sum(F.when(F.col("over") < 0, 1).otherwise(0)).alias("n_underestimates"),
        F.round(F.avg("over"), 3).alias("avg_overestimate"),
        F.max("over").alias("max_overestimate"),
    )
    # driver-visible evidence (r08): second row present ONLY when CM's
    # one-sided bound holds (zero underestimates) — 2 rows = bound met
    gate = out.filter(F.col("n_underestimates") == 0).select(
        F.lit(-2).cast("long").alias("n_keys"),
        "n_underestimates", "avg_overestimate", "max_overestimate",
    )
    return out.unionByName(gate)


@query("q_bloom_filter")  # rows-only: xxhash64 bits, self-measured FP rate
def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership filter (64 Kbit, 5 hashes) built over the
    supplier key set and probed with every customer key — the
    persistable form of a runtime join filter (prune a 100 TB fact
    against a dim WITHOUT shipping the dim to every scan task; Spark's
    own InjectRuntimeFilter cannot outlive its query). Output: zero
    false negatives (hard guarantee) and the measured false-positive
    rate vs the exact semi-join."""
    supp = catalog.load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k")
    )
    cust = catalog.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    bloom = sketches.bloom_build(supp, "k")
    flags = sketches.bloom_might_contain(cust, bloom, "k")
    truth = cust.join(supp.distinct(), "k", "left_semi").select(
        "k", F.lit(True).alias("is_member")
    )
    # finding 94: `flags` is a per-key post-explode probe relation
    # (customer-scale) — pin so neither corpus side can broadcast
    joined = flags.join(truth.hint("shuffle_hash"), "k", "left").select(
        "k",
        "might_contain",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )
    out = joined.agg(
        F.count("*").alias("n_probes"),
        F.sum(
            F.when(F.col("is_member") & ~F.col("might_contain"), 1).otherwise(0)
        ).alias("false_negatives"),
        F.sum(
            F.when(~F.col("is_member") & F.col("might_contain"), 1).otherwise(0)
        ).alias("false_positives"),
        # try_divide: a probe set with zero non-members (edge corpus)
        # must yield NULL, not an ANSI divide-by-zero abort
        F.round(
            F.try_divide(
                F.sum(
                    F.when(~F.col("is_member") & F.col("might_contain"), 1).otherwise(0)
                ),
                F.sum(F.when(~F.col("is_member"), 1).otherwise(0)),
            ),
            4,
        ).alias("fp_rate"),
    )
    # driver-visible evidence (r08): second row present ONLY when the
    # Bloom hard guarantee holds (zero false negatives) — 2 rows = met
    gate = out.filter(F.col("false_negatives") == 0).select(
        F.lit(-2).cast("long").alias("n_probes"),
        "false_negatives", "false_positives", "fp_rate",
    )
    return out.unionByName(gate)


@query("q_kmv_distinct")  # rows-only: xxhash64 minima, self-measured error
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch per market segment over
    customer keys, k=64 — the sketch family that, unlike HLL, supports
    set operations via minima merging (mergeability unit-tested). The
    key joins estimates to exact distinct counts and emits the relative
    error; groups under k are exact by construction (the sketch IS the
    set), which the driver row makes visible."""
    c = catalog.load(spark, sf_dir, "customer")
    sk = sketches.kmv_build(c, "c_custkey", "c_mktsegment", k=64)
    est = sketches.kmv_estimate(sk, k=64)
    exact = c.groupBy(F.col("c_mktsegment").alias("grp")).agg(
        F.countDistinct("c_custkey").alias("exact_distinct")
    )
    out = est.join(exact, "grp").select(
        "grp",
        F.round("est_distinct", 1).alias("est_distinct"),
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )
    # driver-visible evidence (r08): gate row ONLY when every group's
    # error is inside the k=64 band (1/sqrt(63) ≈ 0.13 one-sigma; 0.5
    # is the test's loose bound) — measured ≤0.19 on the real corpora
    gate = out.agg(
        F.lit("GATE rel_error<0.5").alias("grp"),
        F.lit(None).cast("double").alias("est_distinct"),
        F.lit(None).cast("long").alias("exact_distinct"),
        F.max("rel_error").alias("rel_error"),
    ).filter(F.col("rel_error") < 0.5)
    return out.unionByName(gate)
