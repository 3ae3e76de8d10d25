"""Deduplication operators (SURVEY §2.5 A1-A3, §2.9 X3-X4): exact
(hash-groupBy), last-write-wins per key, MinHash+LSH near-dup, SimHash,
n-gram Jaccard.

Scale notes: every variant is a single shuffle on the dedup key (or LSH
band bucket) with map-side partial aggregation; signatures are computed
row-local with built-in hash functions (xxhash64) so no Python executes
per row. Band-bucket join cardinality is bounded by banding parameters,
the standard LSH trade (Leskovec et al., Mining of Massive Datasets ch.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.functions.text import shingles


def last_write_wins(df: DataFrame, key_cols: list[str], order_cols: list[Column]) -> DataFrame:
    """Keep the newest row per key (report_generator.py:63-68, 89 —
    regenerating a letter for the same safe_name overwrites the file).

    ``order_cols`` must totally order rows within a key (pass a unique
    tiebreaker last) or the pick is nondeterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_text_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: sha2-256 the text, keep the lowest id
    per hash (deterministic canonical representative). One shuffle on the
    256-bit hash — uniform key distribution, no skew at any scale."""
    hashed = df.withColumn("text_sha256", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("text_sha256").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signature(text: Column, num_hashes: int = 16, shingle_k: int = 3) -> Column:
    """MinHash signature as array<bigint>: per seed i, min over shingles
    of xxhash64(shingle, i). Row-local, JVM-side (xxhash64 is a builtin);
    no UDF, no shuffle."""
    sh = shingles(text, shingle_k)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    # Single pass over shingles with a signature-wide accumulator
    # (zip_with least) instead of num_hashes separate array scans.
    long_max = F.lit(2**63 - 1).cast("long")
    return F.aggregate(
        sh,
        F.array_repeat(long_max, num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(s, i)),
            lambda cur, h: F.least(cur, h),
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of r rows,
    hash each band, self-join on (band_idx, band_hash) → candidate pairs
    ``(id_a, id_b)`` with id_a < id_b, deduplicated.

    The self-join shuffles on band hash — bucket sizes follow the LSH
    s-curve, so hot buckets mean genuinely-similar clusters, which is the
    work we want. AQE skew-join handles pathological clusters.
    """
    r = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(text_col), num_hashes, shingle_k).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.array_join(F.slice("_sig", b * r + 1, r), ","), F.lit(b))
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def simhash64(text: Column, shingle_k: int = 2) -> Column:
    """63-bit SimHash (sign bit skipped): majority vote per bit over
    per-shingle xxhash64 values. Near-dups differ in few bits (Charikar
    2002; Manku et al. WWW'07 dedup-at-Google design).

    Single-pass formulation: ONE aggregate fold over the shingle hashes
    carrying a 63-wide bit-count accumulator (zip_with add), then one
    pass over the counts to assemble the fingerprint. An earlier
    63-filter-passes version was ~60× slower — HOF expression size
    matters at scale.
    """
    hs = F.transform(shingles(text, shingle_k), lambda s: F.xxhash64(s))
    n = F.size(hs)
    bit_idx = F.sequence(F.lit(0), F.lit(62))
    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), 63),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(bit_idx, lambda b: F.bit_get(h, b).cast("int")),
            lambda a, bit: a + bit,
        ),
    )
    # majority vote per bit, then positional fold (acc*2 + bit) from the
    # high bit down — no Column-valued shifts needed.
    bits = F.transform(counts, lambda cnt: F.when(cnt * 2 >= n, 1).otherwise(0).cast("long"))
    return F.aggregate(
        F.reverse(bits), F.lit(0).cast("long"), lambda acc, bit: acc * 2 + bit
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity.

    ``candidates`` has (id_a, id_b). Joins shingle sets in (twice, small
    dim side broadcastable when candidates are few) and computes
    |A∩B| / |A∪B| via array intersection — exact, so this is the
    verification stage after LSH recall."""
    sets_df = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_k)).alias("_set"),
    )
    a = sets_df.alias("a")
    b = sets_df.alias("b")
    joined = (
        candidates.join(a, candidates.id_a == F.col("a._id"))
        .join(b, candidates.id_b == F.col("b._id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("a._set", "b._set"))
                / F.size(F.array_union("a._set", "b._set"))
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)
