"""Sketch operator tests: Count-Min never underestimates and merges by
cell-sum; Bloom never false-negatives and merges by bit-OR. Corpus-level
error profiles are the q_countmin_error / q_bloom_filter keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.operators import sketches


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k long")


def test_count_min_upper_bounds_every_key(spark):
    # skewed multiset: key i appears i times for i in 1..20
    vals = [i for i in range(1, 21) for _ in range(i)]
    df = _keys(spark, vals)
    sk = sketches.count_min_build(df, "k", depth=4, width=32)
    est = {
        r.k: r.est
        for r in sketches.count_min_estimate(
            sk, df.distinct(), "k", depth=4, width=32
        ).collect()
    }
    for i in range(1, 21):
        assert est[i] >= i  # one-sided bound
    assert sum(est.values()) >= sum(range(1, 21))


def test_count_min_merges_by_cell_sum(spark):
    a = _keys(spark, [1, 2, 2, 3])
    b = _keys(spark, [2, 3, 3, 4])
    merged = (
        sketches.count_min_build(a, "k")
        .unionAll(sketches.count_min_build(b, "k"))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketches.count_min_build(a.unionAll(b), "k")
    got = {(r.row, r.cell): r.cnt for r in merged.collect()}
    want = {(r.row, r.cell): r.cnt for r in whole.collect()}
    assert got == want


def test_bloom_no_false_negatives_and_merges_by_or(spark):
    members = _keys(spark, list(range(0, 200, 2)))
    bloom = sketches.bloom_build(members, "k", num_bits=1 << 12, num_hashes=4)
    flags = {
        r.k: r.might_contain
        for r in sketches.bloom_might_contain(
            _keys(spark, list(range(200))), bloom, "k", num_bits=1 << 12, num_hashes=4
        ).collect()
    }
    assert all(flags[k] for k in range(0, 200, 2))  # members always hit
    # shard merge: OR of half-blooms equals the whole bloom
    b1 = sketches.bloom_build(_keys(spark, list(range(0, 100, 2))), "k")
    b2 = sketches.bloom_build(_keys(spark, list(range(100, 200, 2))), "k")
    merged = (
        b1.unionAll(b2).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    whole = sketches.bloom_build(members, "k")
    got = {(r.word, r.bits) for r in merged.collect()}
    want = {(r.word, r.bits) for r in whole.collect()}
    assert got == want


def test_bloom_fp_rate_reasonable_when_loaded(spark):
    # 256 members in 1024 bits, 3 hashes -> theoretical fp ~ 27%; assert
    # sane band (one-sided guarantee is exact, fp just shouldn't explode)
    members = _keys(spark, list(range(0, 512, 2)))
    bloom = sketches.bloom_build(members, "k", num_bits=1 << 10, num_hashes=3)
    flags = sketches.bloom_might_contain(
        _keys(spark, list(range(512, 2512))), bloom, "k", num_bits=1 << 10, num_hashes=3
    )
    fp = flags.filter("might_contain").count() / 2000
    assert fp < 0.6


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    # group 'small' has 30 < k distinct -> exact; 'big' has 5000 -> ~1/sqrt(k) error
    rows = [("small", v) for v in range(30)] + [("big", v) for v in range(10_000, 15_000)]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = sketches.kmv_build(df, "v", "g", k=64)
    est = {r.grp: r.est_distinct for r in sketches.kmv_estimate(sk, k=64).collect()}
    assert est["small"] == 30.0
    assert abs(est["big"] - 5000) / 5000 < 0.5  # 1/sqrt(63) ~ 0.13, loose band


def test_kmv_merge_equals_whole_build(spark):
    a = spark.createDataFrame([("g", v) for v in range(0, 400, 2)], "g string, v long")
    b = spark.createDataFrame([("g", v) for v in range(100, 500, 3)], "g string, v long")
    merged = sketches.kmv_merge(
        sketches.kmv_build(a, "v", "g"), sketches.kmv_build(b, "v", "g")
    )
    whole = sketches.kmv_build(a.unionAll(b), "v", "g")
    got = {(r.grp, r.pos, r.hv) for r in merged.collect()}
    want = {(r.grp, r.pos, r.hv) for r in whole.collect()}
    assert got == want
