"""Training-data preparation operators (operators/training.py):
quantization fidelity, packing bounds, PII golden cases, contamination
on a crafted corpus, stratified quotas."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.operators import training


def test_quantize_roundtrip_error_bounded(spark):
    rng = np.random.RandomState(5)
    vecs = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    out = training.quantize_embeddings(df).collect()
    orig = dict(vecs)
    for r in out:
        assert max(abs(q) for q in r["qvec"]) == 127  # max component hits full range
        deq = np.array(r["qvec"]) / r["scale"]
        err = np.abs(deq - np.array(orig[r["vec_id"]], dtype=np.float64))
        assert err.max() <= 0.5 / r["scale"] + 1e-9  # half-step quantization bound


def test_pack_sequences_respects_doc_boundaries(spark):
    # 3 docs of 10 tokens in one shard with 16-token bins: doc starting
    # before the boundary overflows its bin, never splits
    docs = [(i * 8, " ".join(["w"] * 10)) for i in range(3)]  # ids 0,8,16 → shard 0
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r["pack_id"] for r in training.pack_sequences(df, bin_tokens=16).collect()}
    # starts: 0, 10, 20 → bins 0, 0, 1
    assert out == {0: 0, 8: 0, 16: 1}


def test_scrub_pii_golden(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.co or call 555-867-5309 now")],
        "id bigint, t string",
    )
    out = df.select(training.scrub_pii(F.col("t")).alias("c")).first()["c"]
    assert out == "mail <EMAIL> or call <PHONE> now"


def test_contamination_flags_crafted(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "xx alpha beta gamma delta epsilon yy"),  # shares 5-gram windows
            (11, "totally different words here entirely now"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["n_shared_shingles"] for r in
           training.contamination_flags(corpus, bench, shingle_k=5).collect()}
    assert 10 in out and out[10] >= 1
    assert 11 not in out


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    a = training.stratified_sample(df, "lang", "doc_id", quota=10)
    b = training.stratified_sample(df, "lang", "doc_id", quota=10)
    ra = sorted((r["lang"], r["doc_id"]) for r in a.collect())
    rb = sorted((r["lang"], r["doc_id"]) for r in b.collect())
    assert ra == rb  # deterministic
    per = {}
    for lang, _ in ra:
        per[lang] = per.get(lang, 0) + 1
    assert per == {"en": 10, "de": 10}


def test_domain_mix_and_split_rates_converge(spark, sf_dir):
    """Statistical sanity beyond the oracle: md5-threshold sampling must
    actually deliver the configured rates (0.75 even / 0.25 odd
    sources; 90/5/5 split) within binomial tolerance."""
    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark import catalog
    from automated_property_data_ingestion_document_pipeline_spark.plans.registry import QUERIES

    d = catalog.load(spark, sf_dir, "documents")
    total = d.count()
    by_parity = {
        r["p"]: r["n"]
        for r in d.groupBy(
            (F.substring("source", 4, 10).cast("int") % 2).alias("p")
        ).agg(F.count("*").alias("n")).collect()
    }
    kept = QUERIES["q_domain_mix"](spark, sf_dir)
    kept_parity = {
        r["p"]: r["n"]
        for r in kept.groupBy(
            (F.substring("source", 4, 10).cast("int") % 2).alias("p")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert abs(kept_parity.get(0, 0) / by_parity[0] - 0.75) < 0.08
    assert abs(kept_parity.get(1, 0) / by_parity[1] - 0.25) < 0.08

    splits = QUERIES["q_dataset_split"](spark, sf_dir)
    per = {
        r["split"]: r["n"]
        for r in splits.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    assert abs(per.get("train", 0) / total - 0.90) < 0.06
    assert abs(per.get("val", 0) / total - 0.05) < 0.04
    assert abs(per.get("test", 0) / total - 0.05) < 0.04
