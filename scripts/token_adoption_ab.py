"""Persisted-token-stream adoption A/B (VERDICT r12 ask #6): the
re-tokenizing text lanes (q_simhash, q_bm25, q_inverted_index,
q_skipgram_pmi) split documents.text per run while the near-dup lanes
already amortize their shingle/anchor relations into persisted bucketed
tables. Is the TOKEN stream worth persisting too?

Hypothesis to test, not assume: tokenization is ONE regex pass over a
string the scan already decoded — a persisted token-array column must
be read and deserialized (list<string> is wider on disk than the text
it came from), so adoption only wins if the split is the bottleneck.
The verdict's bar: adopt a lane only if its sf1.0 wall drops >= 1.5x;
otherwise record the measured rows and keep the inline tokenize.

Per lane this script measures, same session, interleaved A/B/A/B:
  A = the registered lane exactly as shipped (QUERIES[key]);
  B = the identical plan reading the persisted token-array table
      b_tok_arrays_{tag} (doc_id, tk) instead of re-splitting text.
The B variants re-state only the tokenize step; every downstream
expression is shared with the lane via the package helpers.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1.0 python scripts/token_adoption_ab.py
Output: one JSON line per measurement on stdout.

OUTCOME (r13, recorded in SCALE_STUDY_sf1.json r13_lanes): steady-state
second iterations at sf1.0 measured q_bm25 4.88 -> 0.83 s, q_simhash
5.20 -> 0.97 s, q_skipgram_pmi 9.42 -> 2.05 s, q_inverted_index 5.02 ->
2.25 s — every lane past the 1.5x bar, build cost 11.7 s one-time — so
all four registered lanes ADOPTED the persisted table
(queries_text.ensure_token_base). Re-running this script now measures
adopted-vs-adopted (the "registered" arm reads the same table); the
pre-adoption numbers above are the historical A/B.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_study import stage_totals  # noqa: E402
from automated_property_data_ingestion_document_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1.0")


def emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)


def measured(spark, fn):
    pre = stage_totals(spark)
    t0 = time.perf_counter()
    res = fn()
    sec = round(time.perf_counter() - t0, 3)
    post = stage_totals(spark)
    mb = lambda a, b: round((b - a) / 1e6, 1)  # noqa: E731
    return sec, mb(pre[0], post[0]), res


def ensure_tok_arrays(spark) -> str:
    """The production table (queries_text.ensure_token_base) — the
    script shares the lanes' stamp so A/B runs never thrash the
    warehouse build."""
    from automated_property_data_ingestion_document_pipeline_spark.plans.queries_text import (
        ensure_token_base,
    )

    t0 = time.perf_counter()
    t = ensure_token_base(spark, SF_DIR)
    emit({"step": "build_tok_arrays", "sec": round(time.perf_counter() - t0, 3)})
    return t


def main() -> None:
    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark import catalog
    from automated_property_data_ingestion_document_pipeline_spark.operators import dedup
    from automated_property_data_ingestion_document_pipeline_spark.plans import QUERIES

    spark = get_spark(app_name="apdidp-token-ab")
    spark.sparkContext.setLogLevel("ERROR")
    emit({"sf_dir": SF_DIR})

    # warm scan path
    catalog.load(spark, SF_DIR, "documents").count()
    tok_t = ensure_tok_arrays(spark)
    toks_tbl = spark.table(tok_t)

    def run_pair(key: str, variant_df_fn) -> None:
        for which, fn in (
            ("registered", lambda: QUERIES[key](spark, SF_DIR)),
            ("tok_table", variant_df_fn),
            ("registered", lambda: QUERIES[key](spark, SF_DIR)),
            ("tok_table", variant_df_fn),
        ):
            df = fn()
            sec, sh_mb, n = measured(
                spark, lambda: df.agg(F.count("*").alias("n")).collect()[0]["n"]
            )
            emit({"key": key, "which": which, "sec": sec, "shuffle_mb": sh_mb, "rows": n})

    # -- q_simhash: tokenize -> 2-shingles -> packed majority agg -----
    def simhash_b():
        return dedup.simhash64_df(
            toks_tbl.withColumnRenamed("tk", "_pretk"),
            id_col="doc_id",
            shingle_k=2,
            tokens_col="_pretk",
        )

    run_pair("q_simhash", simhash_b)

    # -- q_inverted_index / q_bm25: shared below-tokenize helpers ----
    from automated_property_data_ingestion_document_pipeline_spark.plans.queries_search import (
        _bm25_from_tk,
        _inverted_from_tk,
    )

    run_pair("q_inverted_index", lambda: _inverted_from_tk(toks_tbl))
    run_pair("q_bm25", lambda: _bm25_from_tk(toks_tbl))

    # -- q_skipgram_pmi ---------------------------------------------
    def pmi_b():
        from automated_property_data_ingestion_document_pipeline_spark.plans.queries_text import (
            _skipgram_pmi_from_toks,
        )

        return _skipgram_pmi_from_toks(toks_tbl.select(F.col("tk")))

    run_pair("q_skipgram_pmi", pmi_b)


if __name__ == "__main__":
    main()
