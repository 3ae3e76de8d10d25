"""The local twin of the driver's correctness gate: run every registered
query at sf0.001 through Spark AND its DuckDB oracle, then compare
row-count, column names, and values exactly (columns sorted by name, rows
sorted by all columns — the driver's order-insensitive hash, but with
readable diffs on failure)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from automated_property_data_ingestion_document_pipeline_spark.plans import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df):
    """Sort columns by name, rows by every column; stringify for a
    hash-like comparison that still diffs readably."""
    cols = sorted(df.columns)
    out = df[cols].copy()

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.1f}"
            return repr(v)
        return str(v)

    for c in cols:
        out[c] = out[c].map(canon)
    out = out.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return out


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_parity(spark, duck, key):
    sdf = QUERIES[key](spark, SF_DIR).toPandas()
    odf = duck.execute(ORACLES[key]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{key}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{key}: row count spark={len(sdf)} oracle={len(odf)}"
    ns, no = normalize(sdf), normalize(odf)
    if not ns.equals(no):
        diff_mask = (ns != no).any(axis=1)
        raise AssertionError(
            f"{key}: value mismatch; first diffs:\n"
            f"spark:\n{ns[diff_mask].head(5)}\noracle:\n{no[diff_mask].head(5)}"
        )


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, key):
    df = QUERIES[key](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "r_name",
        "n_name",
        "n_orders",
        "total_fees",
        "total_fees_fmt",
        "latest_order_fmt",
    ]


def test_embedding_neardup_granularity_knob_parity(spark, duck):
    """Finding 79's granularity knob: the lane at planes=5 (a NON-default
    value, so this can't pass by accident of the registered key) must
    match the parameterized oracle generator at the same plane count —
    proving the knob changes only granularity, never the algorithm."""
    from automated_property_data_ingestion_document_pipeline_spark.plans.queries_neardup import (
        _ndp_oracle,
        embedding_neardup_portable_lane,
    )

    sdf = embedding_neardup_portable_lane(spark, SF_DIR, planes=5).toPandas()
    odf = duck.execute(_ndp_oracle(planes=5)).fetchdf()
    assert len(sdf) == len(odf) == 32  # 2^5 buckets, all occupied at sf0.001
    assert normalize(sdf).equals(normalize(odf))


def test_vertical_tab_document_tokenizes_identically(spark, tmp_path):
    """r10 review finding: Java regex \\s includes \\x0B, DuckDB's RE2
    \\s does not — every tokenizer site now spells the explicit class
    [ \\t\\n\\x0B\\f\\r]+ so both engines read the same token stream. This
    pins it with the one corpus the sf corpora never contain: a
    vertical-tab document, run through a _TOKS_SQL-based lane
    (q_wordcount) end to end on both engines."""
    import duckdb
    import pandas as pd

    from automated_property_data_ingestion_document_pipeline_spark.plans import ORACLES, QUERIES

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["alpha\x0bbeta  gamma", "alpha beta\tgamma\x0b\x0bdelta"],
            "lang": ["en", "en"],
            "source": ["t", "t"],
            "n_chars": [0, 0],
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    # q_wordcount exercises _TOKS_SQL; q_token_count_bpe exercises
    # BPE_PIECE_RE (whose negated class also had the \s divergence)
    for key in ("q_wordcount", "q_token_count_bpe"):
        sdf = QUERIES[key](spark, sf).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
        ns, no = normalize(sdf), normalize(odf)
        assert ns.equals(no), f"{key}\nspark:\n{ns}\noracle:\n{no}"
    con.close()
