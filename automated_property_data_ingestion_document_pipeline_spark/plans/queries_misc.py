"""Remaining aggregate/reshape vocabulary: unpivot (wide→long),
collected-set aggregation (deterministically ordered), boolean and
bitwise aggregates, array set operations. Map-typed outputs are
deliberately absent from the oracle surface: Spark and DuckDB stringify
maps differently ({x -> 1} vs {x=1}); map semantics are covered by the
array/struct paths instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.functions.text import STOPWORDS
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query

# -- unpivot / melt ------------------------------------------------------------


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, field, val
    FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_d, p_retailprice FROM part)
    UNPIVOT (val FOR field IN (size_d, p_retailprice))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): part measures into (field, val)
    rows — a Generate, no shuffle, row count × number of measures.
    NULL measures are dropped (standard melt semantics and DuckDB
    UNPIVOT's default; Spark's unpivot keeps them, so filter)."""
    p = catalog.load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_d"),
        "p_retailprice",
    )
    return p.unpivot(["p_partkey"], ["size_d", "p_retailprice"], "field", "val").filter(
        F.col("val").isNotNull()
    )


# -- collected-set aggregation -------------------------------------------------


@query(
    "q_collect_agg",
    oracle="""
    SELECT lang,
           array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def q_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set collection per group, emitted as a SORTED joined string —
    collect_set order is nondeterministic by contract, so determinism
    comes from sort_array before join (same rule as every rank
    tiebreak)."""
    d = catalog.load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.countDistinct("source").alias("n_sources"),
    )


# -- boolean aggregates --------------------------------------------------------


@query(
    "q_bool_agg",
    oracle="""
    SELECT event_type,
           bool_and(value > 1) AS all_above_1,
           bool_or(value > 190) AS any_above_190
    FROM events GROUP BY event_type
    """,
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal/existential aggregates (the all()/any() config
    completeness checks of app.py:131-133 as group predicates)."""
    ev = catalog.load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 1).alias("all_above_1"),
        F.bool_or(F.col("value") > 190).alias("any_above_190"),
    )


# -- bitwise aggregates --------------------------------------------------------


@query(
    "q_bitwise_agg",
    oracle="""
    SELECT user_id,
           CAST(bit_and(TRY_CAST(CASE WHEN json_valid(props) AND json_type(json(props), '$.k') IN ('BIGINT', 'UBIGINT') THEN props->>'k' END AS INTEGER)) AS BIGINT) AS k_and,
           CAST(bit_or(TRY_CAST(CASE WHEN json_valid(props) AND json_type(json(props), '$.k') IN ('BIGINT', 'UBIGINT') THEN props->>'k' END AS INTEGER)) AS BIGINT) AS k_or,
           CAST(bit_xor(TRY_CAST(CASE WHEN json_valid(props) AND json_type(json(props), '$.k') IN ('BIGINT', 'UBIGINT') THEN props->>'k' END AS INTEGER)) AS BIGINT) AS k_xor
    FROM events GROUP BY user_id
    """,
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise fold aggregates over the JSON payload field — exact
    integer ops, order-independent by algebra."""
    ev = catalog.load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return ev.groupBy("user_id").agg(
        F.bit_and(k).cast("bigint").alias("k_and"),
        F.bit_or(k).cast("bigint").alias("k_or"),
        F.bit_xor(k).cast("bigint").alias("k_xor"),
    )


# -- array set operations ------------------------------------------------------

_STOP_EN = STOPWORDS["en"]


@query(
    "q_array_set_ops",
    oracle=f"""
    SELECT doc_id,
           array_to_string(list_sort(list_filter(list_distinct(string_split(text, ' ')),
               x -> NOT list_contains({_STOP_EN!r}, x))), ' ') AS content_words,
           array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique
    FROM documents WHERE doc_id < 50
    """,
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: stopword removal (set difference), slicing,
    distinct cardinality — emitted as sorted joined strings for
    cross-engine comparability."""
    d = catalog.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.array_except(F.array_distinct(toks), F.lit(_STOP_EN))), " "
        ).alias("content_words"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
    )


# -- custom UDAF (grouped-agg pandas_udf) --------------------------------------


@query(
    "q_custom_udaf",
    oracle="""
    SELECT lang,
           CAST((list(n_chars ORDER BY n_chars DESC)
                 FILTER (n_chars IS NOT NULL))[2] AS BIGINT) AS second_max_chars
    FROM documents GROUP BY lang
    """,
)
def q_custom_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL user-defined aggregate (SURVEY §2.8 UDAF row): grouped-agg
    ``pandas_udf`` computing each language's second-largest document
    length. Arrow ships each group's column as one numpy-backed Series
    — the right UDAF boundary (no per-row Python). Integer-exact
    selection (no float arithmetic), so the oracle is engine-portable.
    At scale: grouped-agg UDAFs shuffle full groups to their aggregator
    (no partial aggregation) — reserve the form for aggregates Spark
    can't express; second-max is deliberately simple here to pin the
    API surface, and the built-in alternative (two-pass max or a ranked
    window) is the production path documented in PERFORMANCE.md."""
    @F.pandas_udf("bigint")
    def second_max(v: pd.Series) -> int:  # None return = NULL
        v = v.dropna().sort_values(ascending=False)
        return int(v.iloc[1]) if len(v) >= 2 else None

    d = catalog.load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(second_max("n_chars").alias("second_max_chars"))
