"""Behavioral-path analytics: Markov transition matrix and session
entry paths over the event stream.

The reference's wizard replays one user's step sequence imperatively
(App.js step machine); these keys compute the population-level
structure of ALL sequences — the transition probabilities that power
Markov attribution / next-action prediction, and the top entry paths
a funnel designer reads first.

Exactness: transition probabilities are c(a→b)/c(a→·) — integer counts
from one lag window, per-prefix totals as an unordered window over the
TRANSITION table (|types|² rows), one IEEE division. Entry paths are
deterministic strings built from the first three events in
(ts, event_id) order — no floats at all.

Scale: both keys shuffle ONCE on user_id (the lag window and the
per-session collect ride the same hash partitioning); everything after
operates on aggregate tables bounded by the type alphabet, not the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query


@query(
    "q_markov_transitions",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    t AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM ev WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
           CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM t
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior:
    P(next event type | current type), estimated over every adjacent
    pair in each user's time-ordered stream. One shuffle on user_id for
    the lag window, one partial-agg to the |types|² transition table,
    then the row-normalizing total as an unordered window over that
    tiny table. The Markov-chain attribution / next-action primitive."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = e.withColumn("prev_type", F.lag("event_type").over(w))
    t = (
        ev.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    n_from = F.sum("n").over(Window.partitionBy("prev_type")).cast("bigint")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        n_from.alias("n_from"),
        (F.col("n").cast("double") / n_from.cast("double")).alias("p"),
    )


@query(
    "q_session_paths",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS entry_path
        FROM ev WHERE rn <= 3
        GROUP BY user_id
    )
    SELECT entry_path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths
    GROUP BY entry_path
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top entry paths: each user's first three event types joined as
    'a>b>c', counted across the population — what a funnel designer
    reads before drawing the funnel. The per-user rank and the path
    assembly ride ONE hash exchange on user_id (rank window →
    rn ≤ 3 filter → sorted-struct collect); the final count aggregates
    the path table (alphabet-bounded). Path strings are deterministic:
    collect_list order is pinned by sorting structs keyed on rn."""
    e = catalog.load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    paths = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("entry_path")
    )
    return paths.groupBy("entry_path").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
