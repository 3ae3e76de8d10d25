"""Lineage truncation for iterative operators — local by default,
RELIABLE when the session has a checkpoint directory.

The iterative operators (connected components, PageRank, label
propagation) must cut lineage every round or the plan tree doubles per
iteration. ``localCheckpoint`` does that with executor-local storage —
right for local mode and cheap everywhere — but on a real cluster a
lost executor invalidates locally-checkpointed partitions and fails the
job mid-iteration. The 100 TB deployment rule used to be prose
("flip localCheckpoint to checkpoint"); r10 (verdict ask #6) makes the
operator flip itself: when the SparkContext HAS a checkpoint dir
(``sc.setCheckpointDir(...)`` or the ``spark.checkpoint.dir`` conf, the
thing any production session sets), :func:`cut_lineage` uses the
reliable ``checkpoint``; otherwise today's ``localCheckpoint``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def has_checkpoint_dir(df: DataFrame) -> bool:
    """True when the owning SparkContext has a (reliable) checkpoint
    directory configured."""
    sc = df.sparkSession.sparkContext
    try:
        return sc._jsc.sc().getCheckpointDir().isDefined()
    except Exception:  # py4j surface changed — fail toward local
        return False


def cut_lineage(df: DataFrame, eager: bool = True, durable: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint`` when the
    session has a checkpoint dir, ``localCheckpoint`` otherwise. Same
    eager/lazy semantics as the underlying calls.

    ``durable=False`` pins ``localCheckpoint`` even under a checkpoint
    dir — for TRANSIENT per-query cuts whose purpose is consistent
    REUSE of a nondeterministic subtree (a sampled range partitioning,
    a rollup read twice), not cross-failure durability. Reliable
    checkpoints there would cost an extra write job per query and
    accumulate rdd-*/ scratch on the checkpoint filesystem
    (``spark.cleaner.referenceTracking.cleanCheckpoints`` defaults to
    false) for no recovery benefit: losing a localCheckpoint block
    mid-QUERY fails that one query, which the caller simply retries.
    Iterative operators (PageRank, connected components, k-means) keep
    the durable default — an executor loss there wastes the whole
    multi-round run, which IS the failure reliable checkpoints exist
    to survive. Production sessions that enable durable cuts should
    also set ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
    so out-of-scope checkpoint dirs are reclaimed."""
    if durable and has_checkpoint_dir(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
