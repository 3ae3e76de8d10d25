"""The wizard step state machine (SURVEY §2.7 T1, §4.3 #3) as a custom
stateful operator.

The reference keeps a per-user ``step`` (1-4) with clamped transitions
(App.js:252: advance/retreat clamped at 706/720), persists it across
requests (sessionStorage ``thg_session_v1``), and aborts stale flows.
Two faithful Spark forms:

- **Streaming**: ``transformWithStateInPandas`` keyed by user — real
  value-state per key, the Spark-4 replacement for arbitrary stateful
  processing. State size is O(keys), partitioned by user → scales
  horizontally with executors.
- **Batch replay**: ``applyInPandas`` per user replays the event log in
  time order through the same transition function — used for backfill
  and as the differential check of the streaming operator.

Event→transition mapping on the generic corpus stream: signup=start(1),
view=advance, click=advance, purchase=submit (complete at step 4),
error=abort (reset). Transitions clamp to [1, 4] like the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = (
    "user_id bigint, outcome string, final_step int, n_events bigint, "
    "started_ts timestamp, ended_ts timestamp"
)

# step transition per event type; clamped to [1,4] (App.js:706/720)
_ADVANCE = {"signup": 1, "view": 1, "click": 1, "purchase": 1}


def _replay(events: pd.DataFrame) -> list[tuple]:
    """Replay one user's ordered events through the clamped step machine;
    emit one row per completed or aborted wizard run."""
    out = []
    step, n, start = 0, 0, None
    uid = int(events["user_id"].iloc[0])
    # itertuples over the two needed columns: ~5× cheaper than iterrows
    # (no per-row Series construction) — the replay is inherently
    # sequential, so row-iteration cost IS the operator cost.
    last_ts = None
    for et, ts_ in zip(events["event_type"].to_numpy(), events["ts"].to_numpy()):
        last_ts = ts_
        if start is None:
            start = ts_
        n += 1
        if et == "error":
            out.append((uid, "aborted", step, n, start, ts_))
            step, n, start = 0, 0, None
            continue
        step = min(step + _ADVANCE.get(et, 0), 4)
        if step >= 4:
            out.append((uid, "completed", step, n, start, ts_))
            step, n, start = 0, 0, None
    if n > 0:
        out.append((uid, "in_progress", step, n, start, last_ts))
    return out


def wizard_outcomes_batch(events: DataFrame) -> DataFrame:
    """Batch replay via applyInPandas: one group per user, events sorted
    by (ts, event_id) inside the group. One shuffle on user_id; group
    state is O(1) — holds at any scale with bounded per-user history."""

    def _per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        return pd.DataFrame(
            _replay(pdf),
            columns=["user_id", "outcome", "final_step", "n_events", "started_ts", "ended_ts"],
        )

    return events.groupBy("user_id").applyInPandas(_per_user, OUTPUT_SCHEMA)


def has_transform_with_state_runtime() -> bool:
    """transformWithStateInPandas needs protobuf in the Python runtime
    (its driver-worker protocol); absent in this container → the
    applyInPandasWithState form below is the portable default."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def wizard_outcomes_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming form via ``applyInPandasWithState``: per-key group state
    carrying (step, n, start_us). Emits completed/aborted runs as they
    happen; in-progress state stays in the store (bounded by key count;
    a state timeout would give the reference's abort-on-timeout
    semantics, App.js:142-147)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_struct = StructType(
        [
            StructField("user_id", LongType()),
            StructField("outcome", StringType()),
            StructField("final_step", IntegerType()),
            StructField("n_events", LongType()),
            StructField("started_ts", TimestampType()),
            StructField("ended_ts", TimestampType()),
        ]
    )
    # timestamps stored as epoch-micros longs: group state tuples are
    # plain python values, keep them primitive
    state_struct = StructType(
        [
            StructField("step", IntegerType()),
            StructField("n", LongType()),
            StructField("start_us", LongType()),
        ]
    )

    def _to_us(ts) -> int:
        return int(pd.Timestamp(ts).value // 1000)

    def _from_us(us: int):
        return pd.Timestamp(us * 1000)

    def process(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        uid = key[0]
        step, n, start_us = state.get() if state.exists else (0, 0, -1)
        batch = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        out = []
        for et, ts_ in zip(batch["event_type"].to_numpy(), batch["ts"].to_numpy()):
            if start_us < 0:
                start_us = _to_us(ts_)
            n += 1
            if et == "error":
                out.append((uid, "aborted", step, n, _from_us(start_us), ts_))
                step, n, start_us = 0, 0, -1
                continue
            step = min(step + _ADVANCE.get(et, 0), 4)
            if step >= 4:
                out.append((uid, "completed", step, n, _from_us(start_us), ts_))
                step, n, start_us = 0, 0, -1
        state.update((step, n, start_us))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "outcome", "final_step", "n_events", "started_ts", "ended_ts"],
            )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        process, out_struct, state_struct, "append", GroupStateTimeout.NoTimeout
    )


def wizard_outcomes_stream_tws(events_stream: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` form (value state per key).
    Requires protobuf in the Python runtime
    (:func:`has_transform_with_state_runtime`) and the RocksDB state
    store; functionally identical to :func:`wizard_outcomes_stream`."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (  # noqa: F401 (used below)
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    out_struct = StructType(
        [
            StructField("user_id", LongType()),
            StructField("outcome", StringType()),
            StructField("final_step", IntegerType()),
            StructField("n_events", LongType()),
            StructField("started_ts", TimestampType()),
            StructField("ended_ts", TimestampType()),
        ]
    )
    state_struct = StructType(
        [
            StructField("step", IntegerType()),
            StructField("n", LongType()),
            StructField("start", TimestampType()),
        ]
    )

    # transformWithState requires the RocksDB state store (the HDFS-backed
    # default store doesn't implement the new multi-state API).
    events_stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class WizardProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("wizard", state_struct)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            uid = key[0]
            if self.state.exists():
                step, n, start = self.state.get()
            else:
                step, n, start = 0, 0, None
            batch = pd.concat(list(rows), ignore_index=True).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            out = []
            for _, e in batch.iterrows():
                if start is None:
                    start = e["ts"]
                n += 1
                if e["event_type"] == "error":
                    out.append((uid, "aborted", step, n, start, e["ts"]))
                    step, n, start = 0, 0, None
                    continue
                step = min(step + _ADVANCE.get(e["event_type"], 0), 4)
                if step >= 4:
                    out.append((uid, "completed", step, n, start, e["ts"]))
                    step, n, start = 0, 0, None
            self.state.update((step, n, start))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "user_id", "outcome", "final_step", "n_events", "started_ts", "ended_ts",
                    ],
                )

        def close(self) -> None:
            pass

    return events_stream.groupBy("user_id").transformWithStateInPandas(
        WizardProcessor(),
        outputStructType=out_struct,
        outputMode="Append",
        timeMode="None",
    )
