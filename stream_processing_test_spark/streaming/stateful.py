"""Custom stateful streaming operator: consecutive-failure streak
detection via ``applyInPandasWithState``.

The reference's closest analog is the "all sources of this program are
failing" report (StreamTest.cpp:626-638) — a batch re-scan. The
streaming-native form tracks, per source, the running streak of error
events and emits a record the moment a streak ENDS (a success arrives),
without rescanning history: state per key is three integers, not the
day's events.

This is the one operator class where Spark's built-in windowed
aggregation genuinely cannot express the semantics (streak boundaries
depend on event ORDER, not time buckets), hence
``applyInPandasWithState`` (SURVEY.md §2.9): Arrow-batched, grouped
state, user-defined per-group transition function.

Scale: state is O(1) per source (three longs); keys shard across
executors by hash. The transition function walks each group's batch
rows once in sequence order — no cross-key coordination.

Ordering contract: within a micro-batch, rows for a key are sorted by
``event_id`` before the walk; ACROSS micro-batches the source must
deliver in order (true for the probe connector's append log and for
Kafka per-partition order; the tests feed ordered file chunks).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from stream_processing_test_spark.registry import register

MIN_STREAK = 3

STREAK_SCHEMA = (
    "user_id BIGINT, streak_len BIGINT, start_event_id BIGINT, end_event_id BIGINT"
)
STATE_SCHEMA = "streak_len BIGINT, start_event_id BIGINT, last_event_id BIGINT"


def _streak_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Transition function: walk this key's new rows in event order,
    maintaining (streak_len, start_event_id, last_event_id); emit one
    output row per closed streak of length >= MIN_STREAK."""
    (user_id,) = key
    if state.exists:
        streak_len, start_id, last_id = state.get
    else:
        streak_len, start_id, last_id = 0, 0, 0

    out: list[dict[str, Any]] = []
    # applyInPandasWithState may deliver one key's micro-batch as several
    # Arrow chunks (~10k rows each) with no ordering guarantee; sorting
    # per-chunk would split streaks that span a chunk boundary, so the
    # whole key-batch must be ordered before the walk. Cost discipline
    # (this ordering fix was the one measured r2->r3 perf regression,
    # BENCH_NOTES): only the two needed columns leave pandas (numpy
    # views, no full-frame concat/sort_values), and the O(n log n)
    # argsort runs ONLY when a boundary is actually violated — chunk
    # concatenation order is already correct for in-order sources (file
    # replay, Kafka per-partition), making the common case one O(n)
    # monotonicity scan. State stays O(1); the transient arrays are
    # bounded by one key's rows in one micro-batch.
    import numpy as np

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        if len(chunks) == 1:
            eids = chunks[0]["event_id"].to_numpy()
            etypes = chunks[0]["event_type"].to_numpy()
        else:
            eids = np.concatenate([c["event_id"].to_numpy() for c in chunks])
            etypes = np.concatenate(
                [c["event_type"].to_numpy() for c in chunks]
            )
        if len(eids) > 1 and not (eids[1:] >= eids[:-1]).all():
            order = np.argsort(eids, kind="stable")
            eids = eids[order]
            etypes = etypes[order]
        for eid, etype in zip(eids, etypes):
            if etype == "error":
                if streak_len == 0:
                    start_id = int(eid)
                streak_len += 1
                last_id = int(eid)
            else:
                if streak_len >= MIN_STREAK:
                    out.append(
                        {
                            "user_id": int(user_id),
                            "streak_len": streak_len,
                            "start_event_id": start_id,
                            "end_event_id": last_id,
                        }
                    )
                streak_len, start_id, last_id = 0, 0, 0
    state.update((streak_len, start_id, last_id))
    if out:
        yield pd.DataFrame(out)


def failure_streaks(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of closed error streaks (length >=
    MIN_STREAK) per source. ``events`` must be a streaming DataFrame
    with (user_id, event_id, event_type)."""
    from stream_processing_test_spark.session import ensure_package_shipped

    ensure_package_shipped(events.sparkSession)
    return (
        events.select("user_id", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _streak_fn,
            outputStructType=STREAK_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class JvmStreaksForeachBatch:
    """The A/B twin of :func:`failure_streaks` (VERDICT r9 item 6): the
    same closed-streak semantics computed per micro-batch with JVM
    window functions (the islands trick — zero Python in the per-event
    path) inside ``foreachBatch``, stitched across batch boundaries by
    a driver-carried per-key (streak_len, start, last) dict.

    Per batch, everything event-proportional is JVM: islands → maximal
    error runs → interior runs (neither at the key's batch start nor
    end — closed, carry-independent, emitted distributed). Only the
    per-key BOUNDARY rows come to the driver (one row per key in the
    batch: its leading and trailing error runs, if any) for the
    carry merge — O(|keys|) Python per batch, not O(|events|).

    The architectural trade vs applyInPandasWithState, recorded with
    the A/B numbers in BENCH_SCALE/BENCH_NOTES: state here is
    DRIVER-HELD (a dict + a |keys|-row collect per batch), so it
    deploys only while keys-per-driver is comfortable and it abandons
    the state store's checkpoint/recovery contract — the Python-state
    form keeps state executor-sharded and recoverable. This class
    exists to price the Python tax, not to replace the operator.

    Ordering contract is the operator's: per-key event_id order within
    a batch is established by the window sort; ACROSS batches the
    source must deliver in order (file replay with whole files per
    batch, Kafka per-partition)."""

    def __init__(
        self, min_streak: int = MIN_STREAK, collect_output: bool = False
    ):
        self.min_streak = min_streak
        self.state: dict[int, tuple[int, int, int]] = {}
        self.collected: list[tuple] | None = [] if collect_output else None
        self.rows_emitted = 0

    def _emit_interior(self, df: DataFrame) -> None:
        if self.collected is not None:
            rows = df.collect()
            self.collected.extend(
                (
                    r["user_id"],
                    r["streak_len"],
                    r["start_event_id"],
                    r["end_event_id"],
                )
                for r in rows
            )
            self.rows_emitted += len(rows)
        else:
            self.rows_emitted += df.count()

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        b = batch.select("user_id", "event_id", "event_type")
        w = Window.partitionBy("user_id").orderBy("event_id")
        we = Window.partitionBy("user_id", "is_error").orderBy("event_id")
        islands = b.withColumn(
            "is_error", (F.col("event_type") == "error").cast("int")
        ).withColumn("grp", F.row_number().over(w) - F.row_number().over(we))
        # bounds is |keys|-sized and feeds both the runs join and the
        # per-key boundary frame — persisted so the second action
        # doesn't re-scan the batch for it (same reason as runs below)
        bounds = b.groupBy("user_id").agg(
            F.min("event_id").alias("k_first"),
            F.max("event_id").alias("k_last"),
        ).persist()
        runs = (
            islands.filter("is_error = 1")
            .groupBy("user_id", "grp")
            .agg(
                F.count("*").alias("len"),
                F.min("event_id").alias("start"),
                F.max("event_id").alias("end"),
            )
            .join(bounds, "user_id")
            .withColumn("leads", F.col("start") == F.col("k_first"))
            .withColumn("trails", F.col("end") == F.col("k_last"))
        )
        # runs feeds TWO actions (the interior emit and the per-key
        # boundary collect); without a persist the whole
        # scan→windows→groupBy lineage executes twice per batch —
        # which doubled the distributed cost this A/B exists to
        # measure. Freed before the callback returns.
        runs = runs.persist()
        # interior runs: maximal error runs not touching either batch
        # boundary of their key — the NEXT key event exists and is a
        # non-error (runs are maximal), so they are closed and
        # carry-independent. Emitted without driver involvement.
        self._emit_interior(
            runs.filter(
                (~F.col("leads"))
                & (~F.col("trails"))
                & (F.col("len") >= self.min_streak)
            ).select(
                "user_id",
                F.col("len").alias("streak_len"),
                F.col("start").alias("start_event_id"),
                F.col("end").alias("end_event_id"),
            )
        )
        lead = runs.filter("leads").select(
            "user_id",
            F.col("len").alias("lead_len"),
            F.col("start").alias("lead_start"),
            F.col("end").alias("lead_end"),
            F.col("trails").alias("lead_trails"),
        )
        trail = runs.filter(F.col("trails") & ~F.col("leads")).select(
            "user_id",
            F.col("len").alias("tr_len"),
            F.col("start").alias("tr_start"),
            F.col("end").alias("tr_end"),
        )
        per_key = (
            bounds.select("user_id")
            .join(lead, "user_id", "left")
            .join(trail, "user_id", "left")
            .collect()
        )
        runs.unpersist(False)
        bounds.unpersist(False)
        emit: list[tuple[int, int, int, int]] = []
        for r in per_key:
            uid = int(r["user_id"])
            carried = self.state.pop(uid, None)
            has_lead = r["lead_len"] is not None
            if carried is not None:
                if has_lead:
                    mlen = carried[0] + r["lead_len"]
                    if r["lead_trails"]:
                        # the key's whole batch is one error run — the
                        # merged streak stays open, carry it forward
                        self.state[uid] = (mlen, carried[1], r["lead_end"])
                        continue
                    if mlen >= self.min_streak:
                        emit.append((uid, mlen, carried[1], r["lead_end"]))
                elif carried[0] >= self.min_streak:
                    # key's first batch event is a non-error: the
                    # carried streak just closed
                    emit.append((uid, carried[0], carried[1], carried[2]))
            elif has_lead:
                if r["lead_trails"]:
                    self.state[uid] = (
                        r["lead_len"],
                        r["lead_start"],
                        r["lead_end"],
                    )
                    continue
                if r["lead_len"] >= self.min_streak:
                    emit.append(
                        (uid, r["lead_len"], r["lead_start"], r["lead_end"])
                    )
            if r["tr_len"] is not None:
                self.state[uid] = (r["tr_len"], r["tr_start"], r["tr_end"])
        self.rows_emitted += len(emit)
        if self.collected is not None:
            self.collected.extend(emit)


def batch_failure_streaks(events: DataFrame) -> DataFrame:
    """Batch twin for parity tests: the same closed streaks computed
    with the islands trick (rn - rn_within_errors identifies runs of
    consecutive errors), keeping only streaks followed by a later
    non-error event (i.e. CLOSED — matching what the stateful stream
    has emitted by end of input)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    we = Window.partitionBy("user_id", "is_error").orderBy("event_id")
    islands = (
        events.select("user_id", "event_id", "event_type")
        .withColumn("is_error", (F.col("event_type") == "error").cast("int"))
        .withColumn("grp", F.row_number().over(w) - F.row_number().over(we))
    )
    closes = events.filter(F.col("event_type") != "error").groupBy("user_id").agg(
        F.max("event_id").alias("last_success_id")
    )
    streaks = (
        islands.filter(F.col("is_error") == 1)
        .groupBy("user_id", "grp")
        .agg(
            F.count("*").alias("streak_len"),
            F.min("event_id").alias("start_event_id"),
            F.max("event_id").alias("end_event_id"),
        )
        .filter(F.col("streak_len") >= MIN_STREAK)
    )
    return (
        streaks.join(closes, "user_id")
        .filter(F.col("end_event_id") < F.col("last_success_id"))
        .select("user_id", "streak_len", "start_event_id", "end_event_id")
    )


_STREAK_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_id, event_type,
           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_error,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
         - ROW_NUMBER() OVER (PARTITION BY user_id, event_type = 'error' ORDER BY event_id) AS grp
    FROM events
), streaks AS (
    SELECT user_id, grp,
           COUNT(*) AS streak_len,
           MIN(event_id) AS start_event_id,
           MAX(event_id) AS end_event_id
    FROM seq WHERE is_error = 1
    GROUP BY user_id, grp
    HAVING COUNT(*) >= {MIN_STREAK}
), closes AS (
    SELECT user_id, MAX(event_id) AS last_success_id
    FROM events WHERE event_type <> 'error' GROUP BY user_id
)
SELECT CAST(s.user_id AS BIGINT) AS user_id,
       CAST(streak_len AS BIGINT) AS streak_len,
       CAST(start_event_id AS BIGINT) AS start_event_id,
       CAST(end_event_id AS BIGINT) AS end_event_id
FROM streaks s JOIN closes c ON s.user_id = c.user_id
WHERE s.end_event_id < c.last_success_id
"""


@register(
    "streaming_failure_streaks", oracle=_STREAK_ORACLE, survey_ops="§2.9,T4,T6", tier=0)
def streaming_failure_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streak detection run over the events file replayed as
    a stream (availableNow), oracle-checked against the SQL islands
    formulation — custom stateful operator + batch parity in one."""
    from stream_processing_test_spark.streaming.pipeline import events_stream

    # Each state partition spawns a Python worker per micro-batch; with
    # O(thousands) of keys the spawn cost dominates (32 -> 8 partitions
    # measured 4x faster at sf0.01). A real deployment sizes this to
    # keys/executor-memory, not to the relational shuffle width.
    #
    # The stateful operator REQUIRES HashPartitioning(key, shuffle
    # partitions) — a manual repartition(8) upstream would just get a
    # second exchange added back — so the knob must be the conf itself.
    # It is scoped to a CLONED session (same SparkContext/executors,
    # separate SQLConf): concurrent queries on the parent session never
    # observe the override, and there is nothing to restore on exit.
    scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    ev = events_stream(scoped, os.path.join(sf_dir, "events.parquet"))
    name = f"streaks_{abs(hash(sf_dir)) % 10_000}"
    q = (
        failure_streaks(ev)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the memory-sink view lives in the scoped session's catalog
    return scoped.table(name)
