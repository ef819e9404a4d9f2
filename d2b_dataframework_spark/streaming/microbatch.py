"""Structured-Streaming micro-batch layer (SURVEY §2.9).

The reference is strictly batch-pull; its closest streaming analogs are
the daily idempotent re-run (K1/K2) and the incremental engagement cache
(K5). This module exposes the engine's tables through
``readStream``-compatible wrappers so the same transforms run
incrementally:

- file-source streams over the engine's landing directories (schema
  declared, exactly-once per file),
- watermarked event-time windowed KPIs (the streaming twin of
  plans.queries.q_events_daily_kpis),
- ``foreachBatch`` into the date-sharded dynamic-overwrite sink — each
  micro-batch replays the reference's per-day replace semantics, making
  restarts idempotent (checkpoint + dynamic partition overwrite),
- a polling bridge that turns any connector fetch into an incremental
  append stream (rate-source trigger → fetch → dedup against
  already-landed keys — the K5 delta-fetch pattern on a timer).

At scale: watermarks bound state; windowed aggs shuffle once per
micro-batch on (window, keys); the sink writes only the partitions
present in the batch.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery
from pyspark.sql.types import StructType

from d2b_dataframework_spark.sinks.partitioned import write_date_sharded

EVENTS_SCHEMA_DDL = (
    "event_id bigint, user_id bigint, ts timestamp, event_type string, "
    "value double, props string"
)


def stream_files(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream with a declared schema — the landing-zone
    tailer. Each file is processed exactly once (checkpoint tracked)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_kpis(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 day",
    watermark: str = "1 day",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of the daily KPI rollup (A8): watermarked tumbling
    window, decimal-exact sums. Late rows beyond the watermark drop out
    deterministically; state is bounded by (watermark / window) windows
    per key."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("date"),
            "n_events",
            "approx_users",
            "sum_value",
        )
    )


def session_kpis(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``operators.sessions.session_summary``: Spark's
    native ``session_window`` merges events into gap-based sessions
    incrementally — state per (user, open session), closed and emitted
    once the watermark passes the session end. This is the
    scale-correct streaming sessionizer: no applyInPandasWithState
    needed, the merge logic is JVM-side, and state is bounded by the
    watermark horizon.

    Batch/stream parity: on a static frame this produces the same
    per-session boundaries as the batch operator for the same gap
    (session_window's gap is > semantics on merge, matching the batch
    operator's strict-gap boundary).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def to_date_sharded_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    date_col: str = "date",
    output_mode: str = "update",
    merge_keys: list[str] | None = None,
) -> DataStreamWriter:
    """K1 as a streaming sink: every micro-batch lands through the
    date-sharded dynamic partition overwrite — re-emitted windows
    (update mode) REPLACE their day partition, exactly the reference's
    ``if_exists='replace'`` per day. Restart-safe via checkpoint.

    CONTRACT without ``merge_keys``: the aggregation must produce ONE row
    group per date (the ``windowed_kpis`` default — date is the whole
    key). A stream keyed beyond the date (sub-day windows, per-entity
    rows) updates only SOME of a date's rows per batch, and a bare
    partition overwrite would silently drop that date's other rows.
    Pass ``merge_keys`` for such streams: the batch is merged into the
    affected partitions by (date, *merge_keys) — existing rows for other
    keys survive, re-emitted keys are replaced. The merge materializes
    the affected partitions via ``localCheckpoint`` (the K5 pattern,
    sinks.partitioned.upsert_cache) — bounded by the updated partitions'
    size, not the sink's.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = batch_df.withColumn(date_col, F.date_format(F.col(date_col), "yyyy-MM-dd"))
        if merge_keys:
            spark = batch_df.sparkSession
            try:
                spark.catalog.refreshByPath(path)
                existing = spark.read.parquet(path)
                # Semi-join prunes to the batch's partitions (dynamic
                # partition pruning at scale; no driver collect), then
                # anti-join drops the rows this batch replaces.
                keep = (
                    existing.join(
                        out.select(date_col).distinct(), date_col, "left_semi"
                    )
                    .join(
                        out.select(date_col, *merge_keys).distinct(),
                        on=[date_col, *merge_keys],
                        how="left_anti",
                    )
                )
                out = keep.unionByName(out).localCheckpoint(eager=True)
            except AnalysisException:
                pass  # sink not created yet — first batch writes as-is
        write_date_sharded(out, path, date_col=date_col, clean=False)

    return (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
    )


def run_available_now(writer: DataStreamWriter) -> StreamingQuery:
    """Process everything currently available, then stop — the
    batch-equivalent trigger used by tests and backfills."""
    return writer.trigger(availableNow=True).start()


def poll_connector_stream(
    spark: SparkSession,
    fetch_batch,
    schema: StructType | str,
    sink_path: str,
    checkpoint: str,
    key_col: str,
    interval: str = "1 minute",
) -> DataStreamWriter:
    """Polling bridge: on every trigger tick, call ``fetch_batch() ->
    list[dict]`` (a connector page fetch), anti-join keys already landed
    (K5 delta-fetch), append the rest. The rate source provides the
    clock; the data rides in via the driver-side fetch.

    This is the micro-batch form of the reference's cron-style re-pull
    loops — same at-least-once fetch + idempotent landing, but with
    checkpointed scheduling and backpressure for free.

    Dedup state IS the sink: each batch left-anti joins the fetched page
    against the sink's key column (the K5 pattern,
    sinks.partitioned.upsert_cache), so no key set lives in driver
    memory, the state is bounded by the sink itself, and a restarted
    stream — or a second writer — picks up exactly where the files say.
    ``refreshByPath`` before each read keeps the file listing current
    with this stream's own appends. Only ``AnalysisException``
    (sink-not-yet-created) is treated as "nothing landed"; transient
    read errors propagate and fail the batch, so at-least-once retry
    applies instead of silently re-appending duplicates.
    """
    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    def on_tick(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = fetch_batch()
        if not rows:
            return
        fetched = spark.createDataFrame(rows, schema).dropDuplicates([key_col])
        try:
            spark.catalog.refreshByPath(sink_path)
            landed = spark.read.parquet(sink_path).select(key_col)
            fresh = fetched.join(landed, key_col, "left_anti")
        except AnalysisException:  # sink not created yet — first batch
            fresh = fetched
        if fresh.isEmpty():
            return
        fresh.write.mode("append").parquet(sink_path)

    return (
        ticks.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=interval)
        .foreachBatch(on_tick)
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: emit each key once, dropping re-deliveries
    that arrive within the watermark horizon (the at-least-once →
    exactly-once repair stage in front of any streaming sink).

    ``dropDuplicatesWithinWatermark`` is the scale-correct primitive:
    state holds one entry per key and is EVICTED once the watermark
    passes its first-seen event time — unlike a plain
    ``dropDuplicates`` on a streaming frame, whose state grows without
    bound. Duplicates separated by more than the watermark are the
    upstream contract's problem (same convention as the reference's
    engagement cache: d2b_data/facebook_organic.py cache upsert).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def ingest_admission_stream(
    docs_stream: DataFrame,
    sink_path: str,
    checkpoint: str,
    audit_path: str | None = None,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataStreamWriter:
    """Continuous corpus-ingest admission: every micro-batch of documents
    is classified against the CURRENT sink corpus with
    ``datapipe.dedup.incremental_dedup`` (exact fingerprint + banded
    MinHash near-dup) and only admitted docs are appended; rejected rows
    optionally land in ``audit_path`` with their status.

    The corpus-state problem is solved the same way as
    :func:`poll_connector_stream`: state IS the sink. No signature set
    in driver memory, restart-safe by construction, and a batch never
    self-inflates the corpus (admission compares against what has
    actually landed). At scale the sink side would read the persisted
    signature staging table instead of recomputing — the operator's
    contract is unchanged.
    """
    from d2b_dataframework_spark.datapipe import cache as dp_cache
    from d2b_dataframework_spark.datapipe.dedup import incremental_dedup

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([id_col])
        try:
            spark.catalog.refreshByPath(sink_path)
            corpus = spark.read.parquet(sink_path)
        except AnalysisException:  # first batch — empty corpus, admit all
            batch.write.mode("append").parquet(sink_path)
            return
        verdict_lazy = incremental_dedup(
            batch, corpus, threshold=threshold, text_col=text_col, id_col=id_col
        )
        # Materialize ONCE before any sink write: the verdict plan reads
        # the sink, and it is consumed twice (admission filter + audit).
        # Lazy re-execution after the append would re-list the sink and
        # classify a just-admitted doc as a duplicate of itself.
        verdict = verdict_lazy.localCheckpoint(eager=True)
        dp_cache.release(verdict_lazy)
        admitted = batch.join(
            verdict.filter(F.col("admitted")).select(id_col), id_col, "left_semi"
        )
        admitted.write.mode("append").parquet(sink_path)
        if audit_path is not None:
            verdict.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(audit_path)

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(on_batch)
    )


def ewma_anomaly_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    alpha: float = 0.3,
    z_threshold: float = 3.0,
    min_obs: int = 5,
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-key exponentially-weighted mean/variance tracker that emits a
    row whenever an observation deviates more than ``z_threshold``
    sigmas from the running estimate — the semantics ``session_window``
    / windowed aggs genuinely cannot express (state is a recurrence over
    the full keyed history, not a window fold).

    State per key is THREE floats + a count (mean, var, n) regardless of
    history length, evicted after ``state_ttl_ms`` of key silence
    (ProcessingTimeTimeout), so state size is bounded by the live key
    cardinality — the applyInPandasWithState contract the 100TB
    streaming design needs. Batch rows are Arrow-transferred and
    processed vectorized per key.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("ewma", DoubleType()),
            StructField("zscore", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("mean", DoubleType()),
            StructField("var", DoubleType()),
            StructField("n", LongType()),
        ]
    )

    def track(key, pdfs, state: "GroupState"):
        if state.hasTimedOut:
            state.remove()
            return
        mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
        alerts = {"key": [], "ts": [], "value": [], "ewma": [], "zscore": []}
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, v in zip(pdf["ts"], pdf["value"]):
                v = float(v)
                if n >= min_obs and var > 0:
                    z = (v - mean) / (var ** 0.5)
                    if abs(z) >= z_threshold:
                        alerts["key"].append(key[0])
                        alerts["ts"].append(ts)
                        alerts["value"].append(v)
                        alerts["ewma"].append(mean)
                        alerts["zscore"].append(z)
                delta = v - mean
                mean = mean + alpha * delta
                var = (1 - alpha) * (var + alpha * delta * delta) if n > 0 else 0.0
                n += 1
        state.update((mean, var, n))
        state.setTimeoutDuration(state_ttl_ms)
        if alerts["key"]:
            yield pd.DataFrame(alerts)

    import pandas as pd  # noqa: PLC0415 — worker-side import kept local

    return (
        events.select(
            F.col(key_col).alias("key"), F.col(ts_col).alias("ts"), F.col(value_col).alias("value")
        )
        .groupBy("key")
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to a click
    by the same key that happened within ``horizon`` BEFORE it.

    This is the canonical watermarked stream-stream join shape: both
    sides carry a watermark, and the join condition bounds the event-time
    distance, so Spark can expire buffered state — click state is held
    only until (its event time + horizon) falls behind the purchase-side
    watermark. Without the time bound the state store would grow without
    limit; with it, state ∝ traffic within the watermark window, which
    is what survives an unbounded stream at cluster scale.

    ``how='leftOuter'`` emits unattributed clicks (purchase columns
    null) once the watermark proves no match can still arrive — outer
    results are therefore delayed by the watermark, by design.
    """
    c = clicks.withWatermark(ts_col, watermark).alias("c")
    p = purchases.withWatermark(ts_col, watermark).alias("p")
    cond = (
        (F.col(f"c.{key_col}") == F.col(f"p.{key_col}"))
        & (F.col(f"p.{ts_col}") >= F.col(f"c.{ts_col}"))
        & (
            F.col(f"p.{ts_col}")
            <= F.col(f"c.{ts_col}") + F.expr(f"INTERVAL {horizon}")
        )
    )
    joined = c.join(p, cond, how)
    return joined.select(
        F.col(f"c.{key_col}").alias(key_col),
        F.col(f"c.{ts_col}").alias("click_ts"),
        F.col(f"p.{ts_col}").alias("purchase_ts"),
        (
            F.unix_timestamp(F.col(f"p.{ts_col}"))
            - F.unix_timestamp(F.col(f"c.{ts_col}"))
        ).cast("long").alias("lag_sec"),
    )


def heavy_hitters_stream(
    events: DataFrame,
    group_col: str = "event_type",
    item_col: str = "user_id",
    value_col: str = "value",
    capacity: int = 64,
    k: int = 10,
    state_ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming heavy hitters via ``applyInPandasWithState``: per group
    a bounded space-saving sketch (Metwally et al.) of the top
    contributors by cumulative value. The sketch guarantees any item
    with true weight > W/capacity is present (overestimation bounded by
    the evicted minimum), in O(capacity) state per group no matter how
    many distinct items stream past — the property a per-key exact agg
    cannot offer on an unbounded item domain.

    After each micro-batch the group emits its current top-``k`` with a
    monotonically increasing ``batch_seq`` (append-mode snapshots —
    downstream consumers take the latest seq per group). State: two
    parallel arrays (items, weights) + seq, evicted after
    ``state_ttl_ms`` of group silence.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("group", StringType()),
            StructField("batch_seq", LongType()),
            StructField("rank", LongType()),
            StructField("item", LongType()),
            StructField("est_weight", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("items", ArrayType(LongType())),
            StructField("weights", ArrayType(DoubleType())),
            StructField("seq", LongType()),
        ]
    )

    def track(key, pdfs, state: "GroupState"):
        if state.hasTimedOut:
            state.remove()
            return
        items, weights, seq = (
            state.get if state.exists else ([], [], 0)
        )
        sketch = dict(zip(items, weights))
        for pdf in pdfs:
            # vectorized pre-aggregation: one weight per item per batch
            agg = pdf.groupby("item")["w"].sum()
            for item, w in agg.items():
                item, w = int(item), float(w)
                if item in sketch:
                    sketch[item] += w
                elif len(sketch) < capacity:
                    sketch[item] = w
                else:  # space-saving eviction: inherit the min count
                    min_item = min(sketch, key=sketch.get)
                    m = sketch.pop(min_item)
                    sketch[item] = m + w
        seq += 1
        top = sorted(sketch.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        state.update((list(sketch.keys()), list(sketch.values()), seq))
        state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {
                "group": [key[0]] * len(top),
                "batch_seq": [seq] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "item": [t[0] for t in top],
                "est_weight": [t[1] for t in top],
            }
        )

    import pandas as pd  # noqa: PLC0415 — worker-side import kept local

    return (
        events.select(
            F.col(group_col).cast("string").alias("group"),
            F.col(item_col).cast("long").alias("item"),
            F.col(value_col).cast("double").alias("w"),
        )
        .groupBy("group")
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sketch_store_stream(
    events: DataFrame,
    store_path: str,
    checkpoint: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 1000,
    ts_col: str = "ts",
) -> DataStreamWriter:
    """Continuously maintained quantile-sketch store: every micro-batch
    reduces to per-day histogram partials (operators/sketches.py —
    exact int64 bin counters, at most ``bins`` rows per day per batch)
    which land APPEND-ONLY: because counters merge by plain addition,
    readers just re-sum whatever rows exist — no upsert, no read-modify
    -write race, no driver state.

    Exactly-once on replay without transactions: rows carry a commit
    key of (checkpoint-hash, batch_id) and the write is
    ``partitionBy("commit_key")`` under DYNAMIC partition overwrite, so
    a replayed batch REPLACES its own partition instead of
    double-counting — idempotence from the layout, the same trick as
    the date-sharded sink (sinks/partitioned.py). The checkpoint hash
    matters: batch ids restart at 0 per checkpoint, so keying on the
    bare batch_id would let a SECOND query (or a fresh-checkpoint
    rerun) writing the same store clobber the first run's partials
    instead of accumulating alongside them.

    Read side: :func:`sketch_store_quantiles` — p50/p99 over any day
    range from kilobyte-sized sketch rows, never the raw stream.
    """
    import hashlib

    from d2b_dataframework_spark.operators import sketches as sk

    run_key = hashlib.md5(checkpoint.encode()).hexdigest()[:12]

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hist = sk.histogram_partials(
            batch_df.withColumn("day", F.to_date(F.col(ts_col))),
            value_col,
            lo,
            hi,
            bins,
            keys=["day"],
        )
        (
            hist.withColumn("commit_key", F.lit(f"{run_key}-{batch_id}"))
            .write.partitionBy("commit_key")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(store_path)
        )

    return (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(on_batch)
    )


def sketch_store_quantiles(
    spark,
    store_path: str,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 1000,
    qs: list[float] | None = None,
) -> DataFrame:
    """Quantile readout over the accumulated sketch store: re-sums the
    per-(day, batch) partial counters (any-order exact integer merge)
    and interpolates per-day estimates. Scans only sketch rows — cost
    is days x bins, independent of how much raw data streamed through."""
    from d2b_dataframework_spark.operators import sketches as sk

    spark.catalog.refreshByPath(store_path)
    hist = spark.read.parquet(store_path).drop("commit_key")
    return sk.histogram_quantiles(hist, lo, hi, bins, qs or [0.5, 0.99], keys=["day"])


def _fold_running_totals(prior, row_batches):
    """The pure per-key fold behind :func:`running_totals_stream_v2`'s
    StatefulProcessor: merge a prior ``(n, total, max)`` state tuple (or
    None) with an iterator of pandas batches of a ``value`` column.

    Module-level (not a closure) so the logic is unit-testable on
    runtimes where the full transformWithStateInPandas leg must skip
    (the state-v2 wire protocol needs protobuf; this sandbox lacks it —
    see tests/test_streaming.py's importorskip leg vs the pure-fold
    test in the same file)."""
    n, total, mx = 0, 0.0, None
    if prior is not None:
        n, total, mx = int(prior[0]), float(prior[1]), prior[2]
        mx = float(mx) if mx is not None else None
    for pdf in row_batches:
        vals = pdf["value"].astype(float)
        n += int(len(vals))
        total += float(vals.sum())
        batch_max = float(vals.max()) if len(vals) else None
        if batch_max is not None:
            mx = batch_max if mx is None else max(mx, batch_max)
    return n, total, mx


def running_totals_stream_v2(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running totals on Spark 4's ``transformWithStateInPandas``
    — the modern arbitrary-state API (SPARK-45939 "state v2") that
    supersedes ``applyInPandasWithState``: typed state variables
    (ValueState here; List/MapState available) managed by a
    StatefulProcessor object instead of one opaque tuple, with
    first-class TTL, timers, and initial-state hydration.

    Emits one row per key per micro-batch carrying the post-batch
    running (n, total, max) — the incremental per-customer ledger. State
    per key is three numbers regardless of history; totals are exact
    decimal-style (sums of rounded doubles are fine here because the
    emission is per-batch bookkeeping, parity-tested against the batch
    groupBy in tests).

    Why both APIs live in this module: ewma_anomaly_stream keeps the
    applyInPandasWithState shape (still the broadly-deployed API);
    this operator is the forward path — new stateful operators should
    start here.

    Runtime requirements (real clusters have both; this sandbox lacks
    the first): ``protobuf`` (the state-v2 wire protocol) and the
    RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``). The test leg
    (tests/test_streaming.py::test_running_totals_stream_v2...) runs
    wherever protobuf exists and skips visibly elsewhere.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            prior = self._agg.get() if self._agg.exists() else None
            n, total, mx = _fold_running_totals(prior, rows)
            self._agg.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n": [n],
                    "total": [total],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    import pandas as pd  # noqa: PLC0415 — worker-side import kept local

    return (
        events.select(
            F.col(key_col).alias("key"), F.col(value_col).alias("value")
        )
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="none",
        )
    )


def classify_stream(
    docs_stream: DataFrame,
    model: DataFrame,
    class_stats: DataFrame,
    sink_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataStreamWriter:
    """Continuous Naive-Bayes labeling of a document stream against a
    STATIC model: ``model`` (token, class, count) and ``class_stats``
    (class, ln_prior, ln_denom) come from a batch training job
    (datapipe/classify.py nb_fit) and are refreshed by swapping the
    tables they read — the lambda-architecture split of train-batch /
    score-stream that labels a corpus as it lands instead of in a
    nightly sweep.

    Each micro-batch is scored with the SAME batch scorer
    (classify.nb_score — sparse token-key join, argmax per doc) inside
    foreachBatch: per-doc scoring is stateless across batches (a doc's
    tokens arrive in one row), so no watermark or streaming-state
    operator is needed and the batch/stream results are identical by
    construction. Labeled rows append to ``sink_path``.
    """
    from d2b_dataframework_spark.datapipe.classify import nb_score
    from d2b_dataframework_spark.datapipe.text import tokens

    def _score_batch(batch: DataFrame, _bid: int) -> None:
        if batch.isEmpty():
            return
        scored = nb_score(
            batch.select(F.col(id_col), tokens(text_col).alias("_tk")),
            model,
            class_stats,
            id_col=id_col,
            alpha=alpha,
        ).select(id_col, "predicted", F.col("score").cast("double").alias("score"))
        scored.write.mode("append").parquet(sink_path)

    return (
        docs_stream.writeStream.foreachBatch(_score_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
