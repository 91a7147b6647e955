"""Structured Streaming surface: the same pipeline compiled over a
file stream, with checkpointed exactly-once sink writes and
watermarked windowed aggregates.

Reference mapping (SURVEY.md §1.2, §3): the reference tails files
continuously and flushes on timers; the Spark analog is a file-source
stream with ``Trigger.AvailableNow`` (drain-everything-then-stop — the
resumable incremental-batch model) or a processing-time trigger for
continuous operation. Its per-file read-offset checkpoints
(core/file_server/checkpoint/*) map onto Structured Streaming's
checkpoint directory: the file source tracks which files are
committed, giving exactly-once per input file across restarts — the
same contract as InputStaticFileCheckpointManager.

Operator compatibility: every stateless processor (parse, transform,
filter, router, dict_map broadcast enrich) compiles unchanged onto a
streaming DataFrame. Window-rank operators (rate_limit) and the
multiline merge need state — the streaming rate limiter below uses
``applyInPandasWithState`` (a REAL token bucket, closer to the
reference than the batch analog's bucket-cap divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ilogtail_spark.model import TRANSCRIPT_SCHEMA, to_events
from ilogtail_spark.plans.pipeline import Pipeline
from ilogtail_spark.plans.router import SINK_COL


def read_transcripts_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def run_streaming_pipeline(
    stream_df: DataFrame,
    pipeline: Pipeline,
    out_root: str,
    checkpoint_root: str,
    content_col: str = "text",
    available_now: bool = True,
    events_path: str | None = None,
):
    """events stream -> processors -> router -> per-sink partitioned
    parquet, exactly-once via the checkpoint dir. Returns the started
    StreamingQuery (caller awaits termination). ``events_path``
    overrides the default ``<out_root>/events`` so callers sharing an
    out root with batch runs can namespace by run id."""
    events = to_events(stream_df, content_col=content_col)
    routed = pipeline.route(events)
    routed = routed.withColumnRenamed(SINK_COL, "sink")
    writer = (
        routed.writeStream.format("parquet")
        .option("path", events_path or f"{out_root}/events")
        .option("checkpointLocation", f"{checkpoint_root}/events")
        .partitionBy("sink")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_aggregates(
    stream_df: DataFrame,
    pipeline: Pipeline,
    out_root: str,
    checkpoint_root: str,
    content_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
    keys: list[str] | None = None,
    agg_path: str | None = None,
):
    """Per-sink windowed counts — the streaming form of
    sink_aggregates. Two modes:

    * ``available_now=True`` (drain-and-stop, the resumable
      incremental-batch model): COMPLETE output through foreachBatch,
      atomically replacing the aggregate table each commit — the
      parquet stand-in for Iceberg ``overwritePartitions``. Append
      mode would hold every window open until a LATER batch advances
      the watermark, so a single drain would emit nothing.
    * ``available_now=False`` (continuous): watermarked APPEND — each
      window emits once, ``watermark`` bounds state and drops late
      rows (documented divergence: the reference's timer flush has no
      late-data semantics at all).
    """
    keys = keys or ["role"]
    agg_path = agg_path or f"{out_root}/aggregates"
    events = to_events(stream_df, content_col=content_col)
    routed = pipeline.route(events).withColumnRenamed(SINK_COL, "sink")
    grouped = routed if available_now else routed.withWatermark("ts", watermark)
    key_cols = [
        (
            F.col(k) if k in routed.columns else F.col("fields").getItem(k)
        ).alias(k)
        for k in keys
    ]
    agg = (
        grouped.groupBy(
            F.col("sink"),
            F.window("ts", window).alias("w"),
            *key_cols,
        )
        .agg(F.count(F.lit(1)).alias("events_total"))
        .select(
            "sink",
            F.col("w.start").alias("bucket_ts"),
            *keys,
            "events_total",
        )
    )
    if available_now:

        def commit(batch_df, batch_id: int) -> None:
            # complete-mode replace of THIS stream's aggregate table
            # only — agg_path must be namespaced by the caller when the
            # out root is shared with other runs
            batch_df.write.mode("overwrite").parquet(agg_path)

        return (
            agg.writeStream.foreachBatch(commit)
            .option("checkpointLocation", f"{checkpoint_root}/aggregates")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    return (
        agg.writeStream.format("parquet")
        .option("path", agg_path)
        .option("checkpointLocation", f"{checkpoint_root}/aggregates")
        .outputMode("append")
        .start()
    )


def streaming_multiline_merge(
    stream_df: DataFrame,
    start_pattern: str,
    group_cols: list[str] | None = None,
    order_col: str = "turn_idx",
    content_col: str = "text",
    merge_sep: str = "\n",
    unmatched: str = "single_line",  # single_line | discard
    max_pending_lines: int | None = 100_000,
):
    """Stateful streaming twin of processor_merge_multiline_log
    (ProcessorMergeMultilineLogNative.cpp): physical lines arriving
    across micro-batches merge into logical events per source group.

    State per group = the PENDING partial event (the lines from the
    most recent StartPattern match onward): a logical event is only
    complete once the NEXT start line arrives, so the trailing partial
    is withheld until a later batch (or restart — the checkpoint
    persists it) delivers its successor. This mirrors the reference's
    in-memory line buffer + forced flush on the next event boundary.
    ``max_pending_lines`` is the MaxMergeLines analog for CHECKPOINTED
    state: if the pattern stops matching, the oversize pending event is
    force-emitted in chunks instead of growing state without bound.

    Each call merges over ONE globally sorted sequence of pending +
    arrived lines, so the output is invariant to how lines were split
    across Arrow chunks and micro-batches (the stateful mirror of the
    batch twin's array_sort-inside-aggregate determinism).

    Lines BEFORE the first start follow ``unmatched``: each its own
    event (single_line) or dropped (discard) — same contract as the
    batch operator. Output: (group_cols..., evt_start = order value of
    the event's first line, n_lines, merged).
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    group_cols = group_cols or ["conv_id"]
    pat = "(?s)\\A(?:" + start_pattern + ")"
    # key/order field types derive from the stream schema — hardcoding
    # `string`/`long` would crash non-string group keys at Arrow
    # conversion time
    by_name = {f.name: f.dataType.simpleString() for f in stream_df.schema.fields}
    out_fields = ", ".join(f"{c} {by_name.get(c, 'string')}" for c in group_cols)
    order_t = by_name.get(order_col, "long")
    out_schema = f"{out_fields}, evt_start {order_t}, n_lines int, merged string"
    # has_start: whether the pending lines belong to an IN-PROGRESS
    # event (true even when the start line itself is no longer among
    # them — after a max_pending_lines force-emit only continuation
    # lines remain). Without it, restored post-force-emit lines fail
    # the start-pattern match and would be misclassified as
    # before-first-start noise (emitted per-line or discarded) instead
    # of continuing the oversize event's chunk sequence.
    state_schema = f"orders array<{order_t}>, lines array<string>, has_start boolean"

    def merger(key, pdfs, state: GroupState):
        rx = _re.compile(pat)
        if state.exists:
            orders, lines, restored_has_start = state.get
            pending = list(zip(orders, lines))
        else:
            pending = []
            restored_has_start = False
        rows: list[tuple] = []
        new: list[tuple] = []
        for pdf in pdfs:
            # a null order value cannot be placed in the sequence: drop
            # the row (the batch twin's window orders nulls arbitrarily)
            pdf = pdf[pdf[order_col].notna()]
            new.extend(zip(pdf[order_col].tolist(), pdf[content_col].tolist()))
        # ONE global sort over pending + new: per-chunk sorting is not
        # enough (a group bigger than one Arrow chunk arrives split, in
        # arbitrary chunk order), and cross-batch disorder (late files,
        # mtime ties in the file source) would otherwise silently
        # misassign lines to events
        seq = sorted(pending + new, key=lambda ot: ot[0])

        def emit(chunk: list[tuple]) -> None:
            rows.append(
                (
                    *key,
                    chunk[0][0],
                    len(chunk),
                    # null content counts toward n_lines but adds no
                    # text — the batch twin's array_join skips nulls
                    merge_sep.join(str(t) for _, t in chunk if t is not None),
                )
            )

        # split into events at start lines; everything from the LAST
        # start onward stays pending. has_start resumes from state so
        # force-emitted events' trailing continuation lines keep their
        # in-progress identity across micro-batches.
        cur: list[tuple] = []
        has_start = bool(restored_has_start)
        for o, t in seq:
            if t is not None and rx.match(str(t)):
                if has_start and cur:
                    emit(cur)
                elif cur:  # lines before the first start ever seen
                    if unmatched == "single_line":
                        for item in cur:
                            emit([item])
                cur = [(o, t)]
                has_start = True
            else:
                cur.append((o, t))
                if (
                    has_start
                    and max_pending_lines
                    and len(cur) >= max_pending_lines
                ):
                    # scale guard: force-emit the oversize pending event
                    # rather than re-persisting ever-growing state
                    emit(cur)
                    cur = []
        if has_start:
            # pending partial event — possibly with zero lines right
            # after a force-emit; the TRUE flag alone keeps later
            # continuation lines attached to the in-progress event
            state.update(
                (
                    [o for o, _ in cur],
                    [None if t is None else str(t) for _, t in cur],
                    True,
                )
            )
        else:
            # no start ever seen: unmatched lines never become state
            if cur and unmatched == "single_line":
                for item in cur:
                    emit([item])
            state.update(([], [], False))
        if rows:
            yield pd.DataFrame(
                rows, columns=[*group_cols, "evt_start", "n_lines", "merged"]
            )

    return stream_df.groupBy(*[F.col(c) for c in group_cols]).applyInPandasWithState(
        merger,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def token_bucket_admit(
    ts_seconds: list[float],
    limit_per_sec: float,
    burst: int,
    tokens: float | None = None,
    last_ts: float | None = None,
) -> tuple[list[bool], float, float | None]:
    """Pure token-bucket admission over SORTED event times (the core of
    the stateful operator below, extracted so its contract is
    property-testable without a stream): per event, refill
    ``limit_per_sec`` tokens per elapsed event-time second capped at
    ``burst``, admit iff a whole token is available.

    Invariant (the documented relationship to the batch analog's
    bucket-cap): within ANY window of length T seconds, admissions
    <= burst + limit_per_sec * T — the batch operator's per-bucket cap
    of ``burst + rate*bucket`` is therefore always an upper bound.
    """
    if tokens is None:
        tokens = float(burst)
    flags: list[bool] = []
    for t in ts_seconds:
        if last_ts is not None and t > last_ts:
            tokens = min(float(burst), tokens + (t - last_ts) * limit_per_sec)
        last_ts = t if last_ts is None else max(last_ts, t)
        if tokens >= 1.0:
            tokens -= 1.0
            flags.append(True)
        else:
            flags.append(False)
    return flags, tokens, last_ts


def streaming_rate_limit(
    stream_df: DataFrame,
    key_cols: list[str],
    limit_per_sec: float,
    burst: int,
    ts_col: str = "ts",
):
    """True token-bucket rate limiting as a custom STATEFUL streaming
    operator (applyInPandasWithState) — the faithful analog of
    processor_rate_limit's bucket
    (plugins/processor/ratelimit/token_bucket.go): per key-combination
    state holds (tokens, last event-time); each event consumes one
    token; tokens refill at ``limit_per_sec`` in EVENT time. The batch
    operator documents its divergence (bucket-cap); this one is the
    real thing for streaming jobs.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream_df.schema
    # has_last distinguishes "no events seen" from a real event at
    # epoch 0 — a 0.0 sentinel would drop the refill baseline for
    # zeroed-clock records
    state_schema = "tokens double, last_ts double, has_last boolean"

    def limiter(key, pdfs, state: GroupState):
        if state.exists:
            tokens, last_ts, has_last = state.get
            if not has_last:
                last_ts = None
        else:
            tokens, last_ts = float(burst), None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            # vectorized epoch seconds; admission flags drive one
            # boolean mask — no per-row pandas iteration
            times = (pdf[ts_col].astype("int64") / 1e9).tolist()
            flags, tokens, last_ts = token_bucket_admit(
                times, limit_per_sec, burst, tokens, last_ts
            )
            admitted = pdf[pd.Series(flags, index=pdf.index)]
            if len(admitted):
                out.append(admitted)
        state.update(
            (tokens, last_ts if last_ts is not None else 0.0, last_ts is not None)
        )
        if out:
            yield pd.concat(out)

    return stream_df.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        limiter,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_drop_exact_duplicates(
    stream_df: DataFrame,
    text_col: str = "text",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of :func:`dataops.dedup.drop_exact_duplicates`:
    one row per content digest survives; later copies — including
    ones arriving in later micro-batches — are dropped by the
    engine's dedup state store (state holds 16-byte digests, never
    documents).

    Divergence vs the batch twin (documented): batch keeps the MIN-ID
    member of each group; here the survivor is the first row the
    state store sees — deterministic across micro-batches (an earlier
    batch always beats a later one) but PARTITION-ORDER-DEPENDENT for
    duplicates landing inside one micro-batch. The kept DIGEST SET is
    identical in every case — which is the contract dedup consumers
    depend on.

    ``watermark`` (e.g. ``'1 hour'``) bounds state for unbounded
    streams via dropDuplicatesWithinWatermark: duplicates arriving
    within the horizon dedup; digests older than the watermark are
    evicted — without it, state grows with the number of DISTINCT
    contents forever (fine for bounded drains, fatal for a 10^12-turn
    continuous ingest)."""
    out = stream_df.withColumn("__digest__", F.md5(F.col(text_col)))
    if watermark is not None:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["__digest__"]).drop("__digest__")
    return out.dropDuplicates(["__digest__"]).drop("__digest__")


def streaming_sessionize(
    stream_df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
):
    """Stateful streaming twin of :func:`dataops.sessions.sessionize`
    / ``session_stats``: gap-based session windows over a continuous
    event stream, one emitted row per CLOSED session.

    State per user = the OPEN session only (ordinal, started_us,
    last_us, n_events — four scalars, no event buffering, so state is
    O(users) regardless of session length). A session closes when a
    later event of the same user arrives more than ``gap_seconds``
    after the session's last event; the final open session stays
    pending until its closing event arrives (or forever, for a user
    who never returns — the same withheld-trailing-partial contract as
    ``streaming_multiline_merge``; bound it with a state TTL upstream
    if user cardinality is unbounded).

    Events inside one micro-batch are globally sorted by (ts, order)
    before folding, so output is invariant to Arrow chunking and
    partition order. ACROSS batches the fold is arrival-ordered: an
    event older than the open session's last event cannot reopen an
    already-emitted session — the same late-data semantics as
    watermarked session windows (feed time-ordered batches, as a
    tailed log source naturally does, for exact batch parity).
    Null-timestamp events are dropped (the batch twin marks them
    unplaceable).

    Output: (user, session_ordinal, n_events, started_us, ended_us) —
    epoch microseconds, ordinals 1-based per user, identical to the
    batch operator's numbering for in-order feeds.

    Precondition: ``spark.sql.session.timeZone`` must be UTC (this
    repo's ``get_spark`` pins it) — Arrow delivers timestamps as
    tz-naive session-zone datetimes, so a non-UTC session would shift
    started_us/ended_us off true epoch micros. Same convention as
    ``run_streaming_aggregates``' window arithmetic.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    by_name = {f.name: f.dataType.simpleString() for f in stream_df.schema.fields}
    user_t = by_name.get(user_col, "long")
    out_schema = (
        f"{user_col} {user_t}, session_ordinal int, n_events bigint, "
        "started_us bigint, ended_us bigint"
    )
    state_schema = (
        "ordinal int, started_us bigint, last_us bigint, n_events bigint"
    )
    gap_us = gap_seconds * 1_000_000

    def folder(key, pdfs, state: GroupState):
        if state.exists:
            ordinal, started, last, n = state.get
        else:
            ordinal, started, last, n = 0, None, None, 0
        evs: list[tuple[int, object]] = []
        for pdf in pdfs:
            pdf = pdf[pdf[ts_col].notna()]
            ts_us = (pdf[ts_col].astype("int64") // 1000).tolist()
            evs.extend(zip(ts_us, pdf[order_col].tolist()))
        evs.sort()
        rows: list[tuple] = []
        for t_us, _ in evs:
            if started is None:
                ordinal, started, last, n = ordinal + 1, t_us, t_us, 1
            elif t_us - last > gap_us:
                rows.append((*key, ordinal, n, started, last))
                ordinal, started, last, n = ordinal + 1, t_us, t_us, 1
            else:
                # arrival-ordered fold: a same-batch pre-sorted or
                # late event merely extends the open session
                last = max(last, t_us)
                n += 1
        if started is not None:
            state.update((ordinal, started, last, n))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    user_col, "session_ordinal", "n_events",
                    "started_us", "ended_us",
                ],
            )

    return stream_df.groupBy(F.col(user_col)).applyInPandasWithState(
        folder,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_rate_spikes(
    stream_df: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    trailing: int = 24,
    factor_micro: int = 3_000_000,
    min_trailing: int = 3,
):
    """Stateful streaming twin of :func:`dataops.analytics.rate_spikes`:
    per event type, emit one row per CLOSED time bucket with its count,
    the trailing window over previously observed buckets, and the
    exact-integer spike verdict (count * trailing_n * 1e6 >
    factor_micro * trailing_sum — the same portable alert rule as the
    batch operator, no float stddev).

    State per type = the OPEN bucket (start_us, count) plus the last
    ``trailing`` closed-bucket counts (a bounded int array) — O(types
    * trailing) total, no event buffering. A bucket closes when an
    event of a LATER bucket arrives; the final open bucket stays
    pending until its successor arrives (the same withheld-trailing-
    partial contract as ``streaming_sessionize`` /
    ``streaming_multiline_merge``). Late events older than the open
    bucket fold into the open bucket (arrival-ordered semantics —
    feed time-ordered batches, as a tailed log source naturally does,
    for exact batch parity on closed buckets). Null timestamps drop.

    Output: (event_type, bucket_us, n_events, trailing_n,
    trailing_sum, is_spike) — bucket start in epoch MICROSECONDS
    (same UTC-session precondition as streaming_sessionize).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if trailing < 1:
        raise ValueError("trailing must be >= 1")
    by_name = {f.name: f.dataType.simpleString() for f in stream_df.schema.fields}
    type_t = by_name.get(type_col, "string")
    out_schema = (
        f"{type_col} {type_t}, bucket_us bigint, n_events bigint, "
        "trailing_n bigint, trailing_sum bigint, is_spike boolean"
    )
    state_schema = "open_us bigint, open_n bigint, hist array<bigint>"
    bucket_us_width = bucket_seconds * 1_000_000

    def folder(key, pdfs, state: GroupState):
        if state.exists:
            open_us, open_n, hist = state.get
            hist = list(hist)
        else:
            open_us, open_n, hist = None, 0, []
        ts_list: list[int] = []
        for pdf in pdfs:
            pdf = pdf[pdf[ts_col].notna()]
            ts_list.extend((pdf[ts_col].astype("int64") // 1000).tolist())
        ts_list.sort()
        rows: list[tuple] = []

        def close_open() -> None:
            nonlocal open_us, open_n, hist
            tn, tsum = len(hist), sum(hist)
            spike = tn >= min_trailing and (
                open_n * tn * 1_000_000 > factor_micro * tsum
            )
            rows.append((*key, open_us, open_n, tn, tsum, spike))
            hist.append(open_n)
            if len(hist) > trailing:
                hist = hist[-trailing:]

        for t_us in ts_list:
            b = (t_us // bucket_us_width) * bucket_us_width
            if open_us is None:
                open_us, open_n = b, 1
            elif b <= open_us:
                # same bucket, or late data: fold into the open bucket
                open_n += 1
            else:
                close_open()
                open_us, open_n = b, 1
        if open_us is not None:
            state.update((open_us, open_n, hist))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    type_col, "bucket_us", "n_events",
                    "trailing_n", "trailing_sum", "is_spike",
                ],
            )

    return stream_df.groupBy(F.col(type_col)).applyInPandasWithState(
        folder,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_new_templates(
    stream_df: DataFrame,
    text_col: str = "text",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming NEW-log-template detector — emit a row the FIRST
    time a masked template (``analytics.mask_template``) is seen,
    across micro-batches: the "a log line shape we have never seen
    before just appeared" alert, which is the streaming half of
    ``analytics.rare_templates`` (batch finds rare shapes after the
    fact; this fires the moment a shape is born — a deploy
    regression or a new failure mode announces itself as a novel
    template).

    Masking is the same scan-side expression chain as the batch
    operator; novelty is the engine's dedup state keyed on the
    template string — state holds one template per distinct shape
    (the template dictionary: bounded by code sites in the emitting
    software, thousands — NOT line volume), never the lines.

    Determinism contract (the streaming_drop_exact_duplicates one):
    WHICH concrete line first exhibits a template is
    partition-order-dependent within a micro-batch, but the emitted
    TEMPLATE SET is exactly the distinct template set of the input —
    the invariant the oracle checks. ``watermark`` bounds state for
    continuous ingest by letting a template re-alert after the
    horizon passes (often desirable: "this shape is back").
    """
    from ilogtail_spark.dataops.analytics import mask_template

    t = F.col(text_col)
    out = stream_df.filter(t.isNotNull()).withColumn(
        "template", mask_template(t)
    )
    if watermark is not None:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["template"])
    return out.dropDuplicates(["template"])


def streaming_retry_storms(
    stream_df: DataFrame,
    identity_cols: list[str] | None = None,  # None -> (user_id, event_type)
    ts_col: str = "ts",
    window_sec: int = 600,
    min_run: int = 3,
):
    """Stateful streaming twin of :func:`dataops.analytics.
    retry_storms`: detect duplicate-delivery storms ON the live
    stream, one emitted row per CLOSED storm chain (a maximal run of
    same-identity rows with inter-arrival gaps <= ``window_sec`` that
    reached ``min_run`` rows). The batch twin sizes the problem after
    the fact; this is the alarm while the sender is still retrying.

    State per identity = the OPEN chain only (started_us, last_us,
    n_rows — three scalars, no row buffering, so state is
    O(identities)). A chain closes when a later same-identity row
    arrives more than ``window_sec`` after the chain's last row; the
    trailing open chain stays pending (the same withheld-partial
    contract as streaming_sessionize — bound identity cardinality
    with an upstream TTL if it is unbounded). Chains shorter than
    ``min_run`` close silently: output is bounded by the storm count,
    not the row count.

    Rows inside one micro-batch are folded in (ts-sorted) order, so
    output is invariant to Arrow chunking and partition order; across
    batches the fold is arrival-ordered (time-ordered feeds — a
    tailed log's natural order — give exact batch parity; the oracle
    pins it over a midpoint-cut two-batch drain). Null timestamps are
    dropped, matching the batch twin.

    Output: (identity cols..., run_started_us, run_ended_us, n_rows).

    Precondition: UTC session zone (get_spark pins it) — same Arrow
    timestamp convention as streaming_sessionize.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if identity_cols is None:
        identity_cols = ["user_id", "event_type"]
    if not identity_cols:
        raise ValueError(
            "streaming_retry_storms: identity_cols must name at least "
            "one column (got an empty list)"
        )
    if window_sec <= 0:
        raise ValueError("streaming_retry_storms: window_sec must be > 0")
    if min_run < 2:
        raise ValueError(
            f"streaming_retry_storms: min_run must be >= 2, got {min_run}"
        )
    by_name = {
        f.name: f.dataType.simpleString() for f in stream_df.schema.fields
    }
    id_schema = ", ".join(
        f"{c} {by_name.get(c, 'string')}" for c in identity_cols
    )
    out_schema = (
        f"{id_schema}, run_started_us bigint, run_ended_us bigint, "
        "n_rows bigint"
    )
    state_schema = "started_us bigint, last_us bigint, n_rows bigint"
    window_us = int(window_sec) * 1_000_000

    def folder(key, pdfs, state: GroupState):
        if state.exists:
            started, last, n = state.get
        else:
            started, last, n = None, None, 0
        ts_list: list[int] = []
        for pdf in pdfs:
            pdf = pdf[pdf[ts_col].notna()]
            ts_list.extend((pdf[ts_col].astype("int64") // 1000).tolist())
        ts_list.sort()
        rows: list[tuple] = []
        for t_us in ts_list:
            if started is None:
                started, last, n = t_us, t_us, 1
            elif t_us - last <= window_us:
                last = max(last, t_us)
                n += 1
            else:
                if n >= min_run:
                    rows.append((*key, started, last, n))
                started, last, n = t_us, t_us, 1
        if started is not None:
            state.update((started, last, n))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    *identity_cols, "run_started_us", "run_ended_us",
                    "n_rows",
                ],
            )

    return stream_df.groupBy(
        *[F.col(c) for c in identity_cols]
    ).applyInPandasWithState(
        folder,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_outage_windows(
    stream_df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    min_gap_seconds: int = 3600,
):
    """Stateful streaming twin of :func:`dataops.analytics.
    outage_windows`: report silence gaps ON the live stream — the
    file-tail liveness alarm while the source is still quiet, not
    the post-mortem. A gap is emitted the moment its CLOSING event
    arrives (a gap is unknowable before the source speaks again),
    so unlike the sessionize/retry-storm twins NOTHING is withheld:
    a full drain equals the batch card row-for-row, and the oracle
    is the batch oracle itself. The one semantic difference is
    inherent: a source that never recovers never emits — pair with
    a state-TTL alarm for the still-silent case.

    State per key = last_us (ONE scalar — O(keys), no row
    buffering). Gap length is floor-second arithmetic
    (us div 1e6 deltas), mirroring the batch twin's
    ``unix_timestamp`` subtraction exactly, threshold inclusive.
    Rows inside one micro-batch fold ts-sorted (Arrow-chunking
    invariant); across batches the fold is arrival-ordered —
    time-ordered feeds give exact batch parity. NULL key/ts rows
    are dropped, matching the batch twin.

    Output: (key, gap_start_us, gap_end_us, gap_sec).

    Precondition: UTC session zone (get_spark pins it).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if min_gap_seconds <= 0:
        raise ValueError(
            "streaming_outage_windows: min_gap_seconds must be > 0"
        )
    if key_col not in stream_df.columns or ts_col not in stream_df.columns:
        raise ValueError(
            f"streaming_outage_windows: missing columns "
            f"{[c for c in (key_col, ts_col) if c not in stream_df.columns]}"
        )
    key_type = {
        f.name: f.dataType.simpleString() for f in stream_df.schema.fields
    }[key_col]
    out_schema = (
        f"key {key_type}, gap_start_us bigint, gap_end_us bigint, "
        "gap_sec bigint"
    )
    state_schema = "last_us bigint"

    def folder(key, pdfs, state: GroupState):
        prev = state.get[0] if state.exists else None
        ts_list: list[int] = []
        for pdf in pdfs:
            pdf = pdf[pdf[ts_col].notna()]
            ts_list.extend((pdf[ts_col].astype("int64") // 1000).tolist())
        ts_list.sort()
        rows: list[tuple] = []
        for t_us in ts_list:
            if prev is not None:
                gap = t_us // 1_000_000 - prev // 1_000_000
                if gap >= min_gap_seconds:
                    rows.append((*key, prev, t_us, gap))
            prev = t_us
        if prev is not None:
            state.update((prev,))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["key", "gap_start_us", "gap_end_us", "gap_sec"],
            )

    return (
        stream_df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            folder,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
