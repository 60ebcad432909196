"""Structured-Streaming ingestion: continuous page/quad arrival → HK entities.

The reference has no streaming model (its "streaming" rdfxml parser fills an
in-memory array, graphfactory.js:102-121). Here the natural streaming unit is
the micro-batch: pages (or quads) arrive on a stream, each batch runs the
SAME batch operators (extract → relations → parse_quads) via foreachBatch,
and entity updates append to the bucketed store. Exactly-once comes from the
sink's idempotent upsert key (entity id is deterministic md5, so replays
rewrite identical rows) + the streaming checkpointLocation.

Watermarked page-rate stats show the windowed-aggregation path
(readStream → withWatermark → window → writeStream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdf2hk_spark.operators.parse import ParseOptions, parse_quads
from rdf2hk_spark.pipeline import corpus, extract, relations


def read_page_stream(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """File-source stream of page rows (parquet dropped into ``path``)."""
    schema = schema or (
        "url string, warc_ts timestamp, html binary, text string, lang string,"
        " page_id long, pid long, cid long, oid long, kid long"
    )
    return spark.readStream.schema(schema).parquet(path)


def page_rate_stats(pages: DataFrame, window: str = "10 seconds",
                    watermark: str = "30 seconds") -> DataFrame:
    """Windowed page counts with late-data watermarking."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("lang"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("window.start").alias("window_start"), "lang", "n_pages"
        )
    )


def stream_dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Cross-micro-batch exact dedup via ``applyInPandasWithState``: the
    first-seen document per content hash is emitted, later arrivals (within
    or across micro-batches, including replays after restart — state lives in
    the streaming checkpoint) are suppressed and counted.

    State per md5(text): (keep_id, n_seen). Output one row per NEWLY seen
    hash: (h, keep_id). keep_id = SHORTLEX-min doc id within the first batch
    that carried the hash — ids stay strings (non-numeric ids never become
    silent nulls), and shortlex order (length, then lexicographic) agrees
    with numeric order on digit strings, so the survivor matches the batch
    ``exact_duplicates`` numeric ``min(id)`` for integer-id corpora.
    Deterministic under shuffle order. At 10^12-doc scale the state store
    shards by hash exactly like the batch groupBy — no driver-side state,
    no all-pairs."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("h"),
    )

    def dedup_fn(key, pdfs, state):
        import pandas as pd

        shortlex = lambda s: (len(s), s)
        min_id = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                m = min((str(x) for x in pdf["doc_id"]), key=shortlex)
                if min_id is None or shortlex(m) < shortlex(min_id):
                    min_id = m
        if state.exists:
            keep_id, seen = state.get
            state.update((keep_id, int(seen) + n))
            return iter(())  # duplicate hash — suppress
        state.update((min_id, n))
        yield pd.DataFrame({"h": [key[0]], "keep_id": [min_id]})

    return hashed.groupBy("h").applyInPandasWithState(
        dedup_fn,
        outputStructType="h string, keep_id string",
        stateStructType="keep_id string, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


QUAD_STREAM_SCHEMA = "stmt_idx long, s string, p string, o string, g string"


def start_quad_merge_stream(
    spark: SparkSession,
    in_path: str,
    store_path: str,
    checkpoint: str,
    trigger_once: bool = True,
):
    """Quad stream → per-micro-batch idempotent MERGE into the
    graph-partitioned quad store (operators.update_diff).

    Exactly-once store state from three at-scale-honest pieces:
    - the streaming checkpoint replays an uncommitted micro-batch after a
      crash (at-least-once delivery);
    - ``upsert_into_store`` is set-union idempotent — a replayed batch
      produces byte-identical partition content, never duplicates;
    - ``recover_store`` (run at every upsert) rolls a crash that landed
      MID-SWAP forward from the commit manifest, so even a kill between
      partition renames converges.
    No sink-side dedup state, no driver memory: the upsert touches only the
    partitions the batch's graphs map to."""
    quads = spark.readStream.schema(QUAD_STREAM_SCHEMA).parquet(in_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from rdf2hk_spark.operators.update_diff import upsert_into_store

        upsert_into_store(batch_df.sparkSession, store_path, batch_df)

    writer = (
        quads.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sessionize(
    events: DataFrame, gap_minutes: int = 30, emit_late_count: bool = False
) -> DataFrame:
    """Cross-micro-batch gap sessionization via ``applyInPandasWithState``,
    sharded by user_id — the streaming twin of ``ops.events.sessionize``.

    State per user: (session_idx, start, last, n) with epoch-MICROSECOND
    longs derived from the raw datetime64 values — wall-clock arithmetic,
    no session-timezone dependence, and the same microsecond-exact gap
    rule as the batch twin. Events with a null timestamp are DROPPED
    (matching ops.events.sessionize) — they must not wedge the query with
    a poison-pill batch that crashes on every replay. Each batch sorts its
    user-slice by time, extends or opens sessions by the gap rule, and
    emits ONE snapshot row per session TOUCHED in the batch (outputMode
    update) — downstream keeps the latest row per (user_id, session_idx).
    In-order delivery per user is assumed across batches (enforce with a
    watermark + sorted file drops upstream). An out-of-order event older
    than the open session's last timestamp extends that session rather
    than reopening closed ones, AND folds into its start
    (start := min(start, t)) so a late-but-in-gap arrival converges to the
    batch twin's t_start instead of silently diverging (ADVICE r4). Late
    arrivals are counted per session in state; ``emit_late_count=True``
    adds that counter as an ``n_late`` output column — divergence from the
    batch twin (a late event older than start-gap, which batch order would
    have split into its own session) is observable, never silent.
    t_start/t_end are emitted as epoch seconds (floor of the microsecond
    state).

    At 10^12-event scale the state store shards by user exactly like the
    batch shuffle; no driver state, state size = one row per ACTIVE user."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events.filter(F.col("ts").isNotNull()).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts"),
    )
    gap = gap_minutes * 60 * 1_000_000  # microseconds

    def fn(key, pdfs, state):
        import pandas as pd

        ts_list: list[int] = []
        for pdf in pdfs:
            col = pd.to_datetime(pdf["ts"]).dropna()
            vals = col.astype("int64")
            if str(col.dtype).endswith("[ns]"):
                vals = vals // 1000  # ns → µs
            ts_list.extend(int(v) for v in vals)
        if not ts_list:  # every row of the slice was null-ts — no-op batch
            return
        ts_list.sort()
        if state.exists:
            idx, start, last, n, late = state.get
        else:
            idx, start, last, n, late = -1, 0, None, 0, 0
        touched: dict[int, tuple[int, int, int, int]] = {}
        for t in ts_list:
            if last is None or t - last > gap:
                idx += 1
                start, n, late = t, 1, 0
            else:
                if t < last:
                    # out-of-order arrival (only possible against prior-
                    # batch state — the batch slice itself is sorted):
                    # count it, and fold it into the session start
                    late += 1
                    if t < start:
                        start = t
                n += 1
            last = max(last, t) if last is not None else t
            touched[idx] = (start, last, n, late)
        state.update((idx, start, int(last), n, late))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0], "session_idx": i,
                    "n_events": v[2],
                    "t_start": v[0] // 1_000_000,
                    "t_end": v[1] // 1_000_000,
                    **({"n_late": v[3]} if emit_late_count else {}),
                }
                for i, v in sorted(touched.items())
            ]
        )

    out_schema = (
        "user_id long, session_idx long, n_events long,"
        " t_start long, t_end long"
    )
    if emit_late_count:
        out_schema += ", n_late long"
    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=(
            "session_idx long, start long, last long, n long, late long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_kg_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    trigger_once: bool = True,
):
    """pages stream → per-micro-batch KG construction → parquet entity sink.

    foreachBatch runs the full batch pipeline per micro-batch; the sink path
    is partitioned by batch for auditability (compaction merges downstream).
    """
    pages = read_page_stream(spark, in_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ext = extract.extract_text(batch_df)
        cat = corpus.catalog(batch_df.sparkSession)
        rels = relations.extract_relations(ext, cat)
        ments = relations.detect_mentions(ext, cat)
        quads = relations.relation_quads(rels, ments, distinct=False).coalesce(
            batch_df.sparkSession.sparkContext.defaultParallelism
        )
        ents = parse_quads(
            quads,
            ParseOptions(
                create_context=True, set_node_context=True,
                assume_distinct_statements=True,
            ),
        )
        (
            ents.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
