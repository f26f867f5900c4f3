"""Structured Streaming ingest: continuous ``ann_insert!`` as micro-batches.

Reference parity: the reference's "dynamic updates" are synchronous point
inserts/deletes (``/root/reference/paper/paper.md:40``, ``src/LMDiskANN.jl:531-584``)
— there is no streaming runtime (SURVEY.md §2.6).  The Spark-native
generalization is a Structured Streaming pipeline: a stream of new vectors is
consumed with ``readStream``, and ``foreachBatch`` applies the SAME batch
insert pipeline the index uses for static data — each micro-batch is one
transactional snapshot commit (exactly-once per epoch via the checkpoint).

At scale: the micro-batch kNN join is the incremental ``insert_batch_adjacency``
(O(batch x existing) work bounded by LSH bucketing), so ingest cost grows with
batch size, not index size.  Watermarks/late-data handling are not needed for
inserts (idempotent MERGE by id); the events-table rollup below shows the
watermarked windowed-aggregation pattern for completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lmdiskann_jl_spark.index import LMDiskANNIndex


def stream_insert(
    index: LMDiskANNIndex,
    stream_df: DataFrame,
    checkpoint_dir: str,
    vec_col: str = "vec",
    key_col: str | None = None,
    trigger_seconds: int | None = None,
    maintain_blocks: bool = False,
    maintain_ivf: bool = False,
    refresh_entrypoints: bool = False,
):
    """Attach a streaming source of new vectors to the index.

    ``stream_df`` must be a streaming DataFrame (``spark.readStream...``)
    with a vector column.  Every micro-batch runs the index's batch insert —
    the streaming analog of calling ``ann_insert!`` per arriving vector.
    ``maintain_blocks`` keeps a fresh LM-DiskANN block layout current across
    micro-batches (touched rows append as merge-on-read segments), so beam
    search stays on the one-fetch path while the stream runs.
    ``maintain_ivf`` does the same for a fresh IVF layout (each micro-batch
    assigns its rows to the nearest frozen centroid — one broadcast join —
    and appends to the cell table), so mode='ivf'/auto probes keep working
    across ingest; ``stats()['ivf_drift']`` tracks accumulated drift.
    ``refresh_entrypoints`` re-picks the block layout's spread seeds over
    old∪new ids each tick (one extra tiny job) — the opt-in navigability
    aid for out-of-distribution streams (see index.insert_batch's caveat).

    LATENCY SPIKES, by design: maintenance amortizes four O(table) events
    into the unlucky micro-batch that triggers them, trading one slow tick
    for bounded read cost on every search in between.  (0) base tables:
    every incremental insert appends one segment to vectors/adjacency/
    key_map; the insert that reaches TABLES_AUTOCOMPACT_SEGMENTS collapses
    that table inline (index._maybe_autocompact_tables) so union-read cost
    stays bounded for ALL search paths, not just blocks.  (1) blocks: the
    insert that would create the BLOCKS_AUTOCOMPACT_SEGMENTS-th
    merge-on-read segment runs the full latest-wins collapse inline
    (index._maybe_autocompact_blocks — the read-amplification bound).
    (2) IVF: the insert that pushes frozen-centroid drift past
    IVF_AUTOREFIT_DRIFT refits the cells inline (bounded-sample k-means +
    one assignment pass — the recall bound).  (3) PQ blocks: the insert
    that pushes frozen-codebook drift past BLOCKS_PQ_REFIT_DRIFT rebuilds
    the block layout with a refit codebook inline (the ADC routing-noise
    bound; raw layouts never drift).  Pipelines that cannot absorb
    a slow tick should run maintenance off the hot path instead: leave
    these flags off and schedule ``compact()`` / ``build_ivf()`` /
    ``build_beam_blocks()`` between query windows (searches fall back to
    two-fetch / exact until then).  Returns the StreamingQuery handle.
    """
    if not stream_df.isStreaming:
        raise ValueError("stream_insert needs a streaming DataFrame (use spark.readStream)")

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.insert_batch(
            batch_df, vec_col=vec_col, key_col=key_col,
            maintain_blocks=maintain_blocks, maintain_ivf=maintain_ivf,
            refresh_entrypoints=refresh_entrypoints,
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_delete(
    index: LMDiskANNIndex,
    stream_df: DataFrame,
    checkpoint_dir: str,
    key_col: str | None = None,
    id_col: str | None = None,
    trigger_seconds: int | None = None,
    maintain_blocks: bool = False,
    maintain_ivf: bool = False,
):
    """Attach a streaming source of DELETIONS to the index — the streaming
    analog of calling ``ann_delete!`` per arriving key
    (src/LMDiskANN.jl:605-646), and ``stream_insert``'s churn twin: the
    retention-expiry / right-to-erasure shape a training-data pipeline
    feeds as a stream of doomed keys, not a batch job.

    Exactly one of ``key_col`` / ``id_col`` names the column carrying the
    keys (strings) or ids (longs) to delete; every micro-batch runs the
    index's batch delete with it.  Unknown keys/ids are dropped silently
    (delete_batch's contract), so replayed or already-deleted rows are
    idempotent across micro-batches — safe under at-least-once delivery.

    ``maintain_blocks`` / ``maintain_ivf`` keep fresh derived layouts
    current tick over tick (survivor block repair + seed re-pick /
    probe-time tombstones), and maintained deletes COUNT TOWARD the
    frozen-artifact drift budgets (round 11, index._layout_drift_n): a
    churn stream pushes ``stats()['ivf_drift']`` / ``blocks_pq_drift``
    toward the 25% refit budget even when the corpus is not growing, and
    the next maintained INSERT past the budget refits.  The latency-spike
    contract documented at ``stream_insert`` applies to the maintenance
    events deletes can trigger (block-segment autocompaction).  Returns
    the StreamingQuery handle.
    """
    if not stream_df.isStreaming:
        raise ValueError("stream_delete needs a streaming DataFrame (use spark.readStream)")
    if (key_col is None) == (id_col is None):
        raise ValueError("pass exactly one of key_col / id_col")

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if key_col is not None:
            index.delete_batch(
                keys=batch_df.select(F.col(key_col).alias("key")),
                maintain_blocks=maintain_blocks, maintain_ivf=maintain_ivf,
            )
        else:
            index.delete_batch(
                ids=batch_df.select(F.col(id_col).alias("id")),
                maintain_blocks=maintain_blocks, maintain_ivf=maintain_ivf,
            )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # the fixture writes parquet TIMESTAMP (micros, no tz); session tz is
        # pinned UTC so the cast to TimestampType below is deterministic
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_hourly_rollup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window rollup over a file stream of events —
    the streaming twin of plans.queries.q_events_hourly (late rows beyond the
    watermark are dropped; per-window counts/sums update incrementally)."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # fixed-point cents: streaming partial aggregation sums doubles
            # in a different order than a batch plan, so round(sum, 2) can
            # flip on a .xx5 boundary between the twins — integer cents can't
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket"),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )


def stream_dedup_ingest(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
):
    """Streaming exact-dedup ingest: accept each document's content once,
    across micro-batches.

    Per batch (the streaming twin of ``operators.dedup.exact_dedup``):

    1. in-batch dedup — keep the min-id row per content digest (window per
       digest, parallel across digests);
    2. cross-batch dedup — anti-join the batch's digests against the
       accumulated seen-digest table (shuffle keyed on the digest only:
       fixed-width keys, uniform by construction — document bodies never
       join);
    3. append accepted rows to ``out_dir/accepted`` and their digests to
       ``out_dir/digests``.

    The seen-digest state lives in parquet, not executor memory, so state
    size is bounded by disk and restarts resume from it.  The two appends
    are not one atomic commit: a crash between them can re-accept (never
    silently drop) a batch on replay — production swaps this seam for a
    transactional MERGE (the versioned-snapshot pattern in
    ``sources/tables.py``).  Returns the StreamingQuery handle.
    """
    import os

    accepted_dir = os.path.join(out_dir, "accepted")
    digests_dir = os.path.join(out_dir, "digests")

    if not stream_df.isStreaming:
        raise ValueError("stream_dedup_ingest needs a streaming DataFrame")

    from pyspark.sql import Window

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        hashed = batch_df.withColumn("text_hash", F.md5(F.col(text_col)))
        w = Window.partitionBy("text_hash").orderBy(id_col)
        first = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if os.path.isdir(digests_dir):
            seen = spark.read.parquet(digests_dir)
            fresh = first.join(seen, "text_hash", "left_anti")
        else:
            fresh = first
        fresh = fresh.persist()
        fresh.drop("text_hash").write.mode("append").parquet(accepted_dir)
        fresh.select("text_hash").write.mode("append").parquet(digests_dir)
        fresh.unpersist()

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
