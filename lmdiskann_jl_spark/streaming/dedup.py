"""Streaming exact deduplication with watermark-bounded state.

Beyond the reference (SURVEY.md §2.6 — no streaming runtime): the streaming
twin of ``operators/dedup.exact_dedup``.  An at-least-once source (Kafka
replays, retried micro-batches, duplicated ingest files) re-delivers rows;
the unbounded fix (``dropDuplicates`` on a stream) keeps every key ever seen
in state forever — a guaranteed OOM at 100 TB/day.
``dropDuplicatesWithinWatermark`` keeps state only for keys whose event time
is within the watermark delay: a duplicate arriving inside the window is
dropped, and a key's state is evicted the moment the watermark passes it.

The knob is the usual streaming tradeoff — watermark delay bounds BOTH the
re-delivery horizon the dedup can absorb AND the state footprint
(O(distinct keys per watermark window), not O(stream history)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins dedup on ``key_cols`` with state bounded by
    ``watermark`` (event-time delay on ``ts_col``).

    Streaming input: emits the first row per key; duplicates landing while
    the key is still in state (within the watermark horizon) are dropped;
    once the watermark passes a key's event time its state is evicted, so a
    re-occurrence beyond the horizon is treated as a new row — the
    documented effectively-once contract, not a global-history guarantee.

    Batch input: deterministic min-by — per key, the row with the smallest
    ``(ts, remaining ORDERABLE columns)``.  The streaming path keeps the
    first row by ARRIVAL, and a source that replays in event-time order
    delivers the min-ts row first, so the batch twin is a full-row oracle
    (not just a key-set oracle) for streams whose duplicates land inside
    the watermark horizon in event-time order; ts ties break on the
    remaining orderable columns so the pick never depends on task
    scheduling.  Non-orderable columns (maps, or structs/arrays containing
    them) are excluded from the tiebreak — they still ride along in the
    kept row, but two duplicates identical on every orderable column and
    differing only in a map value tie arbitrarily.  One groupBy shuffle
    with map-side partial min_by — no global window, scale-safe.
    """
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)

    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    others = [
        f.name
        for f in events.schema.fields
        if f.name not in keys and f.name != ts_col and _orderable(f.dataType)
    ]
    ordk = F.struct(F.col(ts_col), *[F.col(c) for c in others])
    return (
        events.groupBy(*keys)
        .agg(F.min_by(F.struct(*events.columns), ordk).alias("_r"))
        .select("_r.*")
    )


# band-store read-amplification bound: the micro-batch that would create
# segment 17 compacts the store inline (mirrors TABLES_AUTOCOMPACT_SEGMENTS
# on the index's base tables — same rationale, same latency-spike contract)
NEARDUP_STATE_SEGMENTS = 16


def _lineage_token(checkpoint: str) -> str:
    """The checkpoint lineage's run id — minted once by the lineage's first
    micro-batch and persisted as a marker file INSIDE the checkpoint dir, so
    replays (same checkpoint) read the same token and a fresh checkpoint
    (new dir, no marker) mints a fresh one."""
    import json as _json
    import os
    import uuid

    marker = os.path.join(checkpoint, "_neardup_lineage.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            return str(_json.load(fh)["token"])
    os.makedirs(checkpoint, exist_ok=True)
    token = uuid.uuid4().hex
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump({"token": token}, fh)
    os.replace(tmp, marker)
    return token


def _check_lineage(meta: dict, token: str, epoch_id: int, what: str) -> None:
    """ENFORCE the state-dir <-> checkpoint-dir binding, two ways.

    (a) Lineage token: a fresh checkpoint pointed at an old store fails
    even at epoch 0 == max_epoch 0 — the hole an epoch high-water mark
    alone cannot see (the strictly-earlier state filter would silently
    hide every epoch-0 row from the new lineage's first batch).
    (b) The ``max_epoch`` high-water mark: a micro-batch whose epoch is
    strictly older raises (a genuine replay arrives with epoch ==
    max_epoch and a matching token, and passes)."""
    if (
        meta.get("versions")
        and meta.get("lineage_token") is not None
        and meta.get("lineage_token") != token
    ):
        # a TOKEN-LESS store (written before the token existed) is adopted
        # by the first lineage that touches it — the commit below stamps
        # the token, so the store cannot be adopted twice; until adoption
        # it keeps the max_epoch-only protection it was written under
        raise ValueError(
            f"{what} lineage violation: checkpoint_dir's lineage token "
            f"{token!r} does not match the state store's "
            f"{meta.get('lineage_token')!r} — state_dir belongs to a "
            "different checkpoint lineage; keep state_dir and "
            "checkpoint_dir together, or drop both"
        )
    if int(epoch_id) < int(meta.get("max_epoch", -1)):
        raise ValueError(
            f"{what} lineage violation: micro-batch epoch "
            f"{int(epoch_id)} is older than the state store's newest "
            f"epoch {int(meta['max_epoch'])} — state_dir belongs to a "
            "different checkpoint lineage; keep state_dir and "
            "checkpoint_dir together, or drop both"
        )


def _minhash_bands(
    docs: DataFrame,
    n_perm: int,
    band_rows: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(doc_id, band, band_key) LSH banding rows for a batch of documents —
    the same recipe as operators/dedup.minhash_lsh_pairs (wide signatures,
    band key = md5 of the band's minhash values in perm order) built from
    the public minhash_signatures_wide, so streaming state and the batch
    operator hash identical documents to identical buckets."""
    from lmdiskann_jl_spark.operators.dedup import minhash_signatures_wide

    wide = minhash_signatures_wide(
        docs, n_perm=n_perm, id_col=id_col, text_col=text_col
    )
    n_bands = n_perm // band_rows
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "-",
                        *[
                            F.col(f"mh_{b * band_rows + r}").cast("string")
                            for r in range(band_rows)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return wide.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def neardup_stream(
    docs: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int | None = None,
    band_rows: int | None = None,
    trigger_seconds: int | None = None,
):
    """Streaming NEAR-duplicate dedup-on-ingest: every arriving document is
    flagged against ALL documents ever seen, via a persistent MinHash-LSH
    band store — the production shape for deduplicating a continuously
    arriving crawl against the full ingested corpus (watermark-bounded
    ``dedup_stream`` is the exact-key twin; this is the fuzzy twin, and its
    state cannot be watermark-bounded because a near-duplicate of a
    year-old document is still a duplicate).

    Per micro-batch (foreachBatch):
      1. band the batch (``_minhash_bands`` — one groupBy shuffle);
      2. flag docs colliding with the accumulated band store (bucketed
         equi-join on (band, band_key) + left-semi — never all-pairs) OR
         with a batch-internal doc carrying a smaller ``id_col``;
      3. append (doc_id, is_dup) to ``out_dir`` and the batch's bands
         (ALL of them, duplicates included) to ``state_dir``.

    Semantics: first-seen-wins — a doc is a duplicate iff it LSH-collides
    with any EARLIER-ARRIVED doc (arrival order is the dedup priority; for
    an id-ordered stream this equals "has a pair partner with a smaller
    id", which is the batch-SQL-expressible contract the oracle gate pins).
    Duplicates still enter the band store: later arrivals colliding with
    only-duplicate predecessors are duplicates too (the "any earlier doc"
    rule), which keeps the decision order-insensitive WITHIN a batch.

    Replay safety: state rows carry the writing micro-batch's ``_epoch``,
    and the state join reads only STRICTLY EARLIER epochs — so when a
    crash between the two appends makes availableNow replay a batch, the
    replay does not collide with its own first-attempt bands (which would
    flag every doc) and recomputes the identical decisions; ``out_dir``
    re-appends are then exact full-row duplicates and state re-appends
    cannot change any future existence test (at-least-once sink contract,
    same as every foreachBatch writer here).

    Lineage contract (standard Structured Streaming practice): ``state_dir``
    is bound to ``checkpoint_dir`` — epoch ids are monotone only within one
    checkpoint lineage, so carrying the state to a query with a FRESH
    checkpoint (epochs restart at 0) would hide all existing state from the
    first batches.  ENFORCED two ways, not just documented: (a) an explicit
    lineage TOKEN — the first micro-batch of a lineage writes a random run
    id both into a marker file under ``checkpoint_dir`` and into the store's
    meta, and every later batch requires them to match, so a fresh
    checkpoint pointed at old state fails even at epoch 0 == max_epoch 0
    (the hole an epoch high-water mark alone cannot see); (b) the
    ``max_epoch`` high-water mark — a micro-batch whose epoch is strictly
    older raises (a genuine replay arrives with epoch == max_epoch and a
    matching token, and passes).  Keep them together, or drop both.

    Scale: state is O(n_docs x n_bands) fixed-width rows and lives in a
    ``TableCatalog`` under ``state_dir`` (the index tables' storage layer):
    each micro-batch APPENDS one O(batch) segment, and once the segment
    list exceeds ``NEARDUP_STATE_SEGMENTS`` the batch compacts the store
    inline (one latest-wins-free rewrite, same read-amplification bound
    the index gives its base tables) — state-join read cost stays bounded
    for the stream's whole lifetime, not O(micro-batches).  A crash
    between the segment write and the pointer swap leaves an orphan dir
    (harmless: unreferenced, and version allocation skips past it).  At
    100 TB the store is additionally bucketed by ``band_key`` so the join
    is co-located on both sides.  Returns the StreamingQuery handle."""
    from lmdiskann_jl_spark.operators.dedup import DEFAULT_BAND_ROWS, DEFAULT_N_PERM
    from lmdiskann_jl_spark.sources.tables import TableCatalog, read_meta, write_meta

    if not docs.isStreaming:
        raise ValueError("neardup_stream needs a streaming DataFrame (use spark.readStream)")
    np_, br_ = n_perm or DEFAULT_N_PERM, band_rows or DEFAULT_BAND_ROWS

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cat = TableCatalog(spark, state_dir)
        try:
            meta = read_meta(state_dir)
        except FileNotFoundError:
            meta = {"versions": {}}
        token = _lineage_token(checkpoint_dir)
        _check_lineage(meta, token, epoch_id, "neardup_stream")
        # config <-> state binding (round 14, same contract as the embedding
        # store's lsh_config): bands computed under one (n_perm, band_rows)
        # cannot be joined against a store banded under another — the
        # mismatch silently changes every collision decision.  First write
        # stamps the resolved pair; later batches must match.
        band_cfg = [int(np_), int(br_)]
        stored_cfg = meta.get("band_config")
        if stored_cfg is not None and [int(x) for x in stored_cfg] != band_cfg:
            raise ValueError(
                "neardup_stream config violation: state_dir was banded under "
                f"(n_perm, band_rows)={tuple(int(x) for x in stored_cfg)} but "
                f"this stream resolved {tuple(band_cfg)} — restart with the "
                "original configuration or drop state_dir and checkpoint_dir "
                "together"
            )
        bands = _minhash_bands(batch_df, np_, br_, id_col, text_col).persist()
        try:
            bands.count()  # eager: three consumers below reuse, not recompute
            dup_vs_state = None
            if "bands" in meta.get("versions", {}):
                # strictly-earlier epochs only: a replayed batch must not
                # collide with its own first attempt's bands (see docstring)
                state = cat.read("bands", meta).filter(
                    F.col("_epoch") < F.lit(int(epoch_id))
                )
                dup_vs_state = (
                    bands.join(state, ["band", "band_key"], "left_semi")
                    .select("doc_id")
                    .distinct()
                )
            other = bands.select(
                F.col("doc_id").alias("_other"), "band", "band_key"
            )
            dup_in_batch = (
                bands.join(other, ["band", "band_key"])
                .filter(F.col("_other") < F.col("doc_id"))
                .select("doc_id")
                .distinct()
            )
            dups = (
                dup_in_batch if dup_vs_state is None
                else dup_vs_state.unionByName(dup_in_batch).distinct()
            )
            flagged = (
                batch_df.select(F.col(id_col).alias("doc_id"))
                .join(dups.withColumn("_d", F.lit(True)), "doc_id", "left")
                .select("doc_id", F.coalesce("_d", F.lit(False)).alias("is_dup"))
            )
            flagged.write.mode("append").parquet(out_dir)
            stamped = bands.withColumn("_epoch", F.lit(int(epoch_id)))
            # first-ever batch bootstraps the table (append requires an
            # existing snapshot — the index gets that from create()'s empty
            # writes)
            if "bands" in meta.get("versions", {}):
                meta = cat.append("bands", stamped, meta)
            else:
                meta = cat.write("bands", stamped, meta)
            meta["max_epoch"] = int(epoch_id)  # the lineage high-water mark
            meta["lineage_token"] = token
            meta["band_config"] = band_cfg
            if len(cat._segments("bands", meta)) > NEARDUP_STATE_SEGMENTS:
                # inline read-amplification bound (the unlucky-batch latency
                # spike contract stream_insert documents for the index tables)
                meta = cat.compact("bands", meta)
                write_meta(state_dir, meta)
                # compaction bounds READ cost; vacuum bounds DISK — superseded
                # segment dirs would otherwise accumulate forever.  Safe here:
                # _process is the store's only reader and batches serialize.
                cat.vacuum(meta, keep=1)
            else:
                write_meta(state_dir, meta)
        finally:
            # unpersist on every exit: a mid-batch failure (sink write error,
            # compaction failure) would otherwise leak the cached dataset and
            # Structured Streaming's retries would persist fresh copies,
            # accumulating executor storage over a long-running stream
            bands.unpersist()

    writer = docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def embedding_neardup_stream(
    vecs: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int | None = None,
    n_tables: int | None = None,
    seed: int = 42,
    trigger_seconds: int | None = None,
    probes: int = 1,
):
    """Streaming EMBEDDING near-dup dedup-on-ingest: every arriving vector
    is flagged against ALL vectors ever seen — the third member of the
    dedup-on-ingest family (exact-key ``dedup_stream``, MinHash-LSH text
    ``neardup_stream``, and this: sign-random-projection LSH over an
    embedding column), the shape an embedding-heavy training pipeline runs
    ("dedupe arriving embeddings against the ingested corpus").

    Per micro-batch (foreachBatch):
      1. bucket the batch — ``knn_join.add_lsh_buckets`` with plane
         constants fixed by (dim, n_planes, n_tables, seed), the SAME
         recipe as the batch operator ``dedup.lsh_neardup_pairs`` (and
         its parameter picker ``lsh_neardup_params``), so streaming state
         and the batch twin bucket identical vectors identically;
      2. candidates = batch ids colliding with the accumulated bucket
         store on (lsh_table, bucket) — ids only through the exchange —
         OR with a smaller-id batch sibling; every candidate pair then
         pays exactly ONE exact-cosine verification against the state's
         vector table (unlike the text store, state must keep vectors:
         band keys prove nothing, cosine is the contract);
      3. append (vec_id, is_dup) to ``out_dir``; append the batch's
         buckets AND vectors (duplicates included — the any-earlier-doc
         rule) to the state catalog, epoch-stamped.

    Semantics: first-seen-wins, identical to ``neardup_stream`` — a vector
    is a duplicate iff it LSH-collides AND exact-verifies (cos_sim >=
    ``threshold``) against any EARLIER-ARRIVED vector; for an id-ordered
    stream that equals "has a verified partner with a smaller id".

    Replay safety, lineage enforcement (token + max_epoch), inline
    compaction (``NEARDUP_STATE_SEGMENTS``) and vacuum: the same contracts
    as the text band store, shared via ``_lineage_token``/
    ``_check_lineage``; the state join reads strictly-earlier epochs only.

    Scale: state is O(n_vecs x n_tables) fixed-width bucket rows plus
    O(n_vecs) vector rows in a ``TableCatalog``; the candidate join is a
    bucketed equi-join (never all-pairs) and vectors never ride the
    (table, bucket) exchange — they re-attach by id equi-joins only for
    the candidate pairs.  At 100 TB the bucket table is additionally
    bucketed by (lsh_table, bucket) so the state join co-locates.

    ``probes`` (round 13 — the multiprobe state economics the batch AUTO
    point adopted): with ``probes`` > 1 and ``n_tables`` unset, the store
    keeps ``ceil(recipe_tables / probes)`` tables and each ARRIVING
    vector probes ``probes`` buckets per table (its base bucket + flips
    of its lowest-|margin| sign bits).  Only base buckets are APPENDED to
    state — the probe rows live on the query side of the state join and
    die with the micro-batch — so on a long-running stream the state that
    must be joined, compacted, and vacuumed FOREVER shrinks by ~``probes``x
    at matched probe-bucket budget (recall parity measured through sf1,
    SCALING.md).  The (n_planes, n_tables, probes, seed) tuple is part of
    the store's identity: it must stay fixed for the stream's lifetime,
    exactly like the plane seed — state bucketed under one table count
    cannot be joined under another.  ENFORCED since round 14: the first
    write stamps the resolved tuple into the state meta and a restart
    with a different configuration raises at its first micro-batch, the
    same contract the lineage token carries.

    Returns the StreamingQuery handle."""
    from lmdiskann_jl_spark.functions.vector import cosine_similarity
    from lmdiskann_jl_spark.operators.dedup import lsh_neardup_params
    from lmdiskann_jl_spark.operators.knn_join import (
        add_lsh_buckets,
        random_hyperplanes,
    )
    from lmdiskann_jl_spark.sources.tables import TableCatalog, read_meta, write_meta

    if not vecs.isStreaming:
        raise ValueError(
            "embedding_neardup_stream needs a streaming DataFrame "
            "(use spark.readStream)"
        )
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    if n_planes is None or n_tables is None:
        k, tables, _ = lsh_neardup_params(threshold)
        n_planes = n_planes or k
        if n_tables is None:
            # multiprobe economics: each query-side probe substitutes for a
            # stored table, so the recipe's table budget divides by probes
            n_tables = max(2, -(-tables // probes)) if probes > 1 else tables
    planes_by_dim: dict[int, list] = {}  # dim discovered from the first batch

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cat = TableCatalog(spark, state_dir)
        try:
            meta = read_meta(state_dir)
        except FileNotFoundError:
            meta = {"versions": {}}
        token = _lineage_token(checkpoint_dir)
        _check_lineage(meta, token, epoch_id, "embedding_neardup_stream")
        # ENFORCE the config <-> state binding (round-14 review): the
        # docstring has always declared (n_planes, n_tables, probes, seed)
        # part of the store's identity, but only the lineage token was
        # checked — restarting with a different probes/tables value against
        # existing state would silently join buckets computed under an
        # incompatible table count and corrupt dup flags.  First write
        # stamps the resolved tuple; every later batch must match.
        lsh_cfg = [int(n_planes), int(n_tables), int(probes), int(seed)]
        stored_cfg = meta.get("lsh_config")
        if stored_cfg is not None and [int(x) for x in stored_cfg] != lsh_cfg:
            raise ValueError(
                "embedding_neardup_stream config violation: state_dir was "
                f"written under (n_planes, n_tables, probes, seed)="
                f"{tuple(int(x) for x in stored_cfg)} but this stream "
                f"resolved {tuple(lsh_cfg)} — state bucketed under one LSH "
                "configuration cannot be joined under another; restart with "
                "the original configuration or drop state_dir and "
                "checkpoint_dir together"
            )
        sel = batch_df.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
        )
        if not planes_by_dim:
            # dim is fixed for the stream's lifetime: pay the discovery job
            # once, not once per trigger
            dim = len(sel.select("vec").first()["vec"])
            planes_by_dim[dim] = random_hyperplanes(dim, n_planes, n_tables, seed)
        planes = next(iter(planes_by_dim.values()))
        mp = probes > 1
        buckets = (
            add_lsh_buckets(
                sel, planes, vec_col="vec", probes=probes,
                probe_col="_probe" if mp else None,
            )
            .select(
                "vec_id", "lsh_table", "bucket", *(["_probe"] if mp else [])
            )
            .persist()
        )
        # asymmetric multiprobe (round 13): ALL probe rows drive the
        # query side; only BASE buckets (_probe == 0) are matched against
        # and appended to state — one cached bucketing pass serves both
        # sides, and the persistent store stays ~probes-x smaller
        base = buckets.filter(F.col("_probe") == 0).drop("_probe") if mp else buckets
        qside = buckets.drop("_probe") if mp else buckets
        try:
            buckets.count()  # eager: state join + self-join + append reuse it
            batch_vecs = sel  # (vec_id, vec) — the verify side for batch ids
            pair_frames = []
            if "buckets" in meta.get("versions", {}):
                # strictly-earlier epochs only: a replayed batch must not
                # collide with its own first attempt's state rows
                st_b = cat.read("buckets", meta).filter(
                    F.col("_epoch") < F.lit(int(epoch_id))
                )
                st_v = cat.read("vecs", meta).filter(
                    F.col("_epoch") < F.lit(int(epoch_id))
                )
                pair_frames.append(
                    qside.join(
                        st_b.select(
                            F.col("vec_id").alias("_other"), "lsh_table", "bucket"
                        ),
                        ["lsh_table", "bucket"],
                    )
                    .select("vec_id", "_other")
                    .distinct()
                    .join(
                        st_v.select(F.col("vec_id").alias("_other"),
                                    F.col("vec").alias("_ov")),
                        "_other",
                    )
                )
            sib = base.select(
                F.col("vec_id").alias("_other"), "lsh_table", "bucket"
            )
            # within-batch pairs are NORMALIZED to (larger, smaller) BEFORE
            # the distinct: with multiprobe the collision directions are
            # asymmetric (a's probe flips may reach b's base bucket while
            # b's probes miss a's), and the pre-normalization filter
            # `_other < vec_id` silently dropped the a-probes-b direction —
            # the later-arrived (larger-id) vector must be flagged
            # whichever side's probing found the pair (round 13 review)
            pair_frames.append(
                qside.join(sib, ["lsh_table", "bucket"])
                .filter(F.col("_other") != F.col("vec_id"))
                .select(
                    F.greatest("vec_id", "_other").alias("vec_id"),
                    F.least("vec_id", "_other").alias("_other"),
                )
                .distinct()
                .join(
                    batch_vecs.select(F.col("vec_id").alias("_other"),
                                      F.col("vec").alias("_ov")),
                    "_other",
                )
            )
            cands = pair_frames[0]
            for extra in pair_frames[1:]:
                cands = cands.unionByName(extra)
            dups = (
                cands.join(batch_vecs, "vec_id")
                .filter(cosine_similarity(F.col("vec"), F.col("_ov")) >= threshold)
                .select("vec_id")
                .distinct()
            )
            flagged = (
                batch_vecs.select("vec_id")
                .join(dups.withColumn("_d", F.lit(True)), "vec_id", "left")
                .select("vec_id", F.coalesce("_d", F.lit(False)).alias("is_dup"))
            )
            flagged.write.mode("append").parquet(out_dir)
            bstamped = base.withColumn("_epoch", F.lit(int(epoch_id)))
            vstamped = batch_vecs.withColumn("_epoch", F.lit(int(epoch_id)))
            if "buckets" in meta.get("versions", {}):
                meta = cat.append("buckets", bstamped, meta)
                meta = cat.append("vecs", vstamped, meta)
            else:
                meta = cat.write("buckets", bstamped, meta)
                meta = cat.write("vecs", vstamped, meta)
            meta["max_epoch"] = int(epoch_id)
            meta["lineage_token"] = token
            meta["lsh_config"] = lsh_cfg
            if len(cat._segments("buckets", meta)) > NEARDUP_STATE_SEGMENTS:
                # same inline read-amplification + disk bounds as the text
                # band store; _process is the store's only reader
                meta = cat.compact("buckets", meta)
                meta = cat.compact("vecs", meta)
                write_meta(state_dir, meta)
                cat.vacuum(meta, keep=1)
            else:
                write_meta(state_dir, meta)
        finally:
            buckets.unpersist()

    writer = vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
