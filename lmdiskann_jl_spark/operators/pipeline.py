"""Training-data pipeline composition operators.

Beyond the reference's surface (SURVEY.md section 2.6 — it has no relational/
pipeline layer): the keep/drop and batching decisions an LLM data pipeline
applies AFTER the per-document signals (language ID, quality score, token
counts — functions/text.py) are computed.  Everything here is pure column
expressions + shard-parallel windows: no UDFs, no driver loops, and every
operator is deterministic (md5-derived hashing) so the DuckDB oracles
reproduce results bit-for-bit.

Scale design (100 TB):
- stratified sampling: a per-row hash comparison — evaluated inside the scan
  stage, zero shuffles; changing the mix is a constant change, not a re-read;
- sequence packing: the window runs PER SHARD (hash-derived), so packing
  parallelizes across executors — a single global window would funnel the
  corpus through one partition, the classic window anti-pattern;
- quality filter: scan-stage expressions; the reason column makes drop
  accounting (a groupBy(reason).count()) free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lmdiskann_jl_spark.functions.text import (
    hash60,
    langid_expr,
    quality_features,
    token_counts,
)

# deterministic per-language sampling rates (percent kept) for the declared
# query — the shape of a training-mix config; shared with the oracle
SAMPLE_RATES: dict[str, int] = {"en": 35, "und": 15}
SAMPLE_DEFAULT_RATE = 25
SAMPLE_SALT = "sample:"

PACK_BUDGET = 512  # tokens per packed sequence
PACK_SHARDS = 8


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, int] | None = None,
    default_rate: int = SAMPLE_DEFAULT_RATE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-language document sampling (training-mix shaping).

    A document is kept iff ``hash(salt || id) % 100 < rate[lang]`` — the
    standard reproducible-sampling idiom: membership is a pure function of
    the id, so reruns, backfills, and incremental loads agree row-for-row
    (``.sample()`` is seed-and-partitioning dependent; this is not).

    Output: (doc_id, lang, sample_bucket) for kept rows only.
    """
    from lmdiskann_jl_spark.operators.knn_join import _spread

    rates = SAMPLE_RATES if rates is None else rates
    bucket = (
        hash60(F.concat(F.lit(SAMPLE_SALT), F.col(id_col).cast("string"))) % 100
    ).alias("sample_bucket")
    # langid is a heavy scan-stage expression: spread small-file inputs to
    # all cores (no-op on tables already partitioned wider — the 100 TB case)
    documents = _spread(documents)
    # per-language rate via a BROADCAST JOIN, not a CASE expression: filter
    # pushdown substitutes projection aliases into the predicate, and a CASE
    # referencing `lang` would inline the whole langid expression once per
    # branch (measured: 57 copies in the pushed filter, 1.7 s vs 0.4 s at
    # sf0.1).  The join key is an attribute boundary the optimizer cannot
    # substitute through, so langid evaluates exactly once per row.
    rate_df = F.broadcast(
        documents.sparkSession.createDataFrame(
            sorted(rates.items()), "lang string, _rate int"
        )
    )
    langed = documents.select(
        F.col(id_col), langid_expr(F.col(text_col)).alias("lang"), bucket
    )
    return (
        langed.join(rate_df, "lang", "left")
        .filter(F.col("sample_bucket") < F.coalesce(F.col("_rate"), F.lit(default_rate)))
        .select(id_col, "lang", F.col("sample_bucket").cast("long").alias("sample_bucket"))
    )


def pack_sequences(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = PACK_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Shard-parallel next-fit sequence packing under a token budget.

    Documents are hashed into ``n_shards`` shards; within each shard, docs in
    id order accumulate into bins: a doc starts a new bin when the running
    token total would pass ``budget`` (bin = floor(start_offset / budget) —
    contiguous cumsum binning, the set-at-a-time form of next-fit; bins may
    overflow by at most one document, the standard large-scale relaxation of
    sequential first-fit).

    The window partitions BY SHARD, so packing is embarrassingly parallel —
    at 100 TB raise ``n_shards`` so each shard's window state fits one task.
    Output: (doc_id, shard, seq_id, n_tokens) — seq_id unique across shards.
    """
    n_tok = token_counts(F.col(text_col))["n_bpe_tokens"]
    shard = (hash60(F.col(id_col).cast("string")) % n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        documents.select(F.col(id_col), shard.alias("shard"), n_tok.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            F.col("shard").cast("long").alias("shard"),
            (
                F.col("shard").cast("long") * F.lit(1_000_000_000).cast("long")
                + F.floor((F.col("cum") - F.col("n_tokens")) / budget)
            ).alias("seq_id"),
            "n_tokens",
        )
    )


def quality_filter(
    documents: DataFrame,
    min_score: float = 0.5,
    allowed_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 5,
    max_tokens: int = 5000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Composed keep/drop decision from the per-document signals.

    First-failing-rule semantics (evaluation order: language, length bounds,
    quality score) with the reason recorded — drop accounting is then a free
    ``groupBy('reason').count()``.  Output: (doc_id, pred_lang, n_tokens,
    quality_score, reason, keep).
    """
    from lmdiskann_jl_spark.operators.knn_join import _spread

    feats = quality_features(F.col(text_col))
    # langid + quality signals are heavy scan-stage expressions: spread
    # small-file inputs to all cores (no-op on wider tables)
    documents = _spread(documents)
    base = documents.select(
        F.col(id_col),
        langid_expr(F.col(text_col)).alias("pred_lang"),
        feats["n_tokens"].alias("n_tokens"),
        feats["quality_score"].alias("quality_score"),
    )
    reason = (
        F.when(~F.col("pred_lang").isin(*allowed_langs), F.lit("lang"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("quality_score") < min_score, F.lit("low_quality"))
        .otherwise(F.lit("ok"))
    )
    return base.select(
        id_col,
        "pred_lang",
        "n_tokens",
        "quality_score",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


SPLIT_SALT = "split:"
SPLIT_PCTS: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5))


def dataset_split(
    documents: DataFrame,
    pcts: tuple[tuple[str, int], ...] = SPLIT_PCTS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    split = first bucket whose cumulative percentage covers
    ``hash(salt || id) % 100`` — a pure function of the id, so the split is
    stable under reruns, repartitioning, and incremental appends (the
    properties ``randomSplit`` lacks).  Zero shuffles: evaluated in the scan
    stage.  Output: (doc_id, split_bucket, split).
    """
    bucket = hash60(F.concat(F.lit(SPLIT_SALT), F.col(id_col).cast("string"))) % 100
    expr = F.lit(pcts[-1][0])
    cum = 0
    branches = []
    for name, pct in pcts[:-1]:
        cum += pct
        branches.append((name, cum))
    for name, bound in reversed(branches):
        expr = F.when(bucket < bound, F.lit(name)).otherwise(expr)
    return documents.select(
        F.col(id_col),
        bucket.cast("long").alias("split_bucket"),
        expr.alias("split"),
    )


GROUP_SAMPLE_K = 50
GROUP_SAMPLE_SALT = "gsamp:"


def group_sample_k(
    documents: DataFrame,
    k: int = GROUP_SAMPLE_K,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-group deterministic sampling — the other common
    training-mix shape next to rate-based ``stratified_sample``: per group,
    keep the k rows with the smallest ``hash(salt || id)`` (ties impossible:
    the hash is injective on distinct ids for practical purposes, and the id
    itself breaks any residual tie).  A pure function of the ids, so reruns,
    backfills, and repartitioning agree row-for-row — the property a
    reservoir sample lacks.

    One window shuffle keyed by group; Spark's WindowGroupLimit prunes to k
    per group MAP-SIDE before the exchange, so shuffle volume is
    O(n_groups * k * partitions), not the corpus.  Output:
    (id_col, group_col, sample_rank) with rank 1..k in hash order.
    """
    h = hash60(F.concat(F.lit(GROUP_SAMPLE_SALT), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        documents.select(F.col(id_col), F.col(group_col))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def scalable_rank(
    df: DataFrame,
    order_by: list,
    rank_col: str = "rank",
    npartitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Global 1-based row_number over ``order_by`` WITHOUT the
    single-partition global window (the classic scale anti-pattern): range-
    partition on the order keys, rank within each partition, then add
    per-partition row-count offsets.

    ONE action, ONE pass over the data: the ranked rows and the
    per-partition size aggregate both consume the range exchange, and a
    LAZY ``persist`` on the parted/ranked node is the consistency
    guarantee — the offsets branch (the broadcast job AQE runs first)
    materializes the cached partitions, the ranked branch then reads the
    SAME blocks, so the two consumers can never see different placements
    even when column pruning, AQE coalescing, or nondeterministic
    upstream order would otherwise give each branch its own exchange.
    (No eager action: this is a plain lazy cache, not the old persist +
    driver-collected counts + eager localCheckpoint choreography — 4
    jobs, 2 full-data shuffles — that round 7 removed.)  Partition id and
    within-partition rank come free from ``monotonically_increasing_id``
    over the in-partition sort (pid in the upper 31 bits, record index in
    the lower 33 — so no Window.partitionBy(_pid), which would force a
    second full-data hash exchange the ranked rows don't need), and the
    offsets side joins back as a broadcast of at-most-npartitions rows —
    a LEFT join whose null-offset arm is ``raise_error``, so if cache
    loss + recomputation ever re-diverged the branches the query dies
    loudly instead of silently mis-ranking.  Requires ``order_by`` to be
    a total order for a deterministic rank (ties otherwise break by
    partition-arrival order); partitions are bounded at 2^33 rows by the
    id layout — range partitioning keeps real partitions far below that.
    The cache is released by Spark's LRU for MEMORY blocks; the utility
    cannot unpersist mid-plan (the returned DataFrame's correctness rests
    on the cached node, and an eager count-then-unpersist would reopen the
    two-exchange divergence this persist exists to close).  Long-lived
    sessions ranking MANY large inputs should pass ``cache_registry``
    (a list): the cached node is appended to it, and the caller calls
    ``node.unpersist()`` on each entry AFTER the ranked output has been
    materialized (written / collected) — releasing the disk-spilled
    blocks without the blunt `spark.catalog.clearCache()`.  Without a
    registry the node stays cached until Spark's LRU or context end (the
    prior accepted trade, still the default for one-shot queries).
    """
    from pyspark import StorageLevel

    if npartitions is not None:
        parted = df.repartitionByRange(npartitions, *order_by)
    else:
        # no explicit count => AQE sizes the exchange from runtime stats:
        # a 31-row vocab collapses to one partition, a billion-term vocab
        # fans out — the dispatch is the optimizer's
        parted = df.repartitionByRange(*order_by)
    parted = (
        parted.sortWithinPartitions(*order_by)
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if cache_registry is not None:
        cache_registry.append(parted)
    part = parted.withColumn(
        "_pid", F.shiftright("_mid", 33).cast("int")
    ).withColumn("_lrank", (F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    off = F.when(
        F.col("_off").isNull(),
        F.raise_error(
            F.lit(
                "scalable_rank: partition offset missing — the offsets and "
                "ranked branches saw different materializations of the "
                "range exchange"
            )
        ).cast("long"),
    ).otherwise(F.col("_off"))
    return (
        part.join(F.broadcast(offsets), "_pid", "left")
        .withColumn(rank_col, (F.col("_lrank") + off).cast("long"))
        .drop("_pid", "_off", "_mid", "_lrank")
    )


WEIGHTED_SALT = "wsamp:"
WEIGHTED_RATE_SALT = "rate:"
WEIGHTED_RATE_MIN_BPS = 2500  # every source keeps at least 25%
WEIGHTED_RATE_SPAN_BPS = 7500


def source_rates(documents: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-source keep-rate dimension (basis points), hash-derived from the
    source name — a self-contained stand-in for a real domain-mix config
    table.  Output: (source, rate_bps) — one row per distinct source."""
    rate = WEIGHTED_RATE_MIN_BPS + F.pmod(
        hash60(F.concat(F.lit(WEIGHTED_RATE_SALT), F.col(group_col))),
        F.lit(WEIGHTED_RATE_SPAN_BPS),
    )
    return (
        documents.select(group_col)
        .distinct()
        .select(group_col, rate.cast("long").alias("rate_bps"))
    )


def weighted_sample(
    documents: DataFrame,
    rates: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mix resampling: keep a document iff
    ``hash(salt || id) % 10000 < rate_bps(source)``.

    The rates config is a tiny dimension BROADCAST into the scan (the
    realistic shape — mix weights live in a config table, not a literal
    CASE), so at 100 TB this is a broadcast-join + scan-stage filter with
    zero shuffles; membership is a pure hash of the id, so reruns and
    incremental loads agree row-for-row.  Output: kept rows only,
    (doc_id, source, rate_bps).
    """
    keep = F.pmod(
        hash60(F.concat(F.lit(WEIGHTED_SALT), F.col(id_col).cast("string"))),
        F.lit(10_000),
    )
    return (
        documents.join(F.broadcast(rates), group_col)
        .filter(keep < F.col("rate_bps"))
        .select(id_col, group_col, "rate_bps")
    )


DECON_NGRAM = 5  # token-shingle width for benchmark-overlap decontamination


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = DECON_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    ``n``-token shingle with an eval/benchmark corpus (the standard n-gram
    overlap check run before training, e.g. GPT-3 appendix C).

    Shape: explode each side's DISTINCT shingles, equi-join on the shingle
    string, count matches per document.  The benchmark shingle set is
    broadcast by default (eval suites are tiny next to a 100 TB corpus), so
    the only shuffle is the per-doc count; set
    ``broadcast_benchmark=False`` for benchmark sets beyond broadcast size
    (falls back to a hash join on the shingle).

    Output: (doc_id, n_contaminated_ngrams, contaminated) for EVERY input
    document — clean docs carry a zero count.
    """
    from lmdiskann_jl_spark.functions.text import tokens, word_shingles

    def shingles(df: DataFrame, *cols: str) -> DataFrame:
        sh = F.array_distinct(word_shingles(tokens(F.col(text_col)), n))
        return df.select(*cols, F.explode(sh).alias("_sh"))

    bench_sh = shingles(benchmark).distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        shingles(documents, id_col)
        .join(bench_sh, "_sh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        documents.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)).alias(
                "n_contaminated_ngrams"
            ),
            (F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(
    documents: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking (RAG / training context prep).

    Tokenize once, explode per-chunk start offsets, slice the token array —
    scan-stage array expressions, no UDF, zero exchanges.  Chunk identity
    (doc_id, chunk_idx) is deterministic so reruns align; zero-token docs
    produce zero chunks.  Output: (doc_id, chunk_idx, chunk_text).
    """
    from lmdiskann_jl_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    starts = F.sequence(F.lit(0), F.size(F.col("_t")) - 1, F.lit(stride))
    return (
        documents.select(F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    starts,
                    lambda s: F.array_join(F.slice(F.col("_t"), s + 1, chunk_size), " "),
                )
            ).alias("chunk_idx", "chunk_text"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk_text",
        )
    )


MIX_SALT = "mix:"
MIX_BUDGET_NUM = 1  # target corpus = 1/2 of total tokens, split uniformly
MIX_BUDGET_DEN = 2
MIX_ORDER_BUCKETS = 64
# token_budget_mix collects the per-(source, bucket) totals when they fit on
# the driver; above this bound (pathological group cardinality) the operator
# keeps the all-plan broadcast shape.
_MIX_COLLECT_LIMIT = 262_144


def token_budget_mix(
    documents: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget corpus mixing: materialize a target mixture by filling a
    per-source token budget in a deterministic pseudo-random document order.

    The budget is uniform across sources: total_tokens * NUM/DEN div
    n_sources (integer math — exact in any engine).  Documents are ordered
    per source by a salted 60-bit hash of their id (a deterministic
    shuffle); a document is kept iff the cumulative token count BEFORE it is
    under the budget, so each source fills its quota with at most one
    overflowing document.  Over-represented sources are down-sampled to the
    quota; small sources pass through whole — the classic pretraining-mix
    rebalance.

    Scale shape — the cumulative sum is TWO-LEVEL, never one partition per
    source: the hash order key is range-bucketed (bucket = r div W, monotone
    in r), per-(source, bucket) token totals aggregate to a tiny table whose
    running offsets broadcast back, and the within-bucket cumsum windows on
    (source, bucket) — parallelism n_sources x MIX_ORDER_BUCKETS instead of
    n_sources.  Output: (doc_id, source, n_tokens, cum_tokens), where
    cum_tokens equals the single-partition global cumsum by construction.
    """
    from lmdiskann_jl_spark.functions.text import HASH_MOD, hash60, token_counts

    width = (HASH_MOD + MIX_ORDER_BUCKETS - 1) // MIX_ORDER_BUCKETS
    t = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        token_counts(F.col(text_col))["n_bpe_tokens"].alias("t"),
        F.pmod(
            hash60(F.concat(F.lit(MIX_SALT), F.col(id_col).cast("string"))),
            F.lit(HASH_MOD),
        ).alias("r"),
    ).withColumn("bucket", F.expr(f"r div {width}"))

    bucket_tot = t.groupBy("source", "bucket").agg(F.sum("t").alias("bt"))
    # the offsets and budget subtrees both derive from ``bucket_tot``, but as
    # two separate broadcast inputs Catalyst re-executes the expensive
    # token_counts subplan under EACH of them (plus once for ``cum`` itself —
    # three scans total, zero reuse, measured).  bucket_tot is
    # n_sources x MIX_ORDER_BUCKETS rows — already assumed broadcast-small —
    # so collect it ONCE and derive the running offsets and the global budget
    # driver-side in exact integer math; the token_counts subplan then
    # evaluates twice per run instead of three times.  Above the row bound
    # (a pathological group column) fall back to the all-plan shape.
    rows = bucket_tot.limit(_MIX_COLLECT_LIMIT + 1).collect()
    use_local = 0 < len(rows) <= _MIX_COLLECT_LIMIT
    if use_local:
        per_source: dict = {}
        for row in rows:
            per_source.setdefault(row["source"], []).append(
                (row["bucket"], row["bt"])
            )
        total = 0
        off_rows = []
        for src, buckets in per_source.items():
            running = 0
            for bucket, bt in sorted(buckets):
                off_rows.append((src, bucket, running))
                running += bt
            total += running
        budget_val = (total * MIX_BUDGET_NUM) // (MIX_BUDGET_DEN * len(per_source))
        spark = documents.sparkSession
        offsets = spark.createDataFrame(
            off_rows,
            T.StructType(
                [
                    bucket_tot.schema["source"],
                    T.StructField("bucket", T.LongType(), False),
                    T.StructField("offset", T.LongType(), False),
                ]
            ),
        )
    else:
        bw = (
            Window.partitionBy("source")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = bucket_tot.select(
            "source",
            "bucket",
            F.coalesce(F.sum("bt").over(bw), F.lit(0)).alias("offset"),
        )
        budget = (
            bucket_tot.groupBy("source")
            .agg(F.sum("bt").alias("st"))
            .agg(
                F.expr(
                    f"(sum(st) * {MIX_BUDGET_NUM}) div ({MIX_BUDGET_DEN} * count(*))"
                ).alias("budget")
            )
        )
    iw = (
        Window.partitionBy("source", "bucket")
        .orderBy(F.col("r").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        t.join(F.broadcast(offsets), ["source", "bucket"])
        .withColumn("cum_tokens", (F.col("offset") + F.sum("t").over(iw)).cast("long"))
    )
    if use_local:
        kept = cum.filter(
            F.col("cum_tokens") - F.col("t") < F.lit(budget_val).cast("long")
        )
    else:
        kept = cum.crossJoin(F.broadcast(budget)).filter(
            F.col("cum_tokens") - F.col("t") < F.col("budget")
        )
    return kept.select(
        "doc_id", "source", F.col("t").alias("n_tokens"), "cum_tokens"
    )
