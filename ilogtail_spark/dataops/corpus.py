"""Corpus-level training-data pipeline operators — the steps that sit
between per-document scoring (textstats) and dedup (dedup/similarity)
in a 100 TB pretraining-data build:

  * benchmark decontamination (n-gram overlap vs an eval set),
  * duplicate-window statistics (the ExactSubstr signal: what
    fraction of a document's k-token windows also occur elsewhere),
  * deterministic hash-based sampling (reproducible corpus
    subsampling / quality-tiered mixing, no RNG state),
  * token-budget shard packing via a distributed two-phase prefix
    sum (assign documents to fixed-token-budget output shards).

Everything is expression-first: tokenization/shingling/hashing run
scan-side inside WholeStageCodegen; the only shuffles carry
(id, 8-byte hash) or (id, count) rows — never document text.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ilogtail_spark.dataops.dedup import shingles_from_tokens, tokens_col


def _hashed_shingles(
    df: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    hash_fn: Callable[[Column], Column],
) -> DataFrame:
    """(id, __h__) — one row per DISTINCT n-token shingle of each
    document, hashed; documents with < n tokens keep ONE row with a
    null ``__h__`` (explode_outer) so downstream aggregates still see
    every document. Tokens and the shingle array are materialized
    through intermediate projections (separate select stages) so the
    tokenizing split is evaluated once per row, not once per lambda
    reference — the same CollapseProject hazard dedup.py documents."""
    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__t__"))
    sh = toks.select(
        F.col(id_col),
        F.array_distinct(shingles_from_tokens(F.col("__t__"), n=n)).alias("__sh__"),
    )
    return sh.select(
        F.col(id_col), F.explode_outer(F.col("__sh__")).alias("__s__")
    ).select(
        F.col(id_col),
        # xxhash64(NULL) is the non-null seed hash — gate on the
        # shingle itself so short docs keep a genuinely null __h__
        F.when(
            F.col("__s__").isNotNull(), hash_fn(F.col("__s__"))
        ).alias("__h__"),
    )


def contamination_stats(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Benchmark decontamination: per document, how many of its
    word n-gram shingles also occur in the benchmark (eval) corpus —
    the overlap signal used to drop train/test-contaminated documents
    (GPT-3 appendix C–style 13-gram decontamination).

    Returns (id, n_ngrams, n_contaminated, contaminated) for EVERY
    input document (zero-overlap docs included; docs shorter than n
    tokens have n_ngrams = 0 and are never contaminated).

    Scale shape: the benchmark side is small by definition (an eval
    set, not a corpus) — its distinct shingle hashes are broadcast,
    and the corpus side is ONE scan: exploded shingle hashes are
    marked by a broadcast left join and both counts come from the
    same per-id aggregate, so the only exchange is the (id, count)
    partial-aggregated groupBy — the 100 TB side never shuffles text
    and is never scanned twice. ``hash_fn`` defaults to xxhash64
    (8-byte probe keys); oracle queries pass md5 for cross-engine
    parity. ``benchmark`` only needs ``text_col`` — eval sets are
    often bare text files with no ids.
    """
    hash_fn = hash_fn or F.xxhash64
    bench_toks = benchmark.select(
        tokens_col(F.col(text_col)).alias("__t__")
    )
    bench_set = (
        bench_toks.select(
            F.explode(shingles_from_tokens(F.col("__t__"), n=n)).alias("__s__")
        )
        .select(hash_fn(F.col("__s__")).alias("__h__"))
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    probes = _hashed_shingles(df, n, text_col, id_col, hash_fn)
    marked = probes.join(F.broadcast(bench_set), "__h__", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("__h__").alias("n_ngrams"),  # nulls (short docs) excluded
            F.count("__hit__").alias("n_contaminated"),
        )
        .select(
            F.col(id_col),
            F.col("n_ngrams"),
            F.col("n_contaminated"),
            (F.col("n_contaminated") > 0).alias("contaminated"),
        )
    )


def dup_window_stats(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Duplicate-window statistics — the corpus-wide ExactSubstr
    signal (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): for each document, the fraction of its DISTINCT
    k-token windows whose hash occurs in at least one OTHER document.
    High dup_frac ⇒ the document is largely boilerplate shared with
    the rest of the corpus, even when no whole-document near-dup
    fires.

    Returns (id, n_windows, n_dup_windows, dup_frac_micro) — the
    fraction in fixed-point micro units (integer 0..1_000_000) so the
    oracle compare is exact.

    Scale shape: windows are hashed scan-side and the narrow
    (id, 8-byte hash) projection is materialized ONCE (lazy
    localCheckpoint — no job runs until the caller's first action,
    but tokenize+shingle+hash never re-executes for the second
    consumer). Trade-off: localCheckpoint blocks are not replayable
    after executor loss — a run that must survive preemption should
    checkpoint to reliable storage instead. Document text never
    shuffles, and there is no pair join at all (counts only), so a
    boilerplate window shared by 10^6 docs costs 10^6 rows, not
    10^12 pairs. df counts are partial-aggregated map-side.
    """
    hash_fn = hash_fn or F.xxhash64
    # explode_outer keeps short docs (null hash) so the final result
    # covers every document without re-touching the input table
    win_all = _hashed_shingles(df, k, text_col, id_col, hash_fn)
    win_all = win_all.localCheckpoint(eager=False)
    win = win_all.where(F.col("__h__").isNotNull())
    doc_freq = win.groupBy("__h__").agg(
        F.count("*").alias("__df__")  # win is distinct per doc ⇒ count = doc freq
    )
    per_doc = (
        win.join(doc_freq, "__h__")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("__df__") > 1, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    all_docs = win_all.select(F.col(id_col)).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
        F.floor(
            F.coalesce(F.col("n_dup_windows"), F.lit(0))
            * F.lit(1_000_000)
            / F.greatest(F.coalesce(F.col("n_windows"), F.lit(0)), F.lit(1))
        ).cast("bigint").alias("dup_frac_micro"),
    )


def sample_threshold_hex(rate: float) -> str:
    """8-hex-digit threshold for ``deterministic_keep``: a doc is kept
    iff the first 8 hex chars of md5(salt || id) compare strictly
    below this string. md5 hex is uniform, so P(keep) = rate exactly
    (to 1/16^8 granularity) — identical in any engine with md5."""
    if rate >= 1.0:
        return "g"  # sorts after every hex digit ⇒ keep all
    if rate <= 0.0:
        return "00000000"
    return format(int(rate * 16**8), "08x")


def _draw_hex(id_col: Column, salt: str) -> Column:
    """The deterministic 8-hex-char draw shared by every sampler —
    one definition so all samplers agree for the same (salt, id)."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8
    )


def deterministic_keep(
    id_col: Column, rate: float, salt: str = ""
) -> Column:
    """Boolean keep-column for deterministic (seedless, reproducible,
    cluster-size-independent) Bernoulli sampling at ``rate``.

    Unlike ``df.sample()`` (partition-RNG: result changes with
    partitioning and Spark version), the decision is a pure function
    of the row id and salt, so a resumed or re-partitioned run keeps
    EXACTLY the same rows — the property a lineage-checkpointed 100 TB
    corpus build needs. Different ``salt`` values give independent
    draws (e.g. held-out splits)."""
    return _draw_hex(id_col, salt) < F.lit(sample_threshold_hex(rate))


def quality_tiered_sample(
    df: DataFrame,
    tiers: list[tuple[Column, float]],
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Quality-tiered corpus mixing: each row's sampling rate comes
    from the FIRST matching tier predicate (ordered when-chain, like
    fields_with_condition), then a deterministic hash draw keeps or
    drops it. This is the standard "sample low-quality buckets down,
    keep high-quality buckets" pretraining mix, reproducible across
    runs and cluster sizes. Pure scan-side expressions — the sample
    is a filter pushed into the scan stage, no shuffle."""
    h = _draw_hex(F.col(id_col), salt)
    thr: Column = F.lit(sample_threshold_hex(default_rate))
    for cond, rate in reversed(tiers):
        thr = F.when(cond, F.lit(sample_threshold_hex(rate))).otherwise(thr)
    return df.filter(h < thr)


# above this many range partitions the per-partition offset apply
# switches from a literal CASE chain to a broadcast join (a WHEN chain
# of depth 10^4-10^5 degrades Catalyst analysis and falls out of
# whole-stage codegen past the 64KB method limit)
_OFFSET_CASE_MAX = 512


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum of ``value_col`` in global
    ``order_col`` order — WITHOUT the single-partition global window
    that ``Window.orderBy(...)`` (no partitionBy) would plan, which
    serializes the whole dataset through one task and caps out around
    one executor's memory.

    Classic two-phase scan: (1) range-partition by the order key so
    partition i holds a contiguous key range and localCheckpoint that
    layout (both later jobs MUST see identical partitioning — the
    checkpoint pins it); (2) aggregate one (partition, sum) row per
    partition to the driver — num_partitions rows, not data — and
    turn the exclusive running totals into a broadcast-joined offset;
    (3) window WITHIN each partition (parallel) and add the offset.
    Order ties are broken deterministically only if ``order_col`` is
    unique — callers pass a unique id.

    Fault note: the localCheckpoint pins partition identity but is
    NOT replicated — an executor loss mid-job fails the job (rerun)
    rather than silently recomputing with different partition ids;
    for long cluster jobs set a reliable checkpoint dir and swap in
    ``df.checkpoint()`` upstream.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(nparts, F.col(order_col)).withColumn(
        "__pid__", F.spark_partition_id()
    )
    parts = parts.localCheckpoint()
    totals = (
        parts.groupBy("__pid__").agg(F.sum(value_col).alias("__t__")).collect()
    )
    acc = 0
    offsets: dict[int, int] = {}
    for r in sorted(totals, key=lambda r: r["__pid__"]):
        offsets[r["__pid__"]] = acc
        acc += r["__t__"] or 0
    w = Window.partitionBy("__pid__").orderBy(order_col)
    if len(offsets) <= _OFFSET_CASE_MAX:
        # small offset table — fold it into a literal CASE chain
        # (constant after codegen) instead of a join: zero extra
        # exchanges, no driver-side DataFrame round-trip
        off: Column = F.lit(0).cast("bigint")
        for pid, o in offsets.items():
            off = F.when(
                F.col("__pid__") == pid, F.lit(o).cast("bigint")
            ).otherwise(off)
        return (
            parts.withColumn(out_col, F.sum(value_col).over(w) + off)
            .drop("__pid__")
        )
    # large partition counts (the 100 TB regime is 10^4-10^5 range
    # partitions): a depth-num_partitions WHEN chain blows up Catalyst
    # analysis and overruns the 64KB codegen method limit. Broadcast-
    # join the tiny (pid, offset) table instead — BroadcastHashJoin
    # adds no Exchange on the data side, so the plan stays one shuffle.
    spark = parts.sparkSession
    off_df = spark.createDataFrame(
        [(int(pid), int(o)) for pid, o in offsets.items()],
        schema="__pid__ int, __off__ bigint",
    )
    return (
        parts.join(F.broadcast(off_df), "__pid__", "left")
        .withColumn(
            out_col, F.sum(value_col).over(w) + F.coalesce("__off__", F.lit(0))
        )
        .drop("__pid__", "__off__")
    )


def pack_token_budget(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-budget shard packing: assign each document (in id order)
    to a fixed-token-budget output shard — the "pack the corpus into
    ~1 GiB / ~N-token training shards" step of a pretraining build.
    A document lands in the shard where its FIRST token falls:
    shard_id = floor((cumulative_tokens − n_tokens) / budget), so
    shards hold ≥ budget tokens except the last and assignment is a
    pure function of the corpus content (stable across reruns).

    Returns (id, n_tokens, shard_id). Token counts are whitespace
    tokens (swap in the BPE proxy by pre-computing a count column).
    The global cumulative sum uses the two-phase distributed scan in
    ``global_prefix_sum`` — no single-partition global window."""
    counted = df.select(
        F.col(id_col), F.size(tokens_col(F.col(text_col))).alias("n_tokens")
    )
    cum = global_prefix_sum(
        counted, id_col, "n_tokens", out_col="__cum__",
        num_partitions=num_partitions,
    )
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor((F.col("__cum__") - F.col("n_tokens")) / F.lit(budget))
        .cast("bigint")
        .alias("shard_id"),
    )


def chunk_windows(
    df: DataFrame,
    window: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows — the
    chunking step of embedding/retrieval indexing and long-document
    training prep (every RAG pipeline's first transform; the fixed
    window/stride sliding form used by LongFormer-style pretraining
    data builds).

    One chunk starts at every ``stride`` tokens while the start is
    inside the document: starts 0, stride, 2*stride, ... < n_tokens
    (so the final, possibly short, tail is always covered and the rule
    is a pure function of the token count — deterministic across
    engines and reruns). ``stride <= window`` covers every token at
    least once (overlapping / exact tiling); ``stride > window`` is
    the SAMPLED-windows mode and leaves inter-window gaps by design.
    Documents with no tokens (empty or NULL text) produce no chunks.

    Returns (id, chunk_idx, start_tok, n_tokens, chunk_md5): offsets
    plus a digest of the space-rejoined window, NOT the window text —
    downstream exact/near dedup of chunks operates on digests, and the
    caller can always re-slice the text by (start_tok, n_tokens), so
    the explode never multiplies stored text by the overlap factor.

    Scale shape at 100 TB: pure scan-side expressions (tokenize once,
    one posexplode over the start sequence, per-chunk slice+md5 inside
    codegen) — zero shuffle, row growth = ceil(n/stride) per doc,
    bounded by the caller's window/stride choice.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens_col(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t__")).withColumn(
        "__n__", F.size("__t__")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("__n__") - 1, F.lit(0)),
        F.lit(stride),
    )
    chunked = (
        base.where(F.col("__n__") > 0)
        .select(
            F.col(id_col),
            "__t__",
            "__n__",
            F.posexplode(starts).alias("chunk_idx", "__s__"),
        )
    )
    piece = F.slice(F.col("__t__"), F.col("__s__") + 1, window)
    return chunked.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("__s__").cast("bigint").alias("start_tok"),
        F.least(F.lit(window), F.col("__n__") - F.col("__s__"))
        .cast("bigint")
        .alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


def chunk_dedup(
    df: DataFrame,
    window: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level exact dedup — the composed RAG-prep pipeline the
    chunking op exists for: ``chunk_windows`` then keep-min on the
    chunk digest. Boilerplate chunks repeated across documents
    (headers, license blocks, navigation) collapse to ONE index entry;
    each kept row carries ``dup_count`` (how many chunks corpus-wide
    share its digest) so downstream weighting can see repetition.

    Keep rule: the lexicographically lowest (id, chunk_idx) of every
    digest group survives — deterministic on any engine or cluster
    size, the same keep-min contract as exact/near dedup.

    Scale shape at 100 TB: chunking is scan-side (zero shuffle,
    digests only — chunk text never leaves the scan, see
    chunk_windows); dedup is ONE hash Exchange on the 32-byte digest
    carrying (id, idx, 2 offsets) rows. row_number and the group count
    share the one Window partitioning, so there is exactly one shuffle
    end to end.
    """
    ch = chunk_windows(df, window, stride, text_col, id_col)
    w = Window.partitionBy("chunk_md5").orderBy(
        F.col(id_col).asc(), F.col("chunk_idx").asc()
    )
    wall = Window.partitionBy("chunk_md5")
    return (
        ch.withColumn("__rn__", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(wall))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance scoring (data selection for language models)
# ---------------------------------------------------------------------------

def _bucket_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
) -> DataFrame:
    """(id, __b__) — one row per unigram AND bigram feature of each
    document, hashed into ``n_buckets`` buckets (the DSIR hashed
    n-gram feature space). Tokens are materialized through an
    intermediate projection before the bigram lambda references them
    (CollapseProject hazard, see shingles_from_tokens)."""
    toks = df.select(
        F.col(id_col), tokens_col(F.lower(F.col(text_col))).alias("__t__")
    )
    # explode_outer: a document with NO tokens keeps one row with a
    # null bucket, so downstream aggregates still see every document
    feats = toks.select(
        F.col(id_col),
        F.explode_outer(
            F.concat(F.col("__t__"), shingles_from_tokens(F.col("__t__"), n=2))
        ).alias("__f__"),
    )
    return feats.select(
        F.col(id_col),
        (
            F.conv(F.substring(F.md5(F.col("__f__")), 1, 15), 16, 10).cast("long")
            % n_buckets
        ).alias("__b__"),
    )


def importance_scores(
    df: DataFrame,
    target: DataFrame,
    n_buckets: int = 10007,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by the log-likelihood ratio of its hashed n-gram
    (unigram + bigram) features under a bag-of-words model of the
    TARGET distribution vs the RAW distribution, with add-one
    smoothing:

        w(doc) = Σ_f  ln p_target(bucket(f)) − ln p_raw(bucket(f))

    Returns (id, n_features, logratio_micro). High scores = looks
    like the target domain. Feed ``logratio_micro`` into
    ``quality_tiered_sample`` tiers to do the actual resampling.

    Cross-engine exactness: the per-BUCKET weight is quantized to an
    integer (micro units) BEFORE the per-document summation, so doc
    scores are integer sums — no float addition-order divergence.

    Scale shape at 100 TB: the (id, bucket) projection is computed
    ONCE (lazy localCheckpoint — tokenize+bigram+md5, the dominant
    cost, never re-executes for the scoring pass; the same
    replayability trade-off dup_window_stats documents). The raw
    bucket histogram is ONE hash aggregate whose exchange carries at
    most ``n_buckets`` partial rows per task; feature TOTALS are
    summed from the histograms, not re-scanned from the corpus. The
    weight table is at most ``n_buckets`` rows and is broadcast into
    the scoring join, so the per-document aggregate is the only
    data-sized exchange and it carries (id, int) rows. The target
    side is small by definition (a domain sample, not the corpus).
    """
    raw_feats = _bucket_features(df, text_col, id_col, n_buckets)
    raw_feats = raw_feats.localCheckpoint(eager=False)
    tgt_feats = _bucket_features(target, text_col, id_col, n_buckets)

    raw_cnt = (
        raw_feats.where(F.col("__b__").isNotNull())
        .groupBy("__b__")
        .agg(F.count("*").alias("__rc__"))
    )
    tgt_cnt = (
        tgt_feats.where(F.col("__b__").isNotNull())
        .groupBy("__b__")
        .agg(F.count("*").alias("__tc__"))
    )
    # totals derive from the (≤ n_buckets)-row histograms — no third
    # and fourth corpus scan
    raw_tot = raw_cnt.agg(
        F.coalesce(F.sum("__rc__"), F.lit(0)).alias("__rt__")
    )
    tgt_tot = tgt_cnt.agg(
        F.coalesce(F.sum("__tc__"), F.lit(0)).alias("__tt__")
    )

    weights = (
        raw_cnt.join(tgt_cnt, "__b__", "full_outer")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "__b__",
            F.floor(
                (
                    F.log(
                        (F.coalesce(F.col("__tc__"), F.lit(0)) + 1.0)
                        / (F.col("__tt__") + F.lit(float(n_buckets)))
                    )
                    - F.log(
                        (F.coalesce(F.col("__rc__"), F.lit(0)) + 1.0)
                        / (F.col("__rt__") + F.lit(float(n_buckets)))
                    )
                )
                * 1000000
            )
            .cast("bigint")
            .alias("__w__"),
        )
    )

    # left join keeps the null-bucket rows explode_outer emitted for
    # zero-feature docs, so every document reaches the aggregate —
    # no extra scan of df to recover missing ids
    return (
        raw_feats.join(F.broadcast(weights), "__b__", "left")
        .groupBy(id_col)
        .agg(
            F.count("__b__").alias("n_features"),  # nulls excluded
            F.coalesce(F.sum("__w__"), F.lit(0)).alias("logratio_micro"),
        )
        .select(F.col(id_col), "n_features", "logratio_micro")
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: Callable[[Column], Column] | None = None,
    min_docs: int = 2,
) -> DataFrame:
    """The REWRITE form of exact-substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" —
    ExactSubstr): instead of dropping whole documents, excise from
    each document every token covered by a k-token window that also
    occurs in ≥ ``min_docs`` documents. ``dup_window_stats`` is the
    measurement form of this signal; this produces the cleaned text.

    Removal unit is the cross-document duplicated window — ALL of its
    occurrences are removed (no canonical survivor; picking one would
    need a global argmin per window for marginal training value).
    Intra-document repetition is deliberately NOT touched here
    (that's ``textstats.repetition_stats``' signal). The cleaned text
    is the surviving tokens re-joined with single spaces, so output
    is whitespace-normalized.

    Returns (id, n_tokens, n_removed, cleaned).

    Scale shape at 100 TB: the window pass emits narrow
    (id, pos, 8-byte hash) rows — document text never enters the
    duplicate-detection shuffles. The duplicated-hash set comes from
    ONE count-distinct aggregate (occurrences stay linear even for a
    boilerplate window shared by 10^6 docs — no pair join anywhere),
    and covered token positions are (id, int) rows. The rewrite
    re-tokenizes the corpus in a second scan (CPU in the scan stage,
    vs materializing a token-array copy of the whole corpus) and is
    SPLIT: untouched documents — the majority — pass through
    scan-side via an anti join against the touched-id set (AQE
    broadcasts that side when few docs are affected; no token ever
    shuffles for them), while touched documents take a token-level
    (id, pos, token) anti join + re-aggregation. That path is
    shuffle-linear in the touched docs' tokens — a 50k-token
    boilerplate document costs 50k parallel join rows, NOT an
    O(tokens × covered) membership scan inside one task (the
    straggler the naive per-row array_contains rewrite plans).
    """
    hash_fn = hash_fn or F.xxhash64
    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__toks__"))
    win = toks.select(
        F.col(id_col),
        F.posexplode(shingles_from_tokens(F.col("__toks__"), n=k)).alias(
            "__pos__", "__s__"
        ),
    ).select(F.col(id_col), "__pos__", hash_fn(F.col("__s__")).alias("__h__"))
    dup = (
        win.groupBy("__h__")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd__"))
        .filter(F.col("__nd__") >= min_docs)
        .select("__h__")
    )
    cov = (
        win.join(dup, "__h__")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("__pos__"), F.col("__pos__") + (k - 1)).cast(
                    "array<int>"
                )
            ).alias("__i__"),
        )
        .distinct()
    )
    cov = cov.localCheckpoint(eager=False)  # feeds ids, anti join, and counts
    touched_ids = cov.select(F.col(id_col)).distinct()

    untouched = toks.join(touched_ids, id_col, "left_anti").select(
        F.col(id_col),
        F.size(F.col("__toks__")).cast("bigint").alias("n_tokens"),
        F.lit(0).cast("bigint").alias("n_removed"),
        F.array_join(F.col("__toks__"), " ").alias("cleaned"),
    )

    touched = toks.join(touched_ids, id_col, "left_semi")
    tokpos = touched.select(
        F.col(id_col),
        F.size(F.col("__toks__")).alias("__n__"),
        F.posexplode(F.col("__toks__")).alias("__i__", "__tok__"),
    )
    kept = tokpos.join(cov, [id_col, "__i__"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__kept__"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__i__", "__tok__"))),
                lambda s: s["__tok__"],
            ),
            " ",
        ).alias("__cleaned__"),
    )
    # a fully-covered document has NO kept rows — the left join from
    # the touched-doc metadata keeps it with an empty cleaned text
    touched_out = (
        touched.select(
            F.col(id_col), F.size(F.col("__toks__")).cast("bigint").alias("n_tokens")
        )
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("__kept__"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce(F.col("__cleaned__"), F.lit("")).alias("cleaned"),
        )
    )
    return untouched.unionByName(touched_out)


def token_blocklist_filter(
    df: DataFrame,
    words: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
) -> DataFrame:
    """C4-style "bad words" document filter: drop every document
    containing more than ``max_hits`` tokens (lowercased, whitespace)
    from the blocklist (Raffel et al. 2020 drop on ANY hit =
    ``max_hits=0``). The word list is a few thousand entries at most,
    folded into a constant array literal — the filter is a pure
    scan-side expression (pushed into the parquet scan stage, no
    shuffle, no join), same trick as the LSH plane matrix.

    For multi-token phrases or 100k+ lists, switch to the broadcast
    dict_map/contamination join form instead of a literal.
    """
    lit_words = F.array(*[F.lit(w.lower()) for w in sorted(set(words))])
    toks = tokens_col(F.lower(F.col(text_col)))
    # single-parameter closure over the literal array — only DEFAULT
    # ARGS are unsafe in higher-order lambdas (they bind as the index
    # parameter); a plain capture is fine
    hits = F.size(F.filter(toks, lambda t: F.array_contains(lit_words, t)))
    return df.filter(hits <= max_hits)


def mixture_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-composition report per source/domain — the first table
    in any pretraining data card: document count, token and char
    volume, and how much of the bucket is exact-duplicate content
    (docs whose content md5 occurs more than once CORPUS-WIDE — a
    bucket full of cross-source boilerplate shows up here even when
    the bucket itself has no internal dups).

    Scale shape: one scan computes (group, digest, n_tokens, n_chars)
    scan-side; the corpus-wide digest counts are ONE hash aggregate on
    32-byte digests (partial-agg map-side), re-joined on digest — the
    only exchanges carry digests and ints, never text. Output is one
    row per group: broadcast-friendly for downstream mixing joins.

    NULL-text rows (upstream extraction failures) are counted as
    empty content — digesting ``coalesce(text, '')`` keeps them in
    their bucket's n_docs (an inner join on a null digest would
    silently drop them from the report) at the cost of pooling them
    with genuinely-empty docs for dup counting, which is the honest
    reading for a data card.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    narrow = df.select(
        F.col(group_col).alias("__g__"),
        F.md5(text).alias("__d__"),
        F.size(tokens_col(text)).cast("bigint").alias("__nt__"),
        F.length(text).cast("bigint").alias("__nc__"),
    )
    narrow = narrow.localCheckpoint(eager=False)  # one scan feeds both sides
    freq = narrow.groupBy("__d__").agg(F.count(F.lit(1)).alias("__f__"))
    return (
        narrow.join(freq, "__d__")
        .groupBy("__g__")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt__").cast("bigint").alias("n_tokens"),
            F.sum("__nc__").cast("bigint").alias("n_chars"),
            F.sum(F.when(F.col("__f__") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
        )
        .select(
            F.col("__g__").alias(group_col),
            "n_docs", "n_tokens", "n_chars", "n_dup_docs",
        )
    )


# rebalance_mixture compares a 6-hex-char draw (granularity 1/16^6 ~
# 6e-8 — ample for corpus sampling rates): the per-source threshold
# is computed from DATA (target*16^6 div source_tokens), so unlike
# deterministic_keep the math cannot be pre-folded to a literal. All
# threshold arithmetic runs as exact 128-bit integers (DECIMAL(38,0)
# products on the Spark side, HUGEINT in the DuckDB oracle) — a
# double-precision rate would be simpler but engines may round the
# last ulp differently, and one flipped threshold bit changes which
# documents survive; wide integer math is bit-identical everywhere
# and cannot wrap at any realistic budget x weight x corpus size.
_REBALANCE_HEX_DIGITS = 6


def rebalance_mixture(
    df: DataFrame,
    targets: dict[str, int],
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Rebalance a corpus to target per-source token shares — the
    DoReMi/Pile-style "mixture weighting" step: given ``targets``
    mapping source -> weight in MICRO units (parts per 1,000,000 of
    ``token_budget``), deterministically downsample each source so
    its expected token contribution is ``token_budget * weight_micro
    / 1e6``. Sources absent from ``targets`` are dropped (weight 0);
    a source whose target exceeds its actual volume is kept whole
    (rates cap at 1 — upsampling/repeating is epoch logic, not a
    filter's job).

    The keep/drop decision is the same seedless md5 draw as
    :func:`deterministic_keep` — a pure function of (salt, id), so
    the sample is reproducible across runs, partitionings, and
    cluster sizes — but the per-source threshold is data-dependent:
    rate_s = min(1, target_tokens_s / total_tokens_s). All threshold
    arithmetic is exact BIGINT (see _REBALANCE_HEX_DIGITS above), so
    any engine computes the identical document set.

    Scale shape: one narrow pre-aggregate of (source, sum tokens) —
    a handful of rows, broadcast back — then the keep filter is a
    scan-side expression on the main pass. Document text never
    shuffles; the only exchange is the tiny per-source total.
    """
    scale = 16 ** _REBALANCE_HEX_DIGITS
    text = F.coalesce(F.col(text_col), F.lit(""))
    ntok = F.size(tokens_col(text)).cast("bigint")
    totals = (
        df.select(F.col(source_col).alias("__g__"), ntok.alias("__nt__"))
        .groupBy("__g__")
        .agg(F.sum("__nt__").alias("__tot__"))
    )
    pairs: list[Column] = []
    for src, weight_micro in sorted(targets.items()):
        pairs += [F.lit(src), F.lit(int(weight_micro))]
    wmap = F.create_map(*pairs) if pairs else F.create_map()
    # target tokens in exact integer micro math (matches the oracle's
    # budget * w // 1000000), then the 6-hex threshold; >= total means
    # rate 1 -> 'g' sorts after every hex digit, keeping all rows. A
    # weight-0 / absent source gets threshold '000000', below every
    # draw -> dropped.
    thr = F.when(F.col("__target__") >= F.col("__tot__"), F.lit("g")).otherwise(
        F.lpad(
            F.lower(
                F.hex(
                    F.expr(
                        f"CAST(__target__ AS DECIMAL(38,0)) * {scale} div __tot__"
                    )
                )
            ),
            _REBALANCE_HEX_DIGITS,
            "0",
        )
    )
    rates = (
        totals.select(
            "__g__",
            "__tot__",
            F.coalesce(wmap[F.col("__g__")], F.lit(0)).cast("bigint").alias("__w__"),
        )
        .select(
            "__g__",
            "__tot__",
            F.expr(
                f"CAST({int(token_budget)} AS DECIMAL(38,0)) * __w__ div 1000000"
            ).alias("__target__"),
        )
        .select("__g__", thr.alias("__thr__"))
    )
    draw = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        1,
        _REBALANCE_HEX_DIGITS,
    )
    return (
        df.join(
            F.broadcast(rates),
            df[source_col] == rates["__g__"],
            "inner",
        )
        .filter(draw < F.col("__thr__"))
        .drop("__g__", "__thr__")
    )


def decontaminate_filter(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: Callable[[Column], Column] | None = None,
    max_hits: int = 0,
) -> DataFrame:
    """The filter form of :func:`contamination_stats`: DROP documents
    whose benchmark n-gram overlap exceeds ``max_hits`` (default 0 —
    any shared 13-gram disqualifies, the GPT-3 appendix-C policy).
    Returns the surviving rows of ``df`` with all columns intact.

    Scale shape: the stats side is unchanged (benchmark shingles
    broadcast, corpus text never shuffles); the contaminated-id set
    is then BROADCAST for the anti join — contamination against an
    eval set is rare by construction, so the set is tiny. If a
    pathological benchmark contaminates a large corpus fraction,
    drop the broadcast hint and let AQE pick the join side.
    """
    stats = contamination_stats(
        df, benchmark, n=n, text_col=text_col, id_col=id_col, hash_fn=hash_fn
    )
    bad = stats.filter(F.col("n_contaminated") > max_hits).select(id_col)
    return df.join(F.broadcast(bad), id_col, "left_anti")


def assign_splits(
    df: DataFrame,
    splits: dict[str, int],
    id_col: str = "doc_id",
    key_col: str | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: add ``out_col`` naming
    which split each row belongs to. ``splits`` maps split name ->
    share in MICRO units (parts per 1,000,000; must sum to exactly
    1,000,000 so every row is assigned), evaluated in dict order.

    The draw is the same seedless 8-hex md5 draw as
    :func:`deterministic_keep` — a pure function of (salt, key) — so
    the assignment is reproducible across runs, partitionings, and
    engines, and a later re-run never migrates a document between
    splits (the property that keeps eval sets frozen as the corpus
    grows: NEW ids land in splits at the target rates, existing ids
    never move). Cumulative thresholds are exact integer math on the
    16^8 draw space.

    ``key_col`` keys the draw by a grouping column instead of the row
    id — pass a dedup cluster id, canonical URL, or source document
    id so near-duplicate family members land in the SAME split (the
    standard train/test-leakage guard; splitting i.i.d. by row id
    puts near-dups of training docs in the eval set). Rows with a
    NULL key fall back to the row id.

    Scale shape: pure scan-side expression — one md5 + an ordered
    when-chain of literal hex thresholds; no shuffle, no join. The
    split column is a free rider on whatever pass already reads the
    table.
    """
    key = (
        F.coalesce(F.col(key_col).cast("string"), F.col(id_col).cast("string"))
        if key_col is not None
        else F.col(id_col).cast("string")
    )
    return df.withColumn(out_col, split_expr(key, splits, salt))


def split_expr(key: Column, splits: dict[str, int], salt: str = "") -> Column:
    """The pure split-assignment expression behind
    :func:`assign_splits`: given a STRING key column, return the split
    name its seedless md5 draw lands in. Exposed separately so
    consumers that already hold the key as a column — e.g.
    :func:`split_leakage`, which evaluates the split of BOTH sides of
    a candidate pair without a join back to the corpus — compute the
    identical assignment the corpus rows got. Pure scan-side
    expression; same exact 16^8 integer threshold math as
    assign_splits (one shared implementation, so they cannot drift).
    """
    total = sum(splits.values())
    if total != 1_000_000:
        raise ValueError(
            f"split shares must sum to 1,000,000 micro (got {total}): "
            "every row must be assigned to exactly one split"
        )
    if any(w < 0 for w in splits.values()):
        raise ValueError("split shares must be non-negative")
    draw = F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8)
    names = list(splits)
    cum = 0
    expr: Column = F.lit(names[-1])  # remainder of the 16^8 space
    # build the when-chain back to front so earlier splits win
    bounds: list[tuple[str, str]] = []
    for name in names[:-1]:
        cum += splits[name]
        # cum == 1e6 (trailing zero-share splits) maps to 16^8, which
        # would render as the 9-char '100000000' and break the 8-char
        # lexicographic compare — 'g' sorts after every hex digit and
        # expresses the same "everything below here" threshold exactly
        thr = "g" if cum >= 1_000_000 else format(
            cum * 16**8 // 1_000_000, "08x"
        )
        bounds.append((name, thr))
    for name, thr in reversed(bounds):
        expr = F.when(draw < F.lit(thr), F.lit(name)).otherwise(expr)
    return expr


def split_leakage(
    df: DataFrame,
    splits: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    num_hashes: int = 8,
    band_size: int = 2,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Train/test split-leakage audit: how many NEAR-DUPLICATE document
    pairs does a per-document i.i.d. split assignment place in
    DIFFERENT splits? This is the report that justifies
    ``assign_splits(key_col=...)`` — splitting by row id puts
    near-duplicates of training documents into the eval set, and eval
    numbers silently measure memorization (the contamination failure
    GPT-3's appendix C and Dodge et al. 2021 document for C4). Run it
    before freezing a split; a nonzero count means the split must key
    on the dedup-cluster id instead.

    Near-dup candidates come from the same MinHash-LSH banding as
    :func:`ilogtail_spark.dataops.dedup.minhash_candidate_pairs`
    (exact duplicates always collide — the classic same-doc-in-both
    case is a guaranteed catch). Each pair's two splits are computed
    by re-evaluating :func:`split_expr` directly on the pair's id
    columns — a pure expression, NO join back to the corpus, the same
    math assign_splits applied — then cross-split pairs aggregate to
    one row per unordered split pair: (split_a, split_b) with
    split_a < split_b, n_pairs, and n_docs (distinct documents
    involved on either side).

    Scale shape: the candidate self-join shuffles (id, band digest)
    rows only (document text never leaves the scan; ``max_band_bucket``
    caps boilerplate buckets as usual); the split evaluation is
    scan-side on the pair output; both report counters come out of ONE
    aggregate over the pair rows exploded to their two sides (pairs
    count via the d==a side marker, distinct docs via the standard
    two-phase expand), so the candidate-join subtree is evaluated
    once; output is bounded by |splits|^2 rows. Reference analog:
    this is pipeline-level QA the reference leaves to the operator —
    cited here as the data-prep twin of its self-monitor counters
    (core/monitor/MetricConstants.h:1-40).
    """
    from ilogtail_spark.dataops import dedup as _dedup

    pairs = _dedup.minhash_candidate_pairs(
        df.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        band_size=band_size,
        max_band_bucket=max_band_bucket,
    )
    sa = split_expr(F.col("a").cast("string"), splits, salt)
    sb = split_expr(F.col("b").cast("string"), splits, salt)
    leaks = (
        pairs.withColumn("__sa__", sa)
        .withColumn("__sb__", sb)
        .filter(F.col("__sa__") != F.col("__sb__"))
        .select(
            F.least("__sa__", "__sb__").alias("split_a"),
            F.greatest("__sa__", "__sb__").alias("split_b"),
            "a",
            "b",
        )
    )
    sides = leaks.select(
        "split_a",
        "split_b",
        "a",
        F.explode(F.array("a", "b")).alias("__d__"),
    )
    return sides.groupBy("split_a", "split_b").agg(
        # each pair contributes exactly one row with __d__ == a
        # (a < b by construction), so this sums to the pair count
        F.sum(F.when(F.col("__d__") == F.col("a"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pairs"),
        F.countDistinct("__d__").cast("bigint").alias("n_docs"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two corpus snapshots by content digest: one row per doc id
    present in either snapshot, with ``status`` in (added, removed,
    changed, unchanged) plus both digests — the change report an
    incremental 100 TB corpus build runs between crawls to size the
    delta before reprocessing (and the audit trail for "what did this
    refresh actually touch?").

    Returns (id, status, old_md5, new_md5); ``include_unchanged``
    keeps the (typically dominant) unchanged rows too.

    Scale shape: each side reduces to (id, 32-hex digest) AT THE SCAN
    — document text never shuffles; the full-outer sort-merge join
    moves 40-byte rows regardless of document size. Output defaults
    to changed rows only, which is small by construction between
    adjacent snapshots.
    """
    # presence is tracked by explicit flags, NOT digest nullness:
    # md5(NULL) is NULL, so a NULL-text row would otherwise be
    # indistinguishable from an absent row and misreport as added
    o = old.select(
        F.col(id_col).alias("__id__"),
        F.md5(F.col(text_col)).alias("old_md5"),
        F.lit(True).alias("__in_old__"),
    )
    n = new.select(
        F.col(id_col).alias("__id__"),
        F.md5(F.col(text_col)).alias("new_md5"),
        F.lit(True).alias("__in_new__"),
    )
    joined = o.join(n, "__id__", "full_outer")
    status = (
        F.when(F.col("__in_old__").isNull(), F.lit("added"))
        .when(F.col("__in_new__").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_md5").eqNullSafe(F.col("new_md5")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        F.col("__id__").alias(id_col),
        status.alias("status"),
        "old_md5",
        "new_md5",
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def language_mix_by_source(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source language composition — the mC4/CC-style census
    ("which languages does each origin actually contribute, in what
    proportion?") that decides per-language table splits and flags
    extraction regressions (an English-labeled crawl suddenly 30%
    'unknown' usually means boilerplate or encoding damage, not a
    language shift). Composes :func:`textstats.lang_id` (deterministic
    expression-only ID; fastText is the documented production
    swap-in) with a per-source share aggregate.

    Output: (source, lang, n_docs, share_micro) — exact micro share
    WITHIN the source.

    Scale shape: the language label is scan-side, and the source
    column rides THROUGH lang_id as its carried id column — no join
    back to the corpus at all (an id-keyed rejoin would both add two
    full-corpus exchanges and silently drop NULL-id / double-count
    duplicate-id rows; this counts every row, like
    dup_rate_by_source). The share aggregate is bounded by
    sources x languages, and per-source totals broadcast back off the
    aggregated dictionary (the tool_chains idiom). ``id_col`` is
    unused and kept for signature compatibility.
    """
    from ilogtail_spark.dataops import textstats as _ts

    labels = _ts.lang_id(
        df.select(F.col(source_col).alias("source"), F.col(text_col)),
        text_col,
        "source",
    )
    per = (
        labels.groupBy("source", F.col("lang_pred").alias("lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    totals = per.groupBy("source").agg(F.sum("n_docs").alias("__tot__"))
    return per.join(F.broadcast(totals), "source").select(
        "source",
        "lang",
        "n_docs",
        F.expr("CAST(n_docs AS DECIMAL(38,0)) * 1000000 div __tot__")
        .cast("bigint")
        .alias("share_micro"),
    )


def dup_rate_by_source(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source exact-duplication card: for each source, how many
    documents are redundant copies WITHIN that source (n_docs minus
    distinct content digests) and the exact micro duplication rate.
    This is the per-origin attribution behind dedup sizing — a crawl
    source at 40% self-duplication gets a different ingest fix
    (canonicalize URLs, drop mirrors) than one at 2%, and the number
    pairs with cross_source_dups (which sees BETWEEN-source overlap
    this card deliberately does not count).

    Output: (source, n_docs, n_distinct, n_dup_docs, dup_rate_micro);
    NULL-text documents form ONE no-content group per source (the
    digest coalesces to a sentinel — count(DISTINCT) would otherwise
    drop NULL digests entirely and report every NULL-text doc as a
    duplicate).

    Scale shape: ONE partial-aggregated groupBy per source with a
    two-phase exact distinct over (source, 32-hex digest) — text
    never shuffles; output is source-cardinality rows.
    """
    slim = df.select(
        F.col(source_col).alias("source"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("__null__")).alias("__d__"),
    )
    return slim.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("__d__").cast("bigint").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("__d__"))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.expr(
            "CAST(CAST(count(1) - count(DISTINCT __d__) AS DECIMAL(38,0)) "
            "* 1000000 div count(1) AS BIGINT)"
        ).alias("dup_rate_micro"),
    )


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source distribution drift between two corpus snapshots —
    the aggregate companion of :func:`snapshot_diff` (which reports
    membership churn per document): for each source present in either
    snapshot, document counts, total whitespace-token counts, their
    deltas, and the exact integer mean tokens/doc on both sides. This
    is the data card an ingest pipeline checks between crawls before
    re-deriving mixtures — a source whose mean document length halves
    (extraction regression) or whose volume spikes 10x (crawl-loop
    artifact) shows up here long before model metrics move.

    Output: (source, n_docs_old, n_docs_new, doc_delta, tokens_old,
    tokens_new, token_delta, mean_tokens_old_micro,
    mean_tokens_new_micro) — counts coalesce to 0 for a side the
    source is absent from; the means stay NULL there (0-token docs
    and absent sources are different facts).

    Scale shape: each snapshot collapses to a per-source (count,
    token-sum) card AT THE SCAN (token counting is a scan-side
    expression; NULL text counts 0 tokens); the full-outer join runs
    over source-cardinality rows. Text never shuffles.
    """

    def card(df: DataFrame, suffix: str) -> DataFrame:
        # coalesce the INPUT, not the size() output: with legacy
        # sizeOfNull (Spark 3.x default) size(NULL) is -1, not NULL,
        # and an output-side coalesce would silently count -1 tokens
        # per NULL-text doc
        toks = F.size(
            tokens_col(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
        ).cast("bigint")
        return df.groupBy(F.col(source_col).alias("source")).agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_docs_{suffix}"),
            F.sum(toks).cast("bigint").alias(f"tokens_{suffix}"),
        )

    j = card(old, "old").join(card(new, "new"), "source", "full_outer")
    n_old = F.coalesce(F.col("n_docs_old"), F.lit(0)).cast("bigint")
    n_new = F.coalesce(F.col("n_docs_new"), F.lit(0)).cast("bigint")
    t_old = F.coalesce(F.col("tokens_old"), F.lit(0)).cast("bigint")
    t_new = F.coalesce(F.col("tokens_new"), F.lit(0)).cast("bigint")
    return j.select(
        "source",
        n_old.alias("n_docs_old"),
        n_new.alias("n_docs_new"),
        (n_new - n_old).alias("doc_delta"),
        t_old.alias("tokens_old"),
        t_new.alias("tokens_new"),
        (t_new - t_old).alias("token_delta"),
        F.expr(
            "CASE WHEN coalesce(n_docs_old, 0) > 0 THEN "
            "CAST(CAST(coalesce(tokens_old, 0) AS DECIMAL(38,0)) "
            "* 1000000 div n_docs_old AS BIGINT) END"
        ).alias("mean_tokens_old_micro"),
        F.expr(
            "CASE WHEN coalesce(n_docs_new, 0) > 0 THEN "
            "CAST(CAST(coalesce(tokens_new, 0) AS DECIMAL(38,0)) "
            "* 1000000 div n_docs_new AS BIGINT) END"
        ).alias("mean_tokens_new_micro"),
    )


def quota_candidates(
    df: DataFrame,
    quota: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "",
    prefilter_factor: int = 8,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The candidate stage of :func:`source_quota_sample`, exposed so
    the scale audit can measure it: returns (narrow, cbounds, cand)
    where ``narrow`` is the (id, source, draw) projection, ``cbounds``
    the per-source (n, candidate-threshold) table, and ``cand`` the
    prefiltered candidate set whose size — ~prefilter_factor * quota
    per oversized source, all rows of small sources — is what the
    rank window actually sorts."""
    draw = _draw_hex(F.col(id_col), salt)
    narrow = df.select(
        F.col(id_col).alias("__qid__"),
        F.col(source_col).alias("__qsrc__"),
        draw.alias("__qdraw__"),
    )
    counts = narrow.groupBy("__qsrc__").agg(F.count("*").alias("__qn__"))
    cap = quota * prefilter_factor
    # ceil(cap * 16^8 / n) as an 8-hex threshold; strictly < 16^8
    # whenever n > cap (the only branch that uses it), so lpad never
    # truncates. Integer DIV, not float division: cap * 16^8 passes
    # 2^53 at cap ~2.1e6 and doubles would round the ceiling there.
    # Bigint-safe to cap ~2.1e9 (16^8 * cap < 2^63).
    thr_val = F.expr(
        f"CAST(({cap * 16**8} + __qn__ - 1) DIV __qn__ AS BIGINT)"
    )
    thr = F.when(F.col("__qn__") <= F.lit(cap), F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(thr_val), 8, "0"))
    )
    cbounds = counts.select(
        F.col("__qsrc__").alias("__qsrc2__"), "__qn__", thr.alias("__qthr__")
    )
    cand = narrow.join(
        F.broadcast(cbounds),
        narrow["__qsrc__"].eqNullSafe(cbounds["__qsrc2__"]),
    ).drop("__qsrc2__")
    cand = cand.filter(F.col("__qdraw__") < F.col("__qthr__"))
    return narrow, cbounds, cand


def source_quota_sample(
    df: DataFrame,
    quota: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "",
    prefilter_factor: int = 8,
) -> DataFrame:
    """Per-source document cap: keep at most ``quota`` documents from
    each source, chosen deterministically — the "no domain may exceed
    K documents" rule every web corpus applies so a handful of
    mega-domains don't dominate the mixture. The kept set is the
    ``quota`` LOWEST deterministic draws per source (same seedless
    md5 draw as :func:`deterministic_keep`, ties broken by id), so
    the sample is reproducible across runs, partitionings, engines —
    and STABLE under corpus growth in the only way a hash draw can
    be: a document's draw never changes, so re-running after a crawl
    adds/evicts documents only at the quota boundary.

    Semantics (what the oracle pins): exactly
    ``row_number() OVER (PARTITION BY source ORDER BY draw, id) <=
    quota``. NULL sources form their own group.

    Scale shape — this is NOT implemented as that window. A window
    sorts every group in full, and one 10^10-document mega-domain
    (precisely what quotas exist for) lands in a single task. Instead:

    1. One narrow aggregate counts docs per source (rows are
       (source, n) — tiny).
    2. Per source, a CANDIDATE threshold keeps ~``prefilter_factor *
       quota`` expected draws (exact integer hex arithmetic on the
       16^8 draw space; sources with n <= factor*quota skip the
       prefilter). The candidate set is ~factor*quota rows per
       source REGARDLESS of group size, so the rank step that
       follows sorts bounded groups.
    3. Exactness guard: candidate counts are verified >= min(quota,
       n) per source; a shortfall source (astronomically unlikely at
       factor 8 — mean candidates = 8*quota — but hash draws are not
       proofs) falls back to all its rows. This check is the one
       eager action in the operator (collects only shortfall
       sources, normally zero rows).
    4. The quota-th (draw, id) pair per source — a one-row-per-source
       BOUNDS table — broadcasts back, and the final keep decision is
       a scan-side comparison. Document text never shuffles and never
       sorts; the only wide ops touch (id, source, 8-hex-draw) rows.

    At 10^7+ distinct sources the bounds broadcast approaches the
    driver limit — raise ``spark.sql.autoBroadcastJoinThreshold``
    sizing accordingly or accept a shuffled bounds join by wrapping
    the result; the candidate path itself is cardinality-safe.
    """
    if quota <= 0:
        raise ValueError(f"quota must be positive (got {quota})")
    if prefilter_factor < 1:
        raise ValueError("prefilter_factor must be >= 1")
    draw = _draw_hex(F.col(id_col), salt)
    narrow, cbounds, cand = quota_candidates(
        df, quota, id_col, source_col, salt, prefilter_factor
    )
    # exactness guard (normally selects zero rows). Anchored on the
    # COUNTS side with a left join: a source whose prefilter caught
    # zero candidates has no row in the candidate aggregate at all,
    # and an inner join would silently skip exactly the sources that
    # need the refill most.
    cand_counts = cand.groupBy("__qsrc__").agg(F.count("*").alias("__qc__"))
    shortfall = (
        cbounds.filter(F.col("__qthr__") != "g")
        .join(
            cand_counts,
            F.col("__qsrc2__").eqNullSafe(F.col("__qsrc__")),
            "left",
        )
        .filter(
            F.coalesce(F.col("__qc__"), F.lit(0))
            < F.least(F.lit(quota), F.col("__qn__"))
        )
        .select(F.col("__qsrc2__").alias("__qsrc__"))
        .collect()
    )
    if shortfall:
        bad = [r["__qsrc__"] for r in shortfall]
        bad_df = narrow.sparkSession.createDataFrame(
            [(s,) for s in bad], "__qsrc2__ string"
        )
        refill = (
            narrow.join(
                F.broadcast(bad_df),
                narrow["__qsrc__"].eqNullSafe(bad_df["__qsrc2__"]),
                "left_semi",
            )
            .join(
                F.broadcast(cbounds),
                narrow["__qsrc__"].eqNullSafe(cbounds["__qsrc2__"]),
            )
            .drop("__qsrc2__")
        )
        keep_bad = cand.join(
            F.broadcast(bad_df),
            cand["__qsrc__"].eqNullSafe(bad_df["__qsrc2__"]),
            "left_anti",
        )
        cand = keep_bad.unionByName(refill)
    w = Window.partitionBy("__qsrc__").orderBy("__qdraw__", "__qid__")
    bounds = (
        cand.withColumn("__qrn__", F.row_number().over(w))
        .filter(F.col("__qrn__") == F.least(F.lit(quota), F.col("__qn__")))
        .select(
            F.col("__qsrc__").alias("__qsrc2__"),
            F.col("__qdraw__").alias("__qbdraw__"),
            F.col("__qid__").alias("__qbid__"),
        )
    )
    out = df.join(
        F.broadcast(bounds),
        F.col(source_col).eqNullSafe(F.col("__qsrc2__")),
        "inner",
    )
    keep = (draw < F.col("__qbdraw__")) | (
        (draw == F.col("__qbdraw__")) & (F.col(id_col) <= F.col("__qbid__"))
    )
    return out.filter(keep).drop("__qsrc2__", "__qbdraw__", "__qbid__")


def prep_report(
    df: DataFrame,
    splits: dict[str, int],
    min_quality_micro: int = 500_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """The composed corpus-prep pipeline, end to end: exact dedup →
    quality filter → train/val/test split assignment → per-(split,
    source) data card. One registry-checkable query that exercises
    the stages a real pretraining build chains (the per-stage ops are
    the public API; this pins that they COMPOSE — column contracts,
    determinism, and plan shape survive chaining).

    Returns (split, source, n_docs, n_tokens, sum_quality_micro)
    ordered by (split, source).

    Scale shape: dedup shuffles 32-byte digests (rank-1 window on
    md5(text)); the quality score rides the post-dedup scan as ONE
    projection (``passthrough=True`` — no join back to the corpus);
    the split draw is scan-side; the report is a partial+final hash
    aggregate on a handful of (split, source) groups. Document text
    crosses the wire exactly once — in the dedup exchange, which any
    exact dedup fundamentally requires (or avoid even that by
    substituting digest-based :func:`~ilogtail_spark.dataops.dedup.
    incremental_exact_dedup` when a digest state table exists).
    """
    from ilogtail_spark.dataops.dedup import drop_exact_duplicates
    from ilogtail_spark.dataops.textstats import quality_score

    kept = drop_exact_duplicates(df, text_col=text_col, id_col=id_col)
    scored = quality_score(kept, text_col=text_col, id_col=id_col, passthrough=True)
    good = scored.filter(F.col("quality_score_micro") >= min_quality_micro)
    split = assign_splits(good, splits, id_col=id_col, salt=salt)
    return (
        split.groupBy(F.col("split"), F.col(source_col).alias("source"))
        .agg(
            F.count("*").alias("n_docs"),
            # n_tokens rides along from quality_score's passthrough —
            # re-tokenizing here would run the dominant cost twice
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("quality_score_micro").alias("sum_quality_micro"),
        )
        .orderBy("split", "source")
    )


def drop_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 1,
) -> DataFrame:
    """C4's global line dedup (Raffel et al. 2020 §2.2: "we discarded
    all but one of any three-sentence span occurring more than once",
    applied at the line granularity the public C4 release uses): a
    line that appears in multiple documents — navigation chrome,
    cookie banners, boilerplate footers — survives in exactly ONE
    place, its first occurrence in (id, position) order; every other
    occurrence is removed. Contrast with
    :func:`remove_duplicate_spans`, which removes ALL occurrences of
    duplicated token windows and keeps no canonical copy.

    Returns (id, n_lines, n_removed, cleaned): ``cleaned`` re-joins
    surviving lines with single newlines. Lines shorter than
    ``min_line_chars`` (after trim) are passthrough — never deduped,
    always kept (blank separators are not boilerplate). Line identity
    is the md5 of the TRIMMED line.

    Scale shape at 100 TB: line text never shuffles. The explode
    emits (id, pos, 32-hex digest); the global winner per digest is
    one min_by aggregate over those narrow rows; surviving positions
    re-aggregate to (id, sorted int array); and the only text-bearing
    operation is the final co-partitioned join of that positions
    table back to the corpus on id — after which the rewrite is a
    scan-side index filter on split(text). Untouched documents (the
    overwhelming majority) pass through the same single join; a
    two-branch split like remove_duplicate_spans' would save the
    rewrite CPU but not the join, so the simpler one-path form wins
    here.
    """
    lines = F.split(F.col(text_col), "\n")
    keyed = df.select(
        F.col(id_col).alias("__lid__"),
        F.posexplode(lines).alias("__pos__", "__line__"),
    ).select(
        "__lid__",
        "__pos__",
        F.md5(F.trim(F.col("__line__"))).alias("__lh__"),
        (F.length(F.trim(F.col("__line__"))) >= min_line_chars).alias(
            "__eligible__"
        ),
    )
    dedupable = keyed.filter(F.col("__eligible__"))
    # global first occurrence: min (id, pos) per digest — min over a
    # packed struct keeps it ONE aggregate (no self-join, no window)
    winners = dedupable.groupBy("__lh__").agg(
        F.min(F.struct("__lid__", "__pos__")).alias("__w__"),
    )
    marked = dedupable.join(winners, "__lh__").select(
        "__lid__",
        "__pos__",
        (
            (F.col("__w__.__lid__") == F.col("__lid__"))
            & (F.col("__w__.__pos__") == F.col("__pos__"))
        ).alias("__keep__"),
    )
    survivors = (
        marked.filter(F.col("__keep__"))
        .groupBy("__lid__")
        .agg(F.sort_array(F.collect_list("__pos__")).alias("__kept__"))
    )
    # passthrough lines (below min_line_chars) are always kept: union
    # their positions into the kept set
    passthrough = (
        keyed.filter(~F.col("__eligible__"))
        .groupBy("__lid__")
        .agg(F.sort_array(F.collect_list("__pos__")).alias("__pt__"))
    )
    kept = (
        survivors.join(passthrough, "__lid__", "full_outer")
        .select(
            "__lid__",
            F.sort_array(
                F.array_union(
                    F.coalesce(F.col("__kept__"), F.array()),
                    F.coalesce(F.col("__pt__"), F.array()),
                )
            ).alias("__kept__"),
        )
    )
    joined = df.join(
        kept, df[id_col] == kept["__lid__"], "left"
    ).drop("__lid__")
    keep_arr = F.coalesce(F.col("__kept__"), F.array())
    rebuilt = F.array_join(
        F.transform(keep_arr, lambda p: F.element_at(lines, p + 1)),
        "\n",
    )
    # NULL text: split(NULL) is NULL, size(NULL) is -1, and the doc is
    # absent from the kept table — without the guard it would come out
    # as cleaned='' with n_lines=-1. A NULL document passes through as
    # NULL with zero counts instead.
    is_null = F.col(text_col).isNull()
    n_lines = F.when(is_null, F.lit(0)).otherwise(F.size(lines))
    return joined.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        (n_lines - F.when(is_null, F.lit(0)).otherwise(F.size(keep_arr)))
        .cast("int")
        .alias("n_removed"),
        F.when(is_null, F.lit(None).cast("string"))
        .otherwise(rebuilt)
        .alias("cleaned"),
    )


def distinctive_terms(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` distinctive terms per source by exact integer
    tf-idf — the "what vocabulary characterizes this slice of the
    corpus?" card behind mixture debugging and domain labeling.
    Score = tf * idf_micro, where tf is the term's total occurrence
    count within the source and idf_micro = (N_docs * 1e6) div df
    (df = corpus-wide number of DISTINCT documents containing the
    term). The idf weight is the LINEAR inverse-document-frequency
    ratio in micro units — the monotone core of classic idf, chosen
    over log() because integer `div` is bit-identical on every engine
    while log drifts in the last ulp (the grouped_quantiles
    reasoning). Returns (source, term, tf, doc_freq, idf_micro,
    score) with per-source rank ties broken by term ascending.

    Scale shape: tokens explode scan-side and collapse map-side into
    BOTH aggregates — (term, doc) distinct rows for df and
    (source, term) counts for tf — so the shuffles carry vocabulary-
    sized rows, never token streams. The document-frequency table
    (one row per distinct term) broadcast-joins onto the per-source
    counts, and the top-k filter is a row_number <= k that compiles
    to WindowGroupLimit: each task forwards at most k terms per
    source. Overflow bound: tf * idf_micro is computed as a
    DECIMAL(38,0) product (DuckDB HUGEINT) and emitted as BIGINT —
    exact while tf * idf_micro < 2^63 (a term would need ~9.2e12
    occurrences at the maximum idf to wrap; rescale idf or switch tf
    to within-source document frequency far before that).
    """
    if top_k < 1:
        raise ValueError(f"distinctive_terms: top_k must be >= 1, got {top_k}")
    # NULL-id docs are excluded outright: countDistinct drops NULLs
    # from n_docs, so letting their terms into doc_freq would yield
    # doc_freq > n_docs (idf below 1e6) and diverge from any oracle
    docs = df.filter(F.col(id_col).isNotNull())
    toks = docs.select(
        F.col(source_col).alias("__src__"),
        F.col(id_col).alias("__id__"),
        F.explode(
            tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
        ).alias("term"),
    )
    n_docs = docs.select(F.countDistinct(F.col(id_col)).alias("__n__"))
    doc_freq = (
        toks.select("term", "__id__")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("doc_freq"))
    )
    idf = doc_freq.join(F.broadcast(n_docs)).select(
        "term",
        "doc_freq",
        F.expr("CAST(__n__ AS DECIMAL(38,0)) * 1000000 div doc_freq")
        .cast("bigint")
        .alias("idf_micro"),
    )
    tf = toks.groupBy("__src__", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    scored = tf.join(idf, "term").select(
        F.col("__src__").alias(source_col),
        "term",
        "tf",
        "doc_freq",
        "idf_micro",
        F.expr("CAST(tf AS DECIMAL(38,0)) * idf_micro")
        .cast("bigint")
        .alias("score"),
    )
    rn = F.row_number().over(
        Window.partitionBy(source_col).orderBy(
            F.col("score").desc(), F.col("term")
        )
    )
    return scored.withColumn("__rn__", rn).filter(
        F.col("__rn__") <= top_k
    ).drop("__rn__")


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` bigram collocations across the corpus by exact
    integer association lift — the PMI-style "which word pairs stick
    together?" mining behind phrase detection (word2vec's phrase
    pass), tokenizer-merge candidates, and template discovery.

    Score: lift_micro = (N_bigrams * pair_count * 1e6)
    div (c1 * c2) — the linear-scale core of PMI (PMI = log2 of
    lift / 1e6). log() is dropped for the distinctive_terms reason:
    it is monotone, so the RANKING is identical, and integer div is
    bit-identical across engines while log drifts in the last ulp.
    c1/c2 are corpus-wide unigram occurrence counts (lowercased
    whitespace tokens), N_bigrams the corpus-wide bigram total.
    ``min_count`` drops rare pairs BEFORE any join (the classic PMI
    degenerate case: two hapaxes that co-occur once score the
    maximum; the threshold is the standard fix AND the plan's
    pruning step). Ties break (w1 asc, w2 asc).

    Scale shape: tokens/bigrams explode scan-side and collapse
    map-side into vocabulary-bounded count tables — the shuffles
    carry (term) and (w1, w2) count rows, never token streams. The
    bigram total is derived as sum(pair_count) over the UNFILTERED
    pair table, not by a second pass over the corpus: both branches
    hang off the identical (w1, w2) aggregate exchange, which
    Spark's exchange-reuse rule dedupes (plan-audited
    ReusedExchange) — the bigram explode runs ONCE. The min_count
    filter prunes the pair table before it joins the unigram table
    twice (hash joins on the term key; the unigram table is
    vocabulary-sized, so no broadcast is assumed). The bigram total
    joins as a broadcast single row, and the final top-k is an
    orderBy+limit that compiles to TakeOrderedAndProject — only k
    rows ever reach the driver side of the sort. Overflow: the
    numerator is DECIMAL(38,0) (N_bigrams * pair_count * 1e6 <=
    ~1e32 at 10^13 tokens — within 38 digits), emitted as BIGINT
    after the div.
    """
    if min_count < 1:
        raise ValueError(f"collocations: min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"collocations: top_k must be >= 1, got {top_k}")
    toks_df = df.select(
        tokens_col(F.lower(F.coalesce(F.col(text_col), F.lit("")))).alias("__toks__")
    )
    bi = (
        toks_df.select(
            F.explode(shingles_from_tokens(F.col("__toks__"), 2)).alias("__bi__")
        )
        .select(
            F.split_part(F.col("__bi__"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("__bi__"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        # semantically a no-op (split_part of a non-null shingle is
        # never NULL) — but stating it HERE means the unigram joins
        # infer no extra null-filter below the (w1, w2) exchange, so
        # the pair-table branch and the sum(pair_count) total branch
        # stay canonically identical and the exchange is REUSED (one
        # bigram explode, not two; plan-audited)
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    pair_all = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_count")
    )
    pair_counts = pair_all.filter(F.col("pair_count") >= min_count)
    uni_counts = (
        toks_df.select(F.explode("__toks__").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c__"))
    )
    n_bi = pair_all.select(
        F.coalesce(F.sum("pair_count"), F.lit(0)).cast("bigint").alias("__nbi__")
    )
    scored = (
        pair_counts.join(
            uni_counts.select(F.col("term").alias("w1"), F.col("__c__").alias("c1")),
            "w1",
        )
        .join(
            uni_counts.select(F.col("term").alias("w2"), F.col("__c__").alias("c2")),
            "w2",
        )
        .join(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            "pair_count",
            "c1",
            "c2",
            F.expr(
                "CAST(CAST(__nbi__ AS DECIMAL(38,0)) * pair_count * 1000000"
                " div (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"
            ).alias("lift_micro"),
        )
    )
    return scored.orderBy(
        F.col("lift_micro").desc(), "w1", "w2"
    ).limit(top_k)


def cross_source_dups(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix — for every unordered source
    pair, how many DISTINCT document contents appear in both: the
    "is crawl B just a re-crawl of crawl A?" / "did the synthetic
    set leak into the web dump?" data card that decides dedup ORDER
    (dedup the copied-from source first so provenance survives) and
    flags licensing contamination between slices.

    Returns (source_a, source_b, n_shared) with source_a < source_b
    lexicographically, one row per pair sharing >= 1 content digest.
    NULL text hashes as the empty string (the mixture_report
    convention: extraction failures are a countable content, not a
    hole); NULL-source rows are excluded (no slice to attribute).

    Scale shape: documents collapse to (md5, source) at the scan —
    text never shuffles, and the ONE exchange carries 32-byte
    digests with per-task partial source SETS (collect_set's
    map-side partial aggregation deduplicates repeated
    (digest, source) pairs inside each task, so no separate
    .distinct() shuffle is needed). Each digest folds to its sorted
    source set (bounded by the source count, not the dup count),
    pairs expand per digest (sources-squared AT MOST, per digest —
    tiny), and the final count is a pair-keyed aggregate bounded by
    sources^2 rows total. No self-join of the corpus ever happens;
    the oracle states the same result AS a self-join because SQL
    lacks the fold.
    """
    digests = df.filter(F.col(source_col).isNotNull()).select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__d__"),
        F.col(source_col).alias("__src__"),
    )
    per_digest = digests.groupBy("__d__").agg(
        F.array_sort(F.collect_set("__src__")).alias("__srcs__")
    )
    srcs = F.col("__srcs__")
    n = F.size(srcs)
    # all i<j pairs of the per-digest source set; sequence guard:
    # only build index ramps when the set has >= 2 sources
    pairs = F.when(n >= 2, F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.try_element_at(srcs, i).alias("source_a"),
                    F.try_element_at(srcs, j).alias("source_b"),
                ),
            ),
        )
    )).otherwise(
        F.expr("array()").cast("array<struct<source_a:string,source_b:string>>")
    )
    exploded = per_digest.select(F.explode(pairs).alias("__p__"))
    return (
        exploded.groupBy(
            F.col("__p__.source_a").alias("source_a"),
            F.col("__p__.source_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )


def length_histogram(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source document-length histogram over power-of-2 buckets —
    the length-distribution data card (truncation cliffs, empty-doc
    spikes, and per-source length skew all show up here before any
    tokenizer runs). Buckets are EXACT integer bit-lengths, not
    float log2: bucket b > 0 covers lengths [2^(b-1), 2^b - 1]
    (computed as length(bin(n)) — both engines render the same
    binary string), bucket 0 is exactly the empty/NULL documents.

    Returns (source, bucket, lo_chars, hi_chars, n_docs) — a NULL
    source stays a NULL slice row (the mixture_report convention:
    both engines group NULL keys together, the provenance hole is
    countable, and the card joins cleanly onto the mixture report
    without inventing a sentinel a real source name could collide
    with).

    Scale shape: one scan-side projection (length + binary-string
    bucket) into one (source, bucket) aggregate with map-side
    partials; output is bounded by sources x ~40 buckets. Text never
    shuffles.
    """
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    bucket = F.when(n == 0, F.lit(0)).otherwise(
        F.length(F.bin(n.cast("bigint")))
    ).cast("int")
    out = (
        df.select(F.col(source_col).alias("source"), bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    # SQL shiftleft (the python wrapper only takes literal bit counts)
    lo = F.when(F.col("bucket") == 0, F.lit(0)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")
    )
    hi = F.when(F.col("bucket") == 0, F.lit(0)).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1")
    )
    return out.select(
        "source",
        F.col("bucket").cast("bigint").alias("bucket"),
        lo.cast("bigint").alias("lo_chars"),
        hi.cast("bigint").alias("hi_chars"),
        "n_docs",
    )


def canary_scan(
    df: DataFrame,
    canaries: list[str],
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Canary-string contamination scan: count exact substring
    occurrences of each canary (benchmark GUIDs, tracer strings
    planted in eval sets a la BIG-bench canary) across the corpus.
    Complements ``decontaminate`` (shingle overlap vs a benchmark
    CORPUS) for the degenerate-but-common case where contamination is
    marked by a literal sentinel string — no shingling, no regex.

    Returns (canary, n_docs, n_hits, first_doc) for canaries with at
    least one hit, where n_hits counts OCCURRENCES (a doc containing
    the canary twice contributes 2) via the replace-length identity
    ``(len(t) - len(replace(t, c, ''))) / len(c)`` — pure integer
    math inside codegen, one pass per canary over the scan.

    Scale: the canary list is a constant-folded literal array (same
    contract as token_blocklist_filter); per-doc work is scan-side,
    text never shuffles, and the aggregate keys on the canary string
    itself — at most ``len(canaries)`` groups, so the exchange is a
    few rows per task regardless of corpus size.
    """
    if not canaries:
        raise ValueError("canary_scan: canaries must be non-empty")
    if any(not c for c in canaries):
        raise ValueError("canary_scan: empty canary string")
    if len(set(canaries)) != len(canaries):
        raise ValueError("canary_scan: duplicate canary strings")
    missing = [c for c in (id_col, text_col) if c not in df.columns]
    if missing:
        raise ValueError(f"canary_scan: missing columns {missing}")
    text = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    hits = F.array(
        *[
            F.struct(
                F.lit(c).alias("canary"),
                (
                    (F.length(text) - F.length(F.replace(text, F.lit(c))))
                    / F.lit(len(c))
                )
                .cast("bigint")
                .alias("hits"),
            )
            for c in canaries
        ]
    )
    exploded = (
        df.select(
            F.col(id_col).alias("__doc__"),
            F.explode(
                F.filter(hits, lambda s: s["hits"] > 0)
            ).alias("__h__"),
        )
        .select(
            F.col("__h__.canary").alias("canary"),
            F.col("__h__.hits").alias("hits"),
            "__doc__",
        )
    )
    return exploded.groupBy("canary").agg(
        F.countDistinct("__doc__").cast("bigint").alias("n_docs"),
        F.sum("hits").cast("bigint").alias("n_hits"),
        F.min("__doc__").alias("first_doc"),
    )


def packing_efficiency(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Shard-utilization report over :func:`pack_token_budget`'s
    assignment — the QA card that answers "did the packing plan
    actually produce even training shards, and how much budget does
    the overflow rule cost?" before a multi-day tokenization run
    bakes the layout in.

    Per shard: n_docs, n_tokens, fill_micro (= n_tokens * 1e6 div
    budget — >= 1e6 for every shard except possibly the last, by the
    first-token assignment rule), overflow_tokens (= n_tokens -
    budget; negative only on an underfull final shard), and is_last.
    Ordered by shard_id.

    Scale shape: inherits pack_token_budget's two-phase distributed
    prefix sum (no single-partition global window); the report itself
    is one combiner-fed aggregate on shard_id over (id, n_tokens,
    shard_id) rows plus a window over the SHARD table (bounded by
    corpus_tokens / budget, not documents).
    """
    if budget <= 0:
        raise ValueError(
            f"packing_efficiency: budget must be > 0, got {budget}"
        )
    packed = pack_token_budget(
        df, budget, text_col=text_col, id_col=id_col,
        num_partitions=num_partitions,
    )
    shards = packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    wall = Window.partitionBy()
    return (
        shards.withColumn("__mx__", F.max("shard_id").over(wall))
        .select(
            "shard_id",
            "n_docs",
            "n_tokens",
            F.expr(f"n_tokens * 1000000 div {int(budget)}").alias(
                "fill_micro"
            ),
            (F.col("n_tokens") - F.lit(int(budget))).alias(
                "overflow_tokens"
            ),
            (F.col("shard_id") == F.col("__mx__")).alias("is_last"),
        )
        .orderBy("shard_id")
    )


def novelty_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document shingle novelty — "is the tail of this corpus
    still adding anything?": for each document, how many of its
    distinct word ``shingle_n``-grams appear for the FIRST time in
    the corpus order (first owner = minimum ``id_col`` carrying the
    shingle). A corpus whose late documents trend toward
    novelty_micro 0 is re-crawling itself; dedup thresholds and
    crawl-frontier budgets get tuned against exactly this curve.
    Complements dup_windows (which finds the REPEATED spans) by
    scoring what each document contributes that is NEW.

    Output, one row per document with at least one shingle (docs
    shorter than ``shingle_n`` tokens emit no row — nothing to
    score): (id_col, n_shingles [distinct], n_novel [first-owned],
    n_seen_before, novelty_micro [floor micro share]).

    Scale shape: shingles hash to 32-hex digests scan-side (shared
    tokenizer with the minhash family, so the same text always
    yields the same shingle set); the distinct and the min-owner
    aggregate shuffle only (id, digest) pairs; the owner table joins
    back on the digest reusing that exchange; per-doc rollup is the
    only other shuffle. Raw shingle text never leaves the scan, and
    no state grows with corpus size beyond the distinct-shingle
    vocabulary.
    """
    missing = [c for c in (text_col, id_col) if c not in df.columns]
    if missing:
        raise ValueError(f"novelty_curve: missing columns {missing}")
    if shingle_n < 1:
        raise ValueError(
            f"novelty_curve: shingle_n must be >= 1, got {shingle_n}"
        )
    toks = df.select(
        F.col(id_col),
        tokens_col(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks__"),
    )
    dist = (
        toks.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingles_from_tokens(F.col("__toks__"), shingle_n),
                        F.md5,
                    )
                )
            ).alias("__sg__"),
        )
    )
    owners = dist.groupBy("__sg__").agg(F.min(id_col).alias("__owner__"))
    per_doc = (
        dist.join(owners, "__sg__")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("__owner__") == F.col(id_col), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_novel",
        (F.col("n_shingles") - F.col("n_novel"))
        .cast("bigint")
        .alias("n_seen_before"),
        F.expr("n_novel * 1000000 div n_shingles").alias("novelty_micro"),
    )


LICENSE_CLASSES: list[tuple[str, str]] = [
    ("copyright", r"(?i)(copyright|\(c\)|©|all rights reserved)"),
    ("cc", r"(?i)(creative commons|cc-by)"),
    ("gpl", r"(?i)(gnu general public license|\bgpl\b)"),
    ("confidential", r"(?i)(confidential|proprietary|do not distribute)"),
]


def license_scan(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    classes: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """License / rights-marker census per source: how much of each
    source carries copyright lines, open-license grants (CC/GPL), or
    confidentiality markers — the compliance card a training-data
    release reads next to the PII and canary scans (canary_scan
    finds PLANTED strings; this counts the organic rights language
    that decides whether a source may be trained on at all). Marker
    classes are (name, regex) pairs, deliberately simple
    alternations (Java-regex/RE2-identical, shared with the oracle);
    swap in counsel-approved patterns via ``classes``.

    Output per source: n_docs, one ``<name>_docs`` count per class,
    flagged_docs (docs matching ANY class), flagged_micro. A doc can
    count toward several classes (a GPL header almost always also
    says "copyright").

    Scale shape: every class regex collapses to a boolean at the
    scan; ONE combiner-fed rollup on source is the only shuffle and
    carries a handful of ints per row. Text never leaves the scan.
    """
    classes = LICENSE_CLASSES if classes is None else classes
    if not classes:
        raise ValueError(
            "license_scan: classes must name at least one (name, regex)"
        )
    missing = [c for c in (text_col, source_col) if c not in df.columns]
    if missing:
        raise ValueError(f"license_scan: missing columns {missing}")
    t = F.coalesce(F.col(text_col), F.lit(""))
    flags = df.select(
        F.col(source_col).alias("source"),
        *[t.rlike(pat).alias(f"__{name}__") for name, pat in classes],
    )
    any_flag = None
    for name, _ in classes:
        c = F.col(f"__{name}__")
        any_flag = c if any_flag is None else (any_flag | c)
    agg = flags.withColumn("__any__", any_flag).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(F.when(F.col(f"__{name}__"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{name}_docs")
            for name, _ in classes
        ],
        F.sum(F.when(F.col("__any__"), 1).otherwise(0))
        .cast("bigint")
        .alias("flagged_docs"),
    )
    return agg.select(
        "source",
        "n_docs",
        *[f"{name}_docs" for name, _ in classes],
        "flagged_docs",
        F.expr("flagged_docs * 1000000 div n_docs").alias("flagged_micro"),
    )


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Pairwise source vocabulary-overlap matrix: Jaccard similarity
    of the (lowercased, whitespace-token) vocabularies of every
    source pair — the mixture-design question "are two of my
    sources basically the same corpus?" that per-source cards
    (lang_mix, distinctive_terms) can't answer because they never
    compare sources to each other. cross_source_dups finds shared
    DOCUMENTS; this measures shared LANGUAGE even when no document
    is duplicated.

    ``min_df`` keeps only tokens appearing in >= min_df documents of
    a source (per-source document frequency), cutting hapax noise
    before comparing. Output: one row per unordered pair a < b —
    (source_a, source_b, vocab_a, vocab_b, n_shared,
    jaccard_micro = shared·1e6 div (a + b − shared)).

    Scale shape: the raw corpus collapses to DISTINCT (source,
    token) pairs at the first aggregate (with the doc-frequency
    count folded in — the only raw-token pass); the pair join runs
    on the VOCABULARY table (token-cardinality-bounded, text never
    shuffles), and per-source sizes broadcast back onto the
    source-pair matrix (|sources|² rows). A hot shared token fans
    out |sources-containing-it|² pair rows — bounded by the source
    count squared, not the corpus.
    """
    if min_df < 1:
        raise ValueError(f"source_overlap: min_df must be >= 1, got {min_df}")
    missing = [c for c in (source_col, text_col) if c not in df.columns]
    if missing:
        raise ValueError(f"source_overlap: missing columns {missing}")
    vocab = (
        df.filter(
            F.col(source_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .select(
            F.col(source_col).alias("src"),
            # array_distinct => one row per (doc, token): the count
            # below IS the per-source document frequency
            F.explode(
                F.array_distinct(
                    tokens_col(F.lower(F.col(text_col).cast("string")))
                )
            ).alias("tok"),
        )
        .groupBy("src", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__df__"))
        .filter(F.col("__df__") >= min_df)
        .select("src", "tok")
    )
    sizes = vocab.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab")
    )
    left = vocab.select(F.col("src").alias("a"), "tok")
    right = vocab.select(F.col("src").alias("b"), "tok")
    shared = (
        left.join(right, "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.withColumnRenamed("src", "a")).withColumnRenamed(
                "vocab", "vocab_a"
            ),
            "a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("src", "b")).withColumnRenamed(
                "vocab", "vocab_b"
            ),
            "b",
        )
        .select(
            F.col("a").alias("source_a"),
            F.col("b").alias("source_b"),
            "vocab_a",
            "vocab_b",
            "n_shared",
            F.expr(
                "n_shared * 1000000 div (vocab_a + vocab_b - n_shared)"
            ).alias("jaccard_micro"),
        )
    )


def vocab_growth(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_steps: int = 10,
) -> DataFrame:
    """Vocabulary-growth (Heaps-law) curve: distinct-token count
    after each prefix of the corpus in ``id_col`` order, at
    ``n_steps`` evenly spaced checkpoints — the quantitative "is the
    corpus tail still adding vocabulary, or just repeating it?"
    companion of novelty_curve (which scores each DOC's novel-
    shingle share; this tracks the corpus-level curve a scaling
    decision reads). A flattening curve says more of the same
    source adds little; a still-climbing one says the corpus is
    undersampled.

    Checkpoint s (1..n_steps) covers the first ceil(n_docs·s/steps)
    documents by id rank. Each token's FIRST document rank maps to
    its checkpoint via pure integer math (s = (rank·steps + n − 1)
    div n — the smallest checkpoint whose prefix contains it), a
    per-step count plus a running sum gives the curve. Output per
    step: (step, n_docs_prefix, new_tokens [first seen inside this
    step's slice], vocab_size [cumulative]). NULL-id/text docs are
    dropped; tokens are the standard lowercased whitespace family.

    Scale shape: the doc-rank window is DOC-bounded (one row per
    document, not per token — at 10^9+ docs swap in a dense id or a
    range-partitioned rank; the curve itself only needs rank
    ORDER, not contiguity). Tokens collapse to (token, min rank) in
    one combiner-fed aggregate — the only token-cardinality pass —
    then to n_steps rows; the running sum is a window over
    ``n_steps`` rows.
    """
    if n_steps < 2:
        raise ValueError(f"vocab_growth: n_steps must be >= 2, got {n_steps}")
    missing = [c for c in (id_col, text_col) if c not in df.columns]
    if missing:
        raise ValueError(f"vocab_growth: missing columns {missing}")
    docs = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(id_col).alias("__id__"), F.col(text_col).alias("__t__"))
    ranked = docs.withColumn(
        "__rank__", F.row_number().over(Window.orderBy("__id__"))
    )
    n_docs = ranked.count()
    if n_docs == 0:
        raise ValueError("vocab_growth: no usable documents")
    first_seen = (
        ranked.select(
            "__rank__",
            F.explode(
                F.array_distinct(tokens_col(F.lower(F.col("__t__"))))
            ).alias("tok"),
        )
        .groupBy("tok")
        .agg(F.min("__rank__").alias("__fsr__"))
    )
    # smallest checkpoint whose prefix ceil(n_docs*s/steps) contains
    # rank r: s = (r-1)*steps div n + 1 (NOT ceil(r*steps/n) — the
    # two only coincide when n_docs % n_steps == 0). bigint cast
    # before the multiply: row_number is int32 and r*steps would
    # wrap past ~2^31/steps documents.
    per_step = (
        first_seen.select(
            F.expr(
                f"cast((cast(__fsr__ as bigint) - 1) * {int(n_steps)} "
                f"div {n_docs} + 1 as int)"
            ).alias("step")
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_tokens"))
    )
    steps = df.sparkSession.range(1, n_steps + 1).select(
        F.col("id").cast("int").alias("step")
    )
    w = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
    return (
        steps.join(per_step, "step", "left")
        .withColumn(
            "new_tokens",
            F.coalesce(F.col("new_tokens"), F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "n_docs_prefix",
            # ceil(n_docs * s / steps) in truncating-div-safe form
            F.expr(
                f"cast((cast(step as bigint) * {n_docs} "
                f"+ {int(n_steps)} - 1) div {int(n_steps)} as bigint)"
            ),
        )
        .withColumn(
            "vocab_size", F.sum("new_tokens").over(w).cast("bigint")
        )
        .select("step", "n_docs_prefix", "new_tokens", "vocab_size")
    )
