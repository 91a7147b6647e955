"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Hashing is md5-based (portable across Spark / DuckDB / any engine —
the oracle queries compute the identical signatures in SQL). MinHash
uses the lexicographic minimum of salted md5 hex digests per hash
function — a valid min-wise permutation family over the shingle set.

Scale story (100 TB):
  * exact: one shuffle on the content hash; Catalyst partial-agg
    combines map-side, AQE coalesces output partitions.
  * minhash signatures: computed scan-side per row (no shuffle);
    banding groups by (band_idx, band_hash) — the ONLY shuffle, and
    bucket sizes are small by construction, so the candidate-pair
    self-join never materializes O(n^2).
  * jaccard verification: inverted-index join on shingles with a
    document-frequency cap on hot shingles (a shingle appearing in
    >max_df docs carries no discriminative signal and would create a
    quadratic hot key — the salting analog for similarity joins).
  * simhash: per-row expression (no shuffle); near-dup candidates =
    exact match on rotated bit-blocks (pigeonhole over hamming
    distance), again a bucket groupBy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    """Whitespace tokens (empties removed)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array
    column. ``toks`` must be a plain column reference: the lambda body
    references it n times per element, and a computed expression there
    would be re-evaluated per reference (measured: the tokenizing
    split ran 3x per shingle when inlined — the dominant cost of the
    whole minhash job)."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Shingles straight from a text column — convenience for single
    use; hot paths should materialize tokens first (see
    shingles_from_tokens)."""
    return shingles_from_tokens(tokens_col(text), n)


def exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(id, __s__) with tokens materialized through a real column."""
    toks_df = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks__")
    )
    return toks_df.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("__toks__"), shingle_n)).alias("__s__"),
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content md5: keeper = min(id).
    One hash-aggregate shuffle on the 32-byte digest, never on the
    document text itself (don't shuffle payloads, shuffle hashes)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


NORMALIZE_PUNCT_RE = r"[^\p{L}\p{N}]+"


def normalize_expr(text: Column) -> Column:
    """Canonical text form for fuzzy-exact dedup (the C4/Gopher
    normalize-then-hash preprocessing): lowercase, every run of
    non-letter/non-digit characters (punctuation, whitespace, symbols
    — unicode-aware) collapses to one space, leading/trailing space
    trimmed. Catches the near-universal trivial variants exact dedup
    misses — trailing whitespace, smart quotes, case, punctuation
    spacing — without any near-dup machinery. Pure scan-side
    expression. Engine-parity note: the REGEX is the Java/RE2-shared
    subset, but lower() uses each engine's own case mapping, and full
    case mappings diverge on a few exotic code points (U+0130 'İ'
    gains a combining dot under Java, ß handling differs) — the
    operator's contract is per-engine determinism and partitioning
    invariance; cross-engine digest equality holds for
    simple-case-mapping text (all of the fixture corpus)."""
    return F.trim(F.regexp_replace(F.lower(text), NORMALIZE_PUNCT_RE, " "))


def exact_dedup_normalized(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """:func:`exact_dedup` over the normalized form: duplicate groups
    keyed by md5 of :func:`normalize_expr` output, keeper = min(id).
    Same one-digest-shuffle plan; the normalization rides the scan.
    NULL text normalizes to NULL and forms one group (the exact-dedup
    convention)."""
    normed = df.select(
        F.col(id_col),
        normalize_expr(F.col(text_col).cast("string")).alias("__norm__"),
    )
    return exact_dedup(normed, "__norm__", id_col)


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The filtering form of exact dedup: keep the min-id row of every
    content group, drop the rest. One window over the content digest —
    the digest partitioning shuffles 32-byte hashes, not documents,
    and the kept rows stream straight out of the rank filter."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def near_dedup_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    max_df: int | None = None,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """The end-to-end near-dup PRUNE: minhash-LSH candidates ->
    exact-Jaccard verify -> greedy keep-lowest-id (drop the higher id
    of every verified pair; transitive clustering is
    :func:`connected_components`).

    Scale structure (each step result-identical to the naive
    "LSH + verify over the whole corpus" definition the SQL oracle
    implements — with one documented max_df edge case at the member
    shortcut below):

    1. **Exact-group collapse first.** Identical documents share every
       minhash band, so k copies of one boilerplate doc alone create
       k^2/2 candidate pairs — the classic LSH hot bucket. Signatures
       run on one min-id representative per distinct content; the
       non-representative members are dropped directly (an identical
       pair has Jaccard 1.0 >= any threshold <= 1, and is always an
       LSH candidate when a signature exists). Equivalence: a member
       m is dropped in the naive pipeline via the pair
       (rep(m), m); a representative r is dropped naively via some
       a < r iff it is dropped here via rep(a) <= a < r (identical
       content => identical signature and shingle set).
    2. **Verification restricted to LSH candidates.** The Jaccard
       join runs over the shingles of candidate-pair members ONLY
       (semi-join on the candidate id set), so its cost is
       O(|candidate docs|) — the LSH stage genuinely prunes; the
       full-corpus inverted-index join never runs.
    3. **No forced broadcast of the drop set.** At web-scale dup
       rates the drop set is a large fraction of the corpus; the
       anti-join shuffles long ids only, and AQE broadcasts it by
       itself whenever it actually is small.

    ``max_band_bucket`` additionally caps residual hot band buckets
    (distinct-but-cross-similar boilerplate families): buckets with
    more members are dropped from candidate generation, trading
    bounded recall loss for a hard bound on join fan-out.

    Shuffle discipline: DOCUMENT TEXT NEVER SHUFFLES. Exact-group
    membership travels as (id, digest) rows; signatures/bands are
    computed scan-side for every doc and the representative filter is
    a semi-join on the tiny band rows (identical docs have identical
    signatures, so rep-bands == bands-of-reps); verification shuffles
    (id, shingle) pairs; the final prune is an id anti-join."""
    # exact-group membership from (id, digest, has-signature) rows
    meta = df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("__d__"),
        (F.size(tokens_col(F.col(text_col))) >= shingle_n).alias("__sig__"),
    )
    keep = meta.groupBy("__d__").agg(F.min(id_col).alias("__keep__"))
    marked = meta.join(keep, "__d__")
    rep_ids = marked.filter(F.col(id_col) == F.col("__keep__")).select(id_col)

    sig = minhash_signature(
        df.select(id_col, text_col), text_col, num_hashes, shingle_n, id_col,
        keep_signatureless=False,
    )
    bands = minhash_bands(sig, num_hashes, band_size, id_col).join(
        rep_ids, id_col, "semi"
    )
    cands = _band_candidate_pairs(bands, id_col, max_band_bucket)
    cand_ids = (
        cands.select(F.col("a").alias(id_col))
        .union(cands.select(F.col("b").alias(id_col)))
        .distinct()
    )
    # Jaccard verify over candidate docs ONLY — the pruning step:
    # shingles explode scan-side and the semi-join restricts the
    # (id, shingle) rows to candidate ids before the inverted-index
    # self-join, so text still does not shuffle
    verified = ngram_jaccard_pairs(
        df.select(id_col, text_col),
        text_col,
        id_col,
        shingle_n,
        threshold,
        max_df,
        restrict_ids=cand_ids,
    )
    drop_reps = (
        cands.join(verified, ["a", "b"])  # candidate AND above threshold
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    if threshold <= 1.0:
        # non-representative members of groups that HAVE a minhash
        # identity (>= shingle_n tokens). Shorter identical docs have
        # null signatures, form no candidate pairs, and are kept —
        # exactly as the naive pipeline keeps them. Known max_df edge
        # divergence: if max_df prunes EVERY shingle of a duplicated
        # doc, the naive pipeline computes no Jaccard row and keeps
        # the duplicate, while this shortcut still drops it — dropping
        # a byte-identical copy is always the safe direction for a
        # training-data prune, so the shortcut stands.
        member_drop = marked.filter(
            (F.col(id_col) != F.col("__keep__")) & F.col("__sig__")
        ).select(id_col)
        drop = drop_reps.union(member_drop).distinct()
    else:
        drop = drop_reps
    return df.join(drop, id_col, "left_anti")


def connected_components(
    pairs: DataFrame, max_iter: int = 20, strict: bool = False
) -> DataFrame:
    """Connected components over a near-dup pair graph: (id, comp)
    where comp is the MINIMUM id reachable from the node — the
    transitive clustering that greedy pair-pruning approximates.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds (near-dup clusters are shallow — chains
    of shared boilerplate — so single-digit rounds in practice, capped
    by ``max_iter``). Each round is one join + partial-aggregated
    groupBy on the EDGE list only — the corpus itself is never
    touched — and lineage is truncated per round (localCheckpoint) so
    the plan does not grow exponentially with iterations. The edge
    list itself is checkpointed once after symmetrization: every
    round's join and every convergence probe then reuses the
    materialized edges instead of re-running the union+distinct
    shuffle from the candidate-pair lineage (at scale that lineage is
    the entire LSH banding job, re-executed O(diameter) times
    otherwise).

    If label propagation has not converged when ``max_iter`` is
    exhausted the labels are NOT the transitive closure: with
    ``strict=True`` that raises RuntimeError; otherwise it emits a
    warning — approximate output is never returned silently."""
    edges = pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
    sym = edges.union(
        edges.select(F.col("y").alias("x"), F.col("x").alias("y"))
    ).distinct()
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("x").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    labels = labels.localCheckpoint()
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("y"), F.col("comp").alias("ncomp")
                ),
                "y",
            )
            .groupBy("x")
            .agg(F.min("ncomp").alias("nmin"))
            .withColumnRenamed("x", "id")
        )
        new = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                "comp"
            ),
        )
        new = new.localCheckpoint()
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components: not converged after {max_iter} rounds "
            "(component diameter exceeds max_iter); labels are approximate"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    keep_signatureless: bool = True,
) -> DataFrame:
    """(id, mh0..mh{k-1}): lexicographic min over shingles of
    md5('{i}:' || shingle).

    Engine choice is measured: the higher-order form
    (array_min(transform(shingles, md5))) runs the lambda INTERPRETED
    per element (~7.5us/md5); exploding the shingles and computing the
    k mins as a hash AGGREGATE keeps every md5 inside whole-stage
    codegen (~10x faster). Map-side partial aggregation collapses each
    doc to one row before the groupBy exchange, so the shuffle carries
    |docs| x k digests, never the shingles. Docs with fewer than
    ``shingle_n`` tokens keep a row with null signatures (left join
    back), matching the array_min-of-empty semantics;
    ``keep_signatureless=False`` skips that join-back for callers
    that only consume the banding (which excludes null signatures
    anyway) — one broadcast join less in the candidate path."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("__s__")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    if not keep_signatureless:
        return sig
    return df.select(id_col).join(sig, id_col, "left")


def minhash_bands(
    df: DataFrame,
    num_hashes: int = 8,
    band_size: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: band j hash = md5(mh_{j*r} || .. || mh_{j*r+r-1}).
    Returns (id, band_idx, band_hash) — the join key for candidate
    pairs. Docs agreeing on ANY band are candidates.

    Docs with NULL signatures (fewer than shingle_n tokens) are
    EXCLUDED: concat_ws would silently skip the nulls and hash every
    signature-less doc to md5('') in every band — one quadratic hot
    bucket of false-positive pairs. A doc with no shingles has no
    LSH identity; exact dedup is the right tool for those."""
    df = df.filter(F.col("mh0").isNotNull())
    bands = []
    for j in range(num_hashes // band_size):
        cols = [F.col(f"mh{j * band_size + r}") for r in range(band_size)]
        bands.append(
            F.struct(
                F.lit(j).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    return df.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("b")
    ).select(id_col, F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash"))


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one LSH band.
    The self-join happens WITHIN band buckets only.

    ``max_band_bucket`` drops band buckets holding more than that many
    docs before the self-join: a bucket of k docs yields k^2/2 pairs,
    so one boilerplate family can dominate the whole job. Exact-dedup
    first (see near_dedup_filter) removes the identical-content cause;
    the cap bounds the residual distinct-but-similar case. The bucket
    counts are one partial-aggregated groupBy over (band_idx,
    band_hash) — digests only, never documents."""
    sig = minhash_signature(
        df.select(id_col, text_col), text_col, num_hashes, id_col=id_col,
        keep_signatureless=False,
    )
    bands = minhash_bands(sig, num_hashes, band_size, id_col)
    return _band_candidate_pairs(bands, id_col, max_band_bucket)


def _band_candidate_pairs(
    bands: DataFrame, id_col: str, max_band_bucket: int | None = None
) -> DataFrame:
    """The candidate-generation core shared by minhash_candidate_pairs
    and near_dedup_filter (ONE copy, so the two call sites cannot
    drift): optional hot-bucket cap, then the within-bucket self-join
    producing distinct (a < b) id pairs."""
    if max_band_bucket is not None:
        hot = (
            bands.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("__n__"))
            .filter(F.col("__n__") > max_band_bucket)
            .drop("__n__")
        )
        bands = bands.join(hot, ["band_idx", "band_hash"], "left_anti")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b")
        )
        .distinct()
    )


def minhash_calibration(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Signature-calibration card for the MinHash near-dup stack: for
    every LSH candidate pair, the Jaccard similarity the SIGNATURES
    estimate (share of equal minhash components, exact integer micro)
    next to the TRUE shingle-set Jaccard. This is the tuning report
    behind the num_hashes / band_size / threshold knobs — a wide
    estimate-vs-truth gap at the operating threshold means the
    signature is too short (raise num_hashes), while many candidates
    with near-zero true Jaccard mean the bands are too permissive
    (raise band_size). Run it on a sample before committing a corpus
    -scale near-dedup configuration.

    Output: (a, b, est_jaccard_micro, jaccard) — one row per candidate
    pair; jaccard is 0.0 for the (hash-collision) corner where a
    candidate pair shares no shingle.

    Scale shape: candidates come from the usual band construction
    (digest-only shuffles, ``max_band_bucket`` hot-bucket cap); the
    estimate joins the |docs| x k signature table onto the pair list
    twice (ids + fixed-width digests, never text); the true Jaccard is
    the candidate-restricted inverted-index join of
    :func:`ngram_jaccard_pairs` — bounded by the candidate id set, the
    same contract near_dedup_filter relies on. The signature subtree
    feeds both the bands and the two estimate joins; Spark's exchange
    reuse dedups the aggregation, and at corpus scale the caller can
    persist the signature frame first.
    """
    base = df.select(id_col, text_col)
    sig = minhash_signature(
        base, text_col, num_hashes, shingle_n, id_col,
        keep_signatureless=False,
    )
    bands = minhash_bands(sig, num_hashes, band_size, id_col)
    pairs = _band_candidate_pairs(bands, id_col, max_band_bucket)
    siga = sig.select(
        F.col(id_col).alias("a"),
        *[F.col(f"mh{i}").alias(f"__am{i}__") for i in range(num_hashes)],
    )
    sigb = sig.select(
        F.col(id_col).alias("b"),
        *[F.col(f"mh{i}").alias(f"__bm{i}__") for i in range(num_hashes)],
    )
    matches: Column = F.lit(0)
    for i in range(num_hashes):
        matches = matches + F.when(
            F.col(f"__am{i}__") == F.col(f"__bm{i}__"), 1
        ).otherwise(0)
    est = (
        pairs.join(siga, "a")
        .join(sigb, "b")
        .withColumn("__match__", matches)
        .select(
            "a",
            "b",
            F.expr(
                f"CAST(__match__ AS DECIMAL(38,0)) * 1000000 div {num_hashes}"
            )
            .cast("bigint")
            .alias("est_jaccard_micro"),
        )
    )
    ids = (
        pairs.select(F.col("a").alias(id_col))
        .union(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    exact = ngram_jaccard_pairs(
        base, text_col, id_col, shingle_n, threshold=0.0, restrict_ids=ids
    )
    return est.join(exact, ["a", "b"], "left").withColumn(
        "jaccard", F.coalesce(F.col("jaccard"), F.lit(0.0))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
    restrict_ids: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct n-gram shingle sets, computed with
    an inverted-index join (explode -> join on shingle -> count
    intersections) instead of an O(n^2) cross join.

    ``max_df`` drops shingles occurring in more than max_df documents
    before the join — at 100 TB a stop-shingle ("the end of the")
    otherwise becomes a quadratic hot key. Dropping it can only
    UNDERcount intersections for pairs glued solely by boilerplate,
    which is the desired behavior for near-dup mining.

    ``restrict_ids`` (a one-column DataFrame of ``id_col``) limits the
    pair computation to those documents via a semi-join on the
    EXPLODED (id, shingle) rows — the caller's candidate pruning hook
    (near_dedup_filter); document text itself never joins. The
    ``max_df`` document frequencies are counted over the FULL corpus
    BEFORE the restriction (one linear aggregate), so a shingle's
    hotness — and therefore every pair's Jaccard value — is identical
    whether or not the computation is restricted.
    """
    sh = (
        exploded_shingles(df, text_col, id_col, shingle_n)
        .withColumnRenamed("__s__", "s")
        .distinct()
    )
    return jaccard_from_exploded(
        sh, id_col, threshold=threshold, max_df=max_df,
        restrict_ids=restrict_ids,
    )


def jaccard_from_exploded(
    sh: DataFrame,
    id_col: str,
    threshold: float = 0.2,
    max_df: int | None = None,
    restrict_ids: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard pairs (a, b, jaccard) from an already-exploded
    DISTINCT (id, s) element frame — the inverted-index core shared by
    ``ngram_jaccard_pairs`` (text shingles) and
    ``conversations.conversation_shingle_pairs`` (turn-window
    digests). Semantics of ``max_df`` / ``restrict_ids`` are as
    documented on ``ngram_jaccard_pairs``."""
    if max_df is not None:
        hot = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(F.broadcast(hot.filter(F.col("df_") > max_df)), "s", "left_anti")
    if restrict_ids is not None:
        sh = sh.join(restrict_ids, id_col, "semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
        .groupBy(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash_expr(
    df: DataFrame,
    text_col: str = "text",
    nbits: int = 64,
) -> DataFrame:
    """SimHash over whitespace tokens as a pure Column expression:
    token hash = first 15 hex chars of md5 (60-bit bigint, portable);
    bit b of the simhash = sign of sum over tokens of (2*bit_b - 1).

    Default nbits=64 — the safe operating point for corpus-scale
    candidate blocking (2^16-value blocks at blocks=4, vs only 256 at
    nbits=32, which self-joins quadratically). Note the token hash is
    60-bit, so bits 60-63 of every token vote negative and those
    signature bits are constant 0 — harmless for hamming distance,
    and block 3 still carries 12 effective bits.

    Single-pass vote aggregate: ONE traversal of the token-hash array
    builds the whole vote vector (zip_with against a constant-folded
    mask array), instead of one interpreted ``F.aggregate`` pass per
    bit (the previous form — nbits full array traversals per row).
    Scan-side, no shuffle, no Python; for very long documents
    :func:`simhash_pandas` (numpy bit-unpacking) is the batch path.
    """
    toks = tokens_col(F.col(text_col))
    hs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    out = df.withColumn("__hs__", hs)
    # bit masks as an array literal — ConstantFolding collapses this to
    # a single Literal node, so plan size is O(1) in nbits. Bit 63 is
    # the signed-long min value (two's complement), not 1<<63.
    masks = F.array(
        *[
            F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
            for b in range(nbits)
        ]
    )
    zeros = F.array_repeat(F.lit(0).cast("long"), nbits)
    votes = F.aggregate(
        F.col("__hs__"),
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            votes, masks, lambda vt, m: F.when(vt > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return out.withColumn("simhash", sig).drop("__hs__")


def simhash_pandas(df: DataFrame, text_col: str = "text", nbits: int = 64) -> DataFrame:
    """64-bit SimHash as a vectorized pandas UDF: one md5 per token,
    then numpy ``unpackbits`` + column-sum for the votes — O(tokens)
    numpy work per doc instead of a per-token-per-bit Python loop."""
    @F.pandas_udf("long")
    def _simhash(s: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        mask = (1 << nbits) - 1
        out = []
        for text in s:
            if text is None:
                out.append(None)
                continue
            toks = text.split()
            if not toks:
                out.append(0)
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                    & mask
                    for t in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            # force little-endian storage before the byte view so
            # column i is bit i of the hash on ANY host byte order
            bits = np.unpackbits(
                hs.astype("<u8").view(np.uint8).reshape(-1, 8),
                axis=1,
                bitorder="little",
            )[:, :nbits]
            votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(toks)
            sig = int(
                np.bitwise_or.reduce(
                    (votes > 0).astype(np.uint64) << np.arange(nbits, dtype=np.uint64)
                )
            )
            # keep within signed 64-bit
            if sig >= 1 << 63:
                sig -= 1 << 64
            out.append(sig)
        return pd.Series(out, dtype="object")

    return df.withColumn("simhash", _simhash(F.col(text_col)))


def simhash_candidates(
    df_with_simhash: DataFrame,
    id_col: str = "doc_id",
    nbits: int = 64,
    blocks: int = 4,
    max_block_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidates by the pigeonhole block trick: split the
    signature into ``blocks`` bit-blocks; docs within hamming distance
    < blocks agree on at least one block -> bucket groupBy per block,
    self-join within buckets.

    Scale note: block-value cardinality is 2^(nbits/blocks) — the
    nbits=64 default gives 2^16 buckets per block, the safe operating
    point; nbits=32 is only 256 buckets per block, quadratic trouble
    at corpus scale (kept available for short-text workloads only).
    ``max_block_bucket`` drops hot blocks outright (the simhash twin
    of minhash's max_band_bucket; exact-dedup-first removes the
    identical-content cause)."""
    width = nbits // blocks
    mask = (1 << width) - 1
    parts = []
    for j in range(blocks):
        parts.append(
            F.struct(
                F.lit(j).alias("block_idx"),
                F.shiftright(F.col("simhash"), j * width)
                .bitwiseAND(F.lit(mask))
                .alias("block_val"),
            )
        )
    # rename to the band column names so the ONE shared cap+self-join
    # core (_band_candidate_pairs) serves minhash and simhash alike
    blocked = df_with_simhash.select(
        F.col(id_col), F.explode(F.array(*parts)).alias("p")
    ).select(
        id_col,
        F.col("p.block_idx").alias("band_idx"),
        F.col("p.block_val").alias("band_hash"),
    )
    return _band_candidate_pairs(blocked, id_col, max_block_bucket)


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) exact dedup
# ---------------------------------------------------------------------------

def incremental_exact_dedup(
    new_df: DataFrame,
    state_digests: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest_col: str = "digest",
) -> DataFrame:
    """Incremental exact dedup of a NEW snapshot/batch against the
    accumulated digest state of every prior run — the "don't re-admit
    a document CommonCrawl already gave us last month" step of a
    continuously-refreshed corpus (the dedup twin of
    plans/lineage.py's file-range incremental runs; reference analog:
    the exactly-once checkpoint contract of
    core/checkpoint/CheckpointManager.cpp applied to content instead
    of file offsets).

    ``state_digests`` holds one ``digest_col`` (md5 hex) row per
    previously-kept document — produced by :func:`state_digests_for`
    on earlier batches and unioned/persisted by the caller's pipeline.

    Keeps, from ``new_df``: the min-``id_col`` row of each content
    group whose digest is NOT in the state. Two hash-partitioned
    exchanges on the 32-byte digest (window + anti-join — co-keyed, so
    AQE reuses the partitioning) and ZERO document text in either: the
    state side carries digests only, and at web-scale dedup rates it
    is billions of rows, so it is deliberately NOT broadcast — the
    anti-join shuffles (or AQE broadcasts it when it is actually
    small). The new-batch side is typically <<1% of the corpus, which
    is the whole point: cost scales with the increment + state
    digests, never with re-scanning historical text.
    """
    batch_keep = drop_exact_duplicates(
        new_df, text_col=text_col, id_col=id_col
    ).withColumn("__d__", F.md5(F.col(text_col)))
    # no .distinct() on the state side: left_anti semantics ignore
    # duplicate build keys, and a distinct would add a full extra
    # hash-aggregate exchange over the job's largest input
    seen = state_digests.select(F.col(digest_col).alias("__d__"))
    return batch_keep.join(seen, "__d__", "left_anti").drop("__d__")


def state_digests_for(
    df: DataFrame, text_col: str = "text", digest_col: str = "digest"
) -> DataFrame:
    """Digest rows to append to the incremental-dedup state for a
    batch of KEPT documents (one distinct md5 per content)."""
    return df.select(F.md5(F.col(text_col)).alias(digest_col)).distinct()


def state_bands_for(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH band rows (band_idx, band_hash) for a batch of KEPT
    documents — the NEAR-dup analog of :func:`state_digests_for`. The
    distinct compacts the state (identical boilerplate families
    collapse to one band row); num_hashes/band_size must match the
    values later passed to :func:`incremental_near_dedup`, so persist
    them alongside the state table."""
    sig = minhash_signature(
        df.select(id_col, text_col), text_col, num_hashes, id_col=id_col,
        keep_signatureless=False,
    )
    bands = minhash_bands(sig, num_hashes, band_size, id_col)
    return bands.select("band_idx", "band_hash").distinct()


def incremental_near_dedup(
    new_df: DataFrame,
    state_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Incremental NEAR dedup of a new snapshot/batch against the LSH
    band state of every previously-kept document — the "don't
    re-admit a lightly-edited copy of something the corpus already
    holds" step of a continuously-refreshed corpus (the MinHash twin
    of :func:`incremental_exact_dedup`; reference analog: the same
    exactly-once checkpoint contract of
    core/checkpoint/CheckpointManager.cpp, applied to content
    similarity instead of file offsets).

    ``state_bands`` holds distinct (band_idx, band_hash) rows from
    :func:`state_bands_for` on earlier kept batches, unioned by the
    caller's pipeline. A new document sharing ANY band with the state
    is dropped; the rest of the batch (after in-batch exact keep-min)
    survives. In-batch NEAR duplicates are deliberately NOT resolved
    here — that is :func:`near_dedup_filter`'s job; compose the two
    when admitting a batch.

    Scale story (100 TB): document text NEVER shuffles — signatures
    are a map-side partial aggregate over scan-side shingles, bands
    are |batch| x num_bands digest rows, and the history check is one
    left-semi join on (band_idx, 32-hex band_hash) against a state
    that carries digests only. Unlike the candidate-pair self-join
    there is no quadratic bucket risk: semi-join output is bounded by
    the batch side, so no hot-bucket cap is needed. Cost scales with
    the increment + state digests, never with re-scanning historical
    text. Documents with fewer than shingle_n tokens have no LSH
    identity and pass through (exact dedup is the right tool for
    those — same contract as minhash_bands).
    """
    batch_keep = drop_exact_duplicates(new_df, text_col=text_col, id_col=id_col)
    sig = minhash_signature(
        batch_keep.select(id_col, text_col), text_col, num_hashes,
        id_col=id_col, keep_signatureless=False,
    )
    bands = minhash_bands(sig, num_hashes, band_size, id_col)
    seen = state_bands.select("band_idx", "band_hash")
    hit = (
        bands.join(seen, ["band_idx", "band_hash"], "left_semi")
        .select(id_col)
        .distinct()
    )
    return batch_keep.join(hit, id_col, "left_anti")


def cluster_size_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Duplicate-cluster size histogram — the "how duplicated is this
    corpus?" data card (the dup-cluster distribution plot in the
    C4 / RefinedWeb / Gopher dedup sections): for every exact-dup
    group size d, how many distinct contents occur exactly d times
    and how many documents that accounts for.

    Returns UNORDERED (dup_count, n_groups, n_docs = dup_count *
    n_groups) rows — order downstream. ``sum(n_docs)`` = corpus
    size; ``n_docs - n_groups`` summed over dup_count >= 2 = exactly
    the rows ``exact_dedup`` would remove, because the grouping key
    is the same raw-text md5 exact_dedup uses: NULL text digests to
    NULL and forms its OWN cluster (both engines group NULL keys
    together), distinct from the empty-string cluster.

    Scale shape: two narrow aggregates — documents collapse to
    (digest, count) rows with map-side partials (the exchange
    carries 32-byte digests), then counts collapse to the histogram
    (bounded by the number of DISTINCT cluster sizes — at most a few
    hundred rows on any real corpus). Text never shuffles; no join.
    """
    counts = (
        df.select(F.md5(F.col(text_col)).alias("__d__"))
        .groupBy("__d__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dup_count"))
    )
    return (
        counts.groupBy("dup_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
        .select(
            "dup_count",
            "n_groups",
            (F.col("dup_count") * F.col("n_groups"))
            .cast("bigint")
            .alias("n_docs"),
        )
    )


def bloom_positions(digest: Column, k_hashes: int, m_bits: int) -> Column:
    """The k Bloom positions of a content digest as an array<long>:
    pos_i = int(md5(i ':' digest)[:15 hex]) % m — the repo's standard
    md5-prefix integer hash (same construction as the DSIR feature
    bucketing and the jaccard shingle hash), one independent hash per
    salt i. Shared by filter build and probe so the two sides can
    never disagree on the hash family, and mirrored verbatim by the
    SQL oracle."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}:"), digest)), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(int(m_bits)),
            )
            for i in range(k_hashes)
        ]
    )


def bloom_audit(
    snap_a: DataFrame,
    snap_b: DataFrame,
    m_bits: int = 262_144,
    k_hashes: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-prefilter capacity audit for the incremental dedup path:
    if snapshot A's content digests were loaded into an m-bit /
    k-hash Bloom filter and snapshot B probed it before the exact
    check (the standard new-batch-versus-corpus prefilter at 100 TB
    — probe the cheap bitmap first, run the exact digest anti-join
    only on the survivors), what would B actually observe? Reports
    the MEASURED false-positive rate on this corpus pair plus the
    filter's fill factor — the two numbers that size m before anyone
    ships a prefilter, measured instead of taken from the 0.6185^
    (m/n) formula card.

    The filter is built DISTRIBUTED: the bit set is the distinct
    position table (<= m rows of one bigint — at modest m you would
    collect it into a real broadcast bitmap; the table form is the
    shape that still works when m is billions of bits, and the probe
    is a position join either way). Probe semantics: a B document is
    bloom-positive iff ALL k of its positions are set; truth is the
    exact digest semi-join. NULL-text rows are dropped on both
    sides; B documents are audited per distinct digest (the filter
    answers digest membership, and counting per-row would just
    multiply both counters by the dup factor).

    Output is ONE row: (n_a_digests, n_b_digests, n_bits_set,
    fill_micro, n_bloom_positive, n_true_dups, n_false_positives,
    fp_micro) where fp_micro = false positives * 1e6 div the
    B digests NOT actually in A (NULL when every B digest is a true
    dup — the rate is undefined, not zero).

    Scale shape: only digests and positions shuffle (32-byte md5s
    and bigints — the exact-dedup contract; text never leaves
    either scan). The position join is bounded by k x |B| probe
    rows against <= m set bits; the truth check is a digest
    semi-join; the rollup is a single-row aggregate.
    """
    if m_bits < 2:
        raise ValueError(f"bloom_audit: m_bits must be >= 2, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(
            f"bloom_audit: k_hashes must be >= 1, got {k_hashes}"
        )
    for side, df in (("snap_a", snap_a), ("snap_b", snap_b)):
        missing = [c for c in (id_col, text_col) if c not in df.columns]
        if missing:
            raise ValueError(f"bloom_audit: {side} missing columns {missing}")
    a_dig = (
        snap_a.filter(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col).cast("string")).alias("d"))
        .distinct()
    )
    b_dig = (
        snap_b.filter(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col).cast("string")).alias("d"))
        .distinct()
    )
    bits = (
        a_dig.select(
            F.explode(
                bloom_positions(F.col("d"), k_hashes, m_bits)
            ).alias("pos")
        )
        .distinct()
        .withColumn("__set__", F.lit(1))
    )
    probes = b_dig.select(
        "d",
        F.explode(bloom_positions(F.col("d"), k_hashes, m_bits)).alias(
            "pos"
        ),
    )
    hit_counts = (
        probes.join(bits, "pos", "left")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("__k__"),
            F.sum(F.coalesce(F.col("__set__"), F.lit(0))).alias("__hits__"),
        )
        .withColumn("__pos__", F.col("__hits__") == F.col("__k__"))
    )
    truth = a_dig.withColumn("__in_a__", F.lit(1))
    audited = hit_counts.join(truth, "d", "left")
    counts = audited.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b_digests"),
        F.sum(F.when(F.col("__pos__"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_positive"),
        F.sum(F.when(F.col("__in_a__") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_dups"),
        F.sum(
            F.when(F.col("__pos__") & F.col("__in_a__").isNull(), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_false_positives"),
    )
    totals = a_dig.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a_digests")
    )
    nbits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    return (
        counts.crossJoin(totals)
        .crossJoin(nbits)
        .select(
            "n_a_digests",
            "n_b_digests",
            "n_bits_set",
            F.expr(f"n_bits_set * 1000000 div {int(m_bits)}").alias(
                "fill_micro"
            ),
            "n_bloom_positive",
            "n_true_dups",
            "n_false_positives",
            F.when(
                F.col("n_b_digests") > F.col("n_true_dups"),
                F.expr(
                    "n_false_positives * 1000000 div "
                    "(n_b_digests - n_true_dups)"
                ),
            )
            .cast("bigint")
            .alias("fp_micro"),
        )
    )


def cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 20,
) -> DataFrame:
    """Keep-BEST representative per near-dup cluster: connected
    components over the candidate-pair graph pick the clusters,
    the corpus quality heuristic picks WHICH member survives —
    (quality DESC, id ASC), a total order. Every keep-min dedup in
    this module keeps the EARLIEST member; a training-prep pipeline
    usually wants the best-written one ("five mirrors of the same
    article — keep the clean copy, not the first-crawled one"), and
    this is that policy as a first-class operator. Documents in no
    cluster are implicitly kept and not emitted here — the output
    is the cluster decision table, one row per cluster:
    (cluster_id, keep_id, n_members, best_quality_micro).

    Scale shape: the component labels come from
    :func:`connected_components` (edge-list-only propagation, the
    corpus never joins into the iteration); quality scoring is the
    usual one-projection scan stage; the member table is
    cluster-membership-sized (pairs-bounded, not corpus-bounded),
    and its rank window + rollup share ONE exchange on the
    component id. Text never shuffles — only (id, comp, score).
    """
    missing = [c for c in (id_col, text_col) if c not in docs.columns]
    if missing:
        raise ValueError(
            f"cluster_representatives: docs missing columns {missing}"
        )
    from ilogtail_spark.dataops.textstats import quality_score

    comp = connected_components(pairs, max_iter=max_iter)
    scored = quality_score(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    ).select("doc_id", "quality_score_micro")
    members = comp.join(
        scored, comp["id"] == scored["doc_id"]
    ).select(
        comp["id"].alias("member_id"),
        "comp",
        "quality_score_micro",
    )
    w = Window.partitionBy("comp").orderBy(
        F.col("quality_score_micro").desc(), F.col("member_id").asc()
    )
    ranked = members.withColumn("__rn__", F.row_number().over(w))
    return (
        ranked.groupBy("comp")
        .agg(
            F.max(
                F.when(F.col("__rn__") == 1, F.col("member_id"))
            )
            .cast("bigint")
            .alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.max(
                F.when(F.col("__rn__") == 1, F.col("quality_score_micro"))
            )
            .cast("bigint")
            .alias("best_quality_micro"),
        )
        .select(
            F.col("comp").alias("cluster_id"),
            "keep_id",
            "n_members",
            "best_quality_micro",
        )
    )
