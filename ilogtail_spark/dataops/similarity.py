"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  set, one pass over the corpus, per-partition top-k via window.
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  buckets (hyperplane components derived from md5, so any engine
  reproduces them); search only the query's bucket.

Scale story: brute force is O(corpus x queries) but shuffle-free
until the final top-k (window over query_id — partition count =
|queries|); LSH prunes the corpus side to one bucket per probe, and
bucket assignment is scan-side expression work.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_double_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """float -> double once up front: all arithmetic in float64 so the
    result is bit-identical to any IEEE engine evaluating in the same
    (sequential) order."""
    return df.withColumn(
        "__vec__", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self
    excluded). ``queries`` is broadcast — the corpus never shuffles;
    the only exchange is the final per-query window."""
    c = with_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("__vec__").alias("cv")
    )
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__vec__").alias("qv")
    )
    joined = c.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
    return _rank_cosine(joined, k, round_to, ["query_id", "nbr_id", "rk", "cos"])


def _rank_cosine(
    joined: DataFrame, k: int, round_to: int | None, cols: list[str]
) -> DataFrame:
    """The scoring/ranking core shared by cosine_topk and
    hard_negatives (ONE copy, so cosine semantics and the
    (cos desc, nbr_id asc) oracle-aligned tie-break can never drift):
    ``joined`` must carry cv/qv double vectors plus query_id/nbr_id."""
    cos = _dot(F.col("cv"), F.col("qv")) / (
        _norm(F.col("cv")) * _norm(F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("nbr_id").asc()
    )
    out = (
        joined.withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*cols)
    )
    if round_to is not None:
        out = out.withColumn("cos", F.round(F.col("cos"), round_to))
    return out


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    round_to: int | None = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for
    each anchor (query vector with a label), the top-k most-similar
    corpus vectors carrying a DIFFERENT label — the "looks like a
    positive, isn't one" examples that make a contrastive batch
    informative (random negatives are trivially separable; the
    near-boundary ones carry the gradient). The label can be a class,
    a source document id (negatives for retrieval training that are
    NOT the query's own document), or a dedup-cluster id (so near-dups
    of the anchor never become negatives — the false-negative guard).

    Output: (query_id, nbr_id, nbr_label, rk, cos) — rk ranks within
    the anchor's negatives. NULL-label corpus rows pair with any
    labeled anchor (unknown label is not evidence of a positive), but
    NULL-vs-NULL pairs are excluded (two unknowns may well be the
    same class — the conservative default for the false-negative
    risk).

    Scale shape: identical to :func:`cosine_topk` — anchors broadcast,
    the corpus never shuffles, the label filter rides the broadcast
    join condition so non-negatives never reach the rank window; the
    only exchange is the per-anchor window.
    """
    c = with_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"),
        F.col(label_col).alias("nbr_label"),
        F.col("__vec__").alias("cv"),
    )
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__albl__"),
        F.col("__vec__").alias("qv"),
    )
    joined = c.join(
        F.broadcast(q),
        (F.col("nbr_id") != F.col("query_id"))
        & ~F.col("nbr_label").eqNullSafe(F.col("__albl__")),
    )
    return _rank_cosine(
        joined, k, round_to, ["query_id", "nbr_id", "nbr_label", "rk", "cos"]
    )


def hyperplane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in
    [-1000, 1000]: derived from md5(f'{plane},{dim}') — computed on
    the driver and embedded as a literal, so any engine (and the
    DuckDB oracle) reproduces the identical planes."""
    import hashlib

    h = int(hashlib.md5(f"{plane},{dim}".encode()).hexdigest()[:8], 16)
    return float(h % 2001 - 1000)


from functools import lru_cache


import itertools
import weakref

# monotonic token per SparkContext OBJECT (weak keys): id() could be
# recycled by the allocator after a context is GC'd, silently reviving
# stale cache entries — a counter held via weakref cannot collide
_gateway_tokens: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_gateway_counter = itertools.count(1)


def _gateway_key() -> int:
    """Cache key component tying memoized Columns to the LIVE py4j
    gateway: a Column wraps a JVM reference, so a Column cached under
    one SparkContext is poison after a JVM restart in the same Python
    process (common in test harnesses). Each context object gets a
    fresh monotonic token, so a restart is always a cache miss."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return 0
    tok = _gateway_tokens.get(sc)
    if tok is None:
        tok = next(_gateway_counter)
        _gateway_tokens[sc] = tok
    return tok


def _planes_literal(plane_offset: int, num_planes: int, dim: int) -> Column:
    """The plane matrix as ONE array<array<double>> Column, memoized
    per (gateway, params): building num_planes x dim literal nodes
    crosses py4j per node (~0.6 s at 24x64) and the identical matrix
    recurs across every LSH query in a session. Column objects are
    immutable expression wrappers, safe to share across plans within
    one SparkContext's lifetime — never across a JVM restart."""
    return _planes_literal_cached(_gateway_key(), plane_offset, num_planes, dim)


@lru_cache(maxsize=64)
def _planes_literal_cached(
    gateway: int, plane_offset: int, num_planes: int, dim: int
) -> Column:
    return F.array(
        *[
            F.array(*[F.lit(hyperplane_component(p, d)) for d in range(dim)])
            for p in range(plane_offset, plane_offset + num_planes)
        ]
    )


def lsh_bucket(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
    plane_offset: int = 0,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Append ``bucket``: the sign-bit string of ``num_planes``
    hyperplane projections. Scan-side, no shuffle.

    The plane matrix is an ``array<array<double>>`` LITERAL
    (ConstantFolding collapses it to a single Literal node), and each
    projection is a sequential ``aggregate(zip_with(...))`` — plan
    size is O(1) in ``dim``, unlike the previous unrolled
    multiply-add chain that emitted num_planes x dim expression nodes
    (tens of thousands at dim>=512: Catalyst plan blowup + codegen
    fallback). The sequential fold adds components in index order, so
    the doubles — and therefore the sign bits — are bit-identical to
    the SQL oracle's list_sum. For very high dims see
    :func:`lsh_bucket_pandas` (numpy matmul per Arrow batch; pairwise
    summation order, so use it when recall, not bit-parity, is the
    contract).

    Length handling: vectors LONGER than ``dim`` are sliced (zip_with
    would null-pad the plane side and poison the fold); vectors
    SHORTER than ``dim`` (or null) get a NULL bucket — like a null
    minhash signature, a vector without full dimensionality has no
    LSH identity, and a NULL bucket joins nothing downstream instead
    of collapsing every malformed vector into one all-'0' hot bucket
    (an O(n^2) self-join otherwise)."""
    v = F.slice(
        F.transform(F.col(vec_col), lambda x: x.cast("double")), 1, dim
    )
    df = df.withColumn("__vec__", v)
    has_dim = F.size(F.col(vec_col)) >= dim
    # folds to ONE ArrayType literal; plane_offset selects an
    # independent plane-set per LSH band (multi-band recall)
    planes = _planes_literal(plane_offset, num_planes, dim)
    bits = F.transform(
        planes,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(plane, F.col("__vec__"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    bucket = F.when(has_dim, F.array_join(bits, "")).otherwise(
        F.lit(None).cast("string")
    )
    return df.withColumn(bucket_col, bucket).drop("__vec__")


def lsh_bucket_pandas(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch LSH bucketing: one float64 matmul (n x dim) @ (dim x
    planes) per Arrow batch."""
    import numpy as np

    mat = np.array(
        [[hyperplane_component(p, d) for d in range(dim)] for p in range(num_planes)],
        dtype=np.float64,
    ).T  # dim x planes

    @F.pandas_udf("string")
    def _bucket(s: pd.Series) -> pd.Series:
        out: list[str | None] = []
        for v in s:
            if v is None or len(v) < dim:
                out.append(None)  # no LSH identity — same as the expr engine
                continue
            proj = np.asarray(v[:dim], dtype=np.float64) @ mat
            out.append("".join(np.where(proj >= 0, "1", "0")))
        return pd.Series(out, dtype=object)

    return df.withColumn("bucket", _bucket(F.col(vec_col)))


def centroid_matrix(centroids: list[list[float]]) -> Column:
    """Centroid matrix as an array<array<double>> literal (folds to a
    single Literal node under ConstantFolding). Memoized per distinct
    centroid set — corpus assignment and query probing reuse one
    Column instead of re-crossing py4j per literal node."""
    return _centroid_matrix_cached(
        _gateway_key(), tuple(tuple(float(x) for x in c) for c in centroids)
    )


@lru_cache(maxsize=16)
def _centroid_matrix_cached(gateway: int, key: tuple) -> Column:
    return F.array(*[F.array(*[F.lit(x) for x in c]) for c in key])


def centroid_scores(cmat: Column, vec: Column, dim: int) -> Column:
    """Dot product of ``vec`` (sliced to ``dim`` — zip_with would
    null-pad a length mismatch and poison the fold) against every
    centroid: one sequential fold per centroid, scan-side. Shared by
    corpus assignment and query probe ranking so the two sides can
    never drift on fold order or truncation."""
    v = F.slice(F.transform(vec, lambda x: x.cast("double")), 1, dim)
    return F.transform(
        cmat,
        lambda c: F.aggregate(
            F.zip_with(c, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    list_col: str = "ivf_list",
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its nearest
    centroid by dot product (centroids pre-normalized => cosine
    order). The centroid matrix is a constant-folded array literal —
    same O(1)-plan-size trick as lsh_bucket — and the argmax is one
    sequential fold, so assignment is scan-side with no shuffle."""
    dim = len(centroids[0])
    scores = centroid_scores(centroid_matrix(centroids), F.col(vec_col), dim)
    df = df.withColumn("__scores__", scores)
    # argmax by index; ties break to the LOWER index on both engines
    # (array_position returns the first occurrence). Short/null vectors
    # get a NULL list id — no IVF identity, excluded from probes.
    best = F.when(
        F.size(F.col(vec_col)) >= dim,
        (
            F.array_position(
                F.col("__scores__"), F.array_max(F.col("__scores__"))
            )
            - 1
        ).cast("int"),
    ).otherwise(F.lit(None).cast("int"))
    return df.withColumn(list_col, best).drop("__scores__")


def seed_centroids(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic coarse centroids: the (normalized) vectors of the
    k LOWEST ids actually present. A trained k-means would cluster
    better; the IVF STRUCTURE (quantize -> inverted lists -> nprobe
    search) is identical and this choice keeps every engine — and the
    SQL oracle — bit-reproducible. Swap in pyspark.ml KMeans centroids
    on a real cluster where oracle parity is not required.

    ``orderBy(id).limit(k)`` (NOT ``filter(id < k)``) so the seeding
    survives id spaces that are sparse or offset — e.g. the
    snapshot-offset ids that ``incremental_run`` produces, or any
    sampled subset. On a dense 0-based corpus the two are identical.
    The limit(k) collect moves <= k * dim doubles to the driver —
    bounded, not row-scale.

    Seed hygiene (rows a corrupt corpus puts at the lowest ids):
    NULL-id / NULL-vector / empty-vector rows are never seeds — Spark
    sorts NULL ids FIRST, so without the filter one NULL-id row would
    occupy a seed slot (and a NULL vector would crash normalization);
    such rows keep their usual no-cluster-identity treatment
    downstream. Driver-side, a seed containing NULL elements is
    skipped, and seeds shorter than the longest seed are dropped
    (a truncated vector cannot span the space — and inferring dim
    from it would silently prefix-truncate every assignment). Fewer
    than k centroids is fine: the IVF structure is unchanged."""
    import math

    rows = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(vec_col).isNotNull()
            & (F.size(F.col(vec_col)) > 0)
        )
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    vecs = [
        [float(x) for x in r[vec_col]]
        for r in rows
        if not any(x is None for x in r[vec_col])
    ]
    if not vecs:
        raise ValueError(
            f"seed_centroids: corpus has no usable vectors — cannot seed "
            f"{k} centroids"
        )
    dmax = max(len(v) for v in vecs)
    out = []
    for v in vecs:
        if len(v) < dmax:
            continue
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([x / n for x in v])
    return out


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: exact cosine ranking restricted to the
    ``nprobe`` inverted lists nearest each query. The corpus is
    scanned once (assignment is a scan-side expression); only the tiny
    broadcast query side explodes over its probe lists. Cost drops
    ~n_centroids/nprobe-fold vs brute force; recall rises with
    nprobe."""
    cents = seed_centroids(corpus, n_centroids, vec_col, id_col)
    cb = ivf_assign(corpus, cents, vec_col)
    c = with_double_vec(cb, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("ivf_list"), F.col("__vec__").alias("cv")
    )
    # query probe lists: indices of the nprobe best centroid scores —
    # the SAME centroid_scores expression as corpus assignment
    dim = len(cents[0])
    scores = centroid_scores(centroid_matrix(cents), F.col(vec_col), dim)
    qdf = queries.withColumn(
        "__vec__", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )
    # rank centroid indices by (-score, index): sort scored structs.
    # Short/null query vectors get an EMPTY probe set (explode drops
    # them) — consistent with the corpus side's NULL ivf_list.
    ranked = F.when(
        F.size(F.col(vec_col)) >= dim,
        F.transform(
            F.slice(
                F.array_sort(
                    F.zip_with(
                        scores,
                        F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                        lambda s, i: F.struct((-s).alias("neg"), i.alias("idx")),
                    )
                ),
                1,
                nprobe,
            ),
            lambda x: x["idx"],
        ),
    ).otherwise(F.array().cast("array<int>"))
    q = qdf.select(
        F.col(id_col).alias("query_id"),
        F.explode(ranked).alias("probe_list"),
        F.col("__vec__").alias("qv"),
    )
    joined = c.join(
        F.broadcast(q),
        (F.col("ivf_list") == F.col("probe_list"))
        & (F.col("nbr_id") != F.col("query_id")),
    )
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw__").desc(), F.col("nbr_id").asc()
    )
    return (
        joined.withColumn("__cos_raw__", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "nbr_id", "rk", F.round(F.col("__cos_raw__"), 6).alias("cos")
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float,
    num_planes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_bands: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >=
    threshold), candidate-pruned by LSH: the self-join runs WITHIN
    sign-buckets only — same scale shape as the minhash banding join,
    never all-pairs.

    Bucket-cardinality story (the 100 TB lever): expected bucket
    occupancy is ~n / 2^num_planes, and the within-bucket self-join
    is quadratic in occupancy — so num_planes must GROW with the
    corpus, not stay fixed. The default is 16 planes (65,536 buckets);
    at 10^9+ vectors use 20+. Raising planes costs recall (one
    hyperplane splitting a near-pair kills the candidate), which
    ``num_bands`` buys back minhash-style: ``num_bands`` INDEPENDENT
    plane-sets (band j uses planes [j*num_planes, (j+1)*num_planes)),
    a pair is a candidate if it collides in ANY band — recall
    1-(1-p^num_planes)^num_bands at num_bands x the join cost. The
    per-band buckets are computed in ONE corpus scan (each plane
    matrix a constant-folded literal), exploded to (id, band_idx,
    bucket) rows; the join key (band_idx, bucket) keeps bands from
    cross-matching. Pairs colliding in several bands are `distinct`ed
    BEFORE the cosine verify, so verification cost stays
    O(|candidate pairs|).
    """
    bandcols = []
    for j in range(num_bands):
        df = lsh_bucket(
            df,
            dim,
            num_planes,
            vec_col,
            plane_offset=j * num_planes,
            bucket_col=f"__bucket{j}__",
        )
        bandcols.append(
            F.struct(
                F.lit(j).alias("band_idx"), F.col(f"__bucket{j}__").alias("bkt")
            )
        )
    v = with_double_vec(df, vec_col).select(
        F.col(id_col),
        F.col("__vec__").alias("v"),
        F.explode(F.array(*bandcols)).alias("bb"),
    ).select(
        id_col,
        "v",
        F.col("bb.band_idx").alias("band_idx"),
        F.col("bb.bkt").alias("bucket"),
    ).filter(F.col("bucket").isNotNull())
    left = v.select(
        F.col(id_col).alias("a"), "band_idx", "bucket", F.col("v").alias("va")
    )
    right = v.select(
        F.col(id_col).alias("b"),
        F.col("band_idx").alias("band_r"),
        F.col("bucket").alias("bucket_r"),
        F.col("v").alias("vb"),
    )
    joined = left.join(
        right,
        (F.col("band_idx") == F.col("band_r"))
        & (F.col("bucket") == F.col("bucket_r"))
        & (F.col("a") < F.col("b")),
    )
    if num_bands > 1:
        # dedup pairs colliding in several bands on the 16-byte id
        # pair ONLY, then re-join the vectors — carrying 2 x dim
        # doubles through the distinct exchange multiplies its size by
        # ~100x at real embedding dims (measured ~2.8x faster at
        # sf0.1 even at dim=64)
        vecs = v.select(id_col, "v").dropDuplicates([id_col])
        pairs = joined.select("a", "b").distinct()
        cands = (
            pairs.join(
                vecs.select(F.col(id_col).alias("a"), F.col("v").alias("va")), "a"
            ).join(
                vecs.select(F.col(id_col).alias("b"), F.col("v").alias("vb")), "b"
            )
        )
    else:
        cands = joined.select("a", "b", "va", "vb")
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cands.withColumn("__cos__", cos)
        .filter(F.col("__cos__") >= threshold)
        .select("a", "b", F.round(F.col("__cos__"), 6).alias("cos"))
    )


# default hot-cluster cap for semantic_dedup — shared with the scale
# audit and the DuckDB oracle so a retune cannot silently diverge
SEMANTIC_MAX_CLUSTER = 10_000


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int | None = SEMANTIC_MAX_CLUSTER,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with the deterministic
    IVF coarse quantizer, compare cosines WITHIN each cluster only,
    and drop every vector that has a lower-id cluster-mate at cosine
    >= ``threshold``. Returns the kept (id, cluster) rows.

    Deterministic keep rule: the LOWEST id of each semantic-duplicate
    neighborhood survives (the paper keeps a pseudo-random member per
    epsilon-group; pair-based keep-min is its reproducible analog and
    matches the keep-min contract of near_dedup_filter/url dedup, so
    the same run is bit-identical on any engine or cluster size).

    Scale shape at 100 TB: assignment is scan-side (constant-folded
    centroid literal, no shuffle); the only join is the within-cluster
    self-join, quadratic in CLUSTER size — n_centroids must grow with
    the corpus exactly like LSH planes, and ``max_cluster`` drops
    over-full clusters from pairing outright (the semantic twin of
    minhash's max_band_bucket; members of a skipped cluster are all
    kept). The cap is ON by default (10,000 members => <= 5*10^7
    cosine pairs per hot cluster) because the safe operating point
    should be the default, not opt-in — pass ``max_cluster=None``
    explicitly to uncap on a corpus whose cluster sizes are known.
    Short/NULL vectors have no cluster identity and are kept.
    """
    cents = seed_centroids(corpus, n_centroids, vec_col, id_col)
    assigned = ivf_assign(corpus, cents, vec_col, list_col="cluster")
    v = with_double_vec(assigned, vec_col).select(
        F.col(id_col), F.col("cluster"), F.col("__vec__").alias("v")
    )
    members = v.filter(F.col("cluster").isNotNull())
    if max_cluster is not None:
        hot = (
            members.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("__n__"))
            .filter(F.col("__n__") > max_cluster)
            .drop("__n__")
        )
        members = members.join(hot, ["cluster"], "left_anti")
    left = members.select(
        F.col(id_col).alias("a"), "cluster", F.col("v").alias("va")
    )
    right = members.select(
        F.col(id_col).alias("b"),
        F.col("cluster").alias("cluster_r"),
        F.col("v").alias("vb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    drops = (
        left.join(
            right,
            (F.col("cluster") == F.col("cluster_r")) & (F.col("a") < F.col("b")),
        )
        .withColumn("__cos__", cos)
        .filter(F.col("__cos__") >= threshold)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return assigned.join(drops, [id_col], "left_anti").select(id_col, "cluster")


def probe_buckets(bucket: Column, num_planes: int, probes: int) -> Column:
    """Multi-probe bucket set: the query's own bucket plus, when
    ``probes >= 1``, every bucket at Hamming distance 1 (each sign bit
    flipped once) — the standard multi-probe LSH recall lever: a
    near-neighbor whose projection sits just across one hyperplane
    lands one bit-flip away."""
    variants = [bucket]
    if probes >= 1:
        for i in range(num_planes):
            flipped = F.when(
                F.substring(bucket, i + 1, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            variants.append(
                F.concat(
                    F.substring(bucket, 1, i),
                    flipped,
                    F.substring(bucket, i + 2, num_planes - i - 1),
                )
            )
    return F.array(*variants)


def default_lsh_planes(n: int, target_occupancy: int = 256) -> int:
    """Recall-aware plane count: expected bucket occupancy is
    n / 2^planes, so planes = ceil(log2(n / target_occupancy)) keeps
    the per-probe candidate set near ``target_occupancy`` regardless
    of corpus size (2 planes at 500 vectors, 22 at 10^9). Raising
    planes above this buys speed and costs recall — the measured
    curve on the bench fixture is in BENCH.md (ann_recall)."""
    import math

    return max(2, math.ceil(math.log2(max(n, 1) / target_occupancy)))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probes: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the
    query's LSH bucket(s). ``probes=1`` (the default) additionally
    searches every bucket one bit-flip away (num_planes+1 probes per
    query) — recall rises toward exact at ~(num_planes+1)x the
    candidate cost, still ~2^num_planes/(num_planes+1)-fold below
    brute force. Only the tiny broadcast query side explodes; the
    corpus is still scanned once and never shuffled.

    ``num_planes=None`` derives a recall-aware plane count from the
    corpus size (one count() job — at repeated-query scale, count
    once and pass it explicitly): too many planes over a small corpus
    leaves most true neighbors outside the probe set (8 planes on 500
    vectors measured 0.10 recall at k=3; the derived 2 planes measure
    0.92 — BENCH.md ann_recall table). Defaults favor RECALL;
    latency-critical callers raise num_planes / set probes=0
    deliberately."""
    if num_planes is None:
        num_planes = default_lsh_planes(corpus.count())
    cb = lsh_bucket(corpus, dim, num_planes, vec_col)
    qb = lsh_bucket(queries, dim, num_planes, vec_col)
    c = with_double_vec(cb, vec_col).select(
        F.col(id_col).alias("nbr_id"), F.col("bucket"), F.col("__vec__").alias("cv")
    )
    q = with_double_vec(qb, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_buckets(F.col("bucket"), num_planes, probes)).alias("qbucket"),
        F.col("__vec__").alias("qv"),
    )
    joined = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("nbr_id") != F.col("query_id")),
    )
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    # rank on the UNROUNDED score (round only for presentation) so tie
    # ordering matches any engine computing the same doubles
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw__").desc(), F.col("nbr_id").asc()
    )
    return (
        joined.withColumn("__cos_raw__", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "nbr_id", "rk", F.round(F.col("__cos_raw__"), 6).alias("cos")
        )
    )


def cluster_report(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space data card: one row per IVF coarse cluster with
    its population, label diversity, and dominant label — the
    composition/diversity table a pretraining data card shows for an
    embedded corpus (and the "is one domain swamping this region of
    embedding space?" signal that motivates semantic_dedup's
    hot-cluster cap).

    Returns (ivf_list, n_vectors, n_labels, top_label, top_label_n,
    top_share_micro); ties for the dominant label break to the
    lowest label, and the share is exact fixed-point micro (128-bit
    integer math, engine-identical). Vectors without an IVF identity
    (NULL/short embeddings) are excluded — count them upstream with a
    plain null filter if the card needs them.

    Scale shape: cluster assignment is scan-side (constant-folded
    centroid matrix, same O(1)-plan trick as ivf_assign everywhere
    else); ONE partial-aggregated groupBy on (ivf_list, label) —
    ints only — then the per-cluster windows run over n_centroids x
    n_labels rows, a frame that is tiny by construction regardless
    of corpus size.
    """
    cents = seed_centroids(df, n_centroids, vec_col=vec_col, id_col=id_col)
    assigned = ivf_assign(df, cents, vec_col=vec_col).filter(
        F.col("ivf_list").isNotNull()
    )
    per = assigned.groupBy(
        "ivf_list", F.col(label_col).cast("bigint").alias("label")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("ivf_list")
    wr = Window.partitionBy("ivf_list").orderBy(
        F.col("n").desc(), F.col("label").asc()
    )
    return (
        per.select(
            "ivf_list",
            "label",
            "n",
            F.sum("n").over(w).alias("n_vectors"),
            F.count(F.lit(1)).over(w).alias("n_labels"),
            F.row_number().over(wr).alias("__rn__"),
        )
        .filter(F.col("__rn__") == 1)
        .select(
            F.col("ivf_list").cast("bigint").alias("ivf_list"),
            F.col("n_vectors").cast("bigint").alias("n_vectors"),
            F.col("n_labels").cast("bigint").alias("n_labels"),
            F.col("label").alias("top_label"),
            F.col("n").cast("bigint").alias("top_label_n"),
            F.expr("CAST(n AS DECIMAL(38,0)) * 1000000 div n_vectors")
            .cast("bigint")
            .alias("top_share_micro"),
        )
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qvec"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(x_i * 127 /
    max|x|), clipping unnecessary by construction (|q_i| <= 127). Adds
    ``out_col`` (array<int>, values in [-127, 127]) and ``qscale``
    (double, max|x| / 127 — multiply back to dequantize).

    Why ints: a 100 TB embedding column is 4 bytes/dim of float32 —
    quantized it ships 1 byte/dim of payload across every shuffle,
    broadcast, and at-rest copy, and dot products become EXACT BIGINT
    math (no accumulation-order nondeterminism: any engine, any
    partitioning, bit-identical scores). The rounding rule is written
    as floor(r + 0.5) so every engine computes the identical code
    (round() half-tie policy differs across engines; floor does not).

    An all-zero vector quantizes to all zeros (qscale 0); a NULL
    vector stays NULL. Pure scan-side expressions — no shuffle.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mx = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    q = F.when(mx == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.floor((x * F.lit(127.0)) / mx + F.lit(0.5)).cast("int"),
        )
    )
    return df.withColumn(out_col, q).withColumn(
        "qscale", F.when(mx == 0.0, F.lit(0.0)).otherwise(mx / F.lit(127.0))
    )


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k over int8-quantized vectors — the reduced-precision
    twin of :func:`cosine_topk` for corpora where the 4x shuffle/
    broadcast byte saving matters more than the last ~0.3% of cosine
    fidelity (at 100 TB it always does for the candidate-generation
    pass; re-rank survivors at full precision if needed).

    Scores are cos_q = dot_q / sqrt(|q|^2 * |c|^2) where dot_q and
    both norms are EXACT integers (int8 x int8 summed in BIGINT), so
    the only float ops are one multiply, one sqrt, one divide —
    bit-identical in any IEEE engine, no accumulation-order drift.
    Returns (query_id, nbr_id, rk, dot_q, cos_q); ranking breaks ties
    to the lowest nbr_id. Zero vectors (norm 0) score NULL cosine and
    rank last. ``queries`` is broadcast — the corpus never shuffles;
    the only exchange is the final per-query top-k window.
    """
    def idot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    # norms are per-ROW properties — computed once per row BEFORE the
    # corpus x queries join, not once per pair (3x O(dim) per pair
    # otherwise; one extra bigint per broadcast row is free)
    cq = quantize_embeddings(corpus, vec_col).select(
        F.col(id_col).alias("nbr_id"),
        F.col("qvec").alias("cv"),
        idot(F.col("qvec"), F.col("qvec")).alias("__nc__"),
    )
    qq = quantize_embeddings(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qv"),
        idot(F.col("qvec"), F.col("qvec")).alias("__nq__"),
    )

    joined = cq.join(F.broadcast(qq), F.col("nbr_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "nbr_id",
        idot(F.col("cv"), F.col("qv")).alias("dot_q"),
        "__nc__",
        "__nq__",
    ).withColumn(
        "__cos_raw__",
        F.when(
            (F.col("__nc__") > 0) & (F.col("__nq__") > 0),
            F.col("dot_q")
            / F.sqrt((F.col("__nc__") * F.col("__nq__")).cast("double")),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw__").desc_nulls_last(), F.col("nbr_id").asc()
    )
    out = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nbr_id", "rk", "dot_q", F.col("__cos_raw__").alias("cos_q"))
    )
    if round_to is not None:
        out = out.withColumn("cos_q", F.round(F.col("cos_q"), round_to))
    return out
