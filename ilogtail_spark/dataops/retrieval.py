"""Sparse lexical retrieval over the corpus: BM25 top-k.

The retrieval step a training-data pipeline runs constantly — "find
the corpus documents most relevant to these probe queries" (targeted
decontamination, seed-document expansion, quality-by-proximity
audits). Re-expressed Spark-first as an inverted-index join:

  corpus scan -> tokenize (scan-side, codegen) -> explode
             -> EARLY broadcast restriction to query terms
             -> (doc_id, term) partial-aggregated tf
             -> per-term df -> idf (tiny, broadcast)
             -> per-(query, doc) score sum -> windowed top-k

Scale shape at 100 TB: document text never shuffles — the only
exchange after the scan carries (doc_id, term, tf, dl) rows for
TERMS THAT APPEAR IN SOME QUERY (the broadcast restriction runs
before the aggregate, so the map-side combine already sees the
pruned stream). The query set is small by definition (a probe /
eval workload, not the corpus) and is broadcast twice: once as a
term filter, once with idf weights attached. The final top-k is a
rank-over-window partitioned by query_id — cardinality |queries| ×
|matching docs|, already restricted.

Scores are emitted quantized — and the quantization happens PER TERM
CONTRIBUTION (micro-ints, floor(c×10^6)) BEFORE the per-doc sum, the
same pattern as DSIR's importance_scores: a sum of bigints is
order-independent, so the score — and therefore the rank — is
bit-identical at any parallelism, cluster size, or engine. Summing
doubles first and flooring after (the previous form) could flip a
milli-point near a .001 boundary between runs, because Spark does
not guarantee float addition order across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ilogtail_spark.dataops.dedup import tokens_col


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Top-k BM25-scored documents per query.

    Returns (query_id, doc_id, score_micro, rank), rank 1..k per
    query, ordered by (score_micro DESC, doc_id ASC). ``score_micro``
    is the sum of per-term contributions each floored to micro-ints —
    order-independent, identical at every parallelism.

    BM25 (Robertson/Sparck Jones, the Lucene "plus one" idf form so
    weights are never negative):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        s(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))

    Terms are lowercased whitespace tokens (``tokens_col``); duplicate
    terms in a query count once (standard bag-of-words probe).
    """
    toks = docs.select(
        F.col(id_col), tokens_col(F.lower(F.col(text_col))).alias("__t__")
    )
    lens = toks.select(F.col(id_col), F.size("__t__").alias("__dl__"))
    # N and avgdl: one tiny aggregate, broadcast into every posting row
    stats = lens.agg(
        F.count("*").alias("__n__"), F.avg("__dl__").alias("__avgdl__")
    )

    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(tokens_col(F.lower(F.col(query_text_col)))).alias("__w__"),
        )
        .distinct()
    )
    # the term filter: distinct query vocabulary, broadcast
    qvocab = qterms.select("__w__").distinct()

    posts = (
        toks.select(
            F.col(id_col),
            F.size("__t__").alias("__dl__"),
            F.explode(F.col("__t__")).alias("__w__"),
        )
        .join(F.broadcast(qvocab), "__w__")  # restrict BEFORE the aggregate
        .groupBy(id_col, "__w__")
        .agg(F.count("*").alias("__tf__"), F.first("__dl__").alias("__dl__"))
    )

    dfreq = posts.groupBy("__w__").agg(F.count("*").alias("__df__"))
    widf = (
        qterms.join(F.broadcast(dfreq), "__w__")  # terms absent from corpus drop out
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(query_id_col),
            "__w__",
            F.log(
                F.lit(1.0)
                + (F.col("__n__") - F.col("__df__") + 0.5) / (F.col("__df__") + 0.5)
            ).alias("__idf__"),
            "__avgdl__",
        )
    )

    # quantize EACH term contribution to a micro-int before the sum:
    # every input (tf, df, n, dl, avgdl) is a pure function of the
    # data, so each floored term is deterministic, and the bigint sum
    # is order-independent — no float-addition-order rank flips
    contrib = posts.join(F.broadcast(widf), "__w__").select(
        F.col(query_id_col),
        F.col(id_col),
        F.floor(
            (
                F.col("__idf__")
                * (F.col("__tf__") * (k1 + 1.0))
                / (
                    F.col("__tf__")
                    + k1 * (1.0 - b + b * F.col("__dl__") / F.col("__avgdl__"))
                )
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("__s__"),
    )
    scored = contrib.groupBy(query_id_col, id_col).agg(
        F.sum("__s__").alias("score_micro")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score_micro", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of
    N rankings — the standard hybrid-retrieval combiner for "BM25
    list + vector list" (and any other mix): a document's fused score
    is the sum over lists of 1 / (k0 + rank), so agreement between
    rankers dominates any single ranker's score scale. ``k0 = 60`` is
    the canonical damping constant.

    Every input needs (query_col, id_col, rank_col) with rank 1-based
    within query (extra columns are ignored). Returns one row per
    fused (query, doc) kept in the top ``k``:
    (query_id, doc_id, rrf_nano, n_lists, best_rank, rank).

    ``rrf_nano`` is the fused score in exact NANO units — each list
    contributes the INTEGER 10^9 DIV (k0 + rank), so the sum is
    BIGINT math: order-independent across partitionings and
    bit-identical in any engine (the float form 1/(k0+r) would make
    tie behavior depend on summation order). Ties break to the lower
    doc id. ``n_lists``/``best_rank`` expose how broad and how high
    the support was — the fields a fusion audit wants.

    Scale shape: each input is already a top-k (|queries| x k rows —
    probe-scale, not corpus-scale); the union, one hash aggregate on
    (query, doc), and one per-query window are all narrow. Cost lives
    in producing the input rankings, not here.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contrib = F.expr(f"CAST({10**9} DIV ({k0} + {rank_col}) AS BIGINT)")
    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            contrib.alias("__rrf__"),
            F.col(rank_col).cast("int").alias("__rank__"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_col, id_col).agg(
        F.sum("__rrf__").alias("rrf_nano"),
        F.count("*").alias("n_lists"),
        F.min("__rank__").alias("best_rank"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_nano").desc(), F.col(id_col).asc()
    )
    return fused.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def eval_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Offline retrieval-quality card: precision@k, recall@k, and
    reciprocal rank per query, from a ranked result list and a
    relevance-judgment table (``qrels``: one (query, doc) row per
    relevant document). All metrics are EXACT integers (micro shares,
    nano reciprocal rank — the rrf_fuse convention), so the eval is
    reproducible across engines and partitionings; averaging into a
    leaderboard number is one aggregate the caller controls.

    Output: one row per query appearing in either input —
    (query_id, n_rel, n_rel_at_k, p_at_k_micro, recall_at_k_micro,
    first_rel_rank, mrr_nano). A query with judgments but no results
    (or none within the rank cut) scores zero; a query with results
    but no judgments has n_rel = 0 and recall NULL (undefined, not
    zero). first_rel_rank is NULL when no relevant document was
    retrieved within k (mrr_nano 0). Both inputs are deduplicated
    defensively: repeated (query, doc) result rows collapse to their
    best rank, so hits count DISTINCT documents and precision can
    never exceed 1.

    Scale shape: results are pre-filtered to rank <= k at the scan
    (the defensive dedup aggregates k-bounded rows); the relevance
    mark is an equi-join on (query, doc) — qrels are judgment-sized,
    broadcastable; per-query reduction is one partial-aggregated
    groupBy. Nothing shuffles document text.
    """
    if k <= 0:
        raise ValueError(f"eval_at_k: k must be > 0, got {k}")
    rel = (
        qrels.select(F.col(query_col), F.col(id_col))
        .distinct()
        .withColumn("__rel__", F.lit(1))
    )
    cut = (
        results.filter(F.col(rank_col) <= k)
        .groupBy(query_col, id_col)
        .agg(F.min(rank_col).cast("bigint").alias("__rank__"))
    )
    marked = cut.join(rel, [query_col, id_col], "left")
    per_q = marked.groupBy(query_col).agg(
        F.sum(F.coalesce(F.col("__rel__"), F.lit(0)))
        .cast("bigint")
        .alias("n_rel_at_k"),
        F.min(F.when(F.col("__rel__") == 1, F.col("__rank__")))
        .cast("bigint")
        .alias("first_rel_rank"),
    )
    totals = rel.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    # the query universe comes from the UNFILTERED results plus the
    # judgments: a query whose results all sit beyond the rank cut
    # still reports a zero row instead of vanishing from the card
    universe = (
        results.select(query_col)
        .unionByName(qrels.select(query_col))
        .distinct()
    )
    j = (
        universe.join(per_q, query_col, "left")
        .join(totals, query_col, "left")
    )
    n_rel = F.coalesce(F.col("n_rel"), F.lit(0)).cast("bigint")
    n_hit = F.coalesce(F.col("n_rel_at_k"), F.lit(0)).cast("bigint")
    return j.select(
        F.col(query_col),
        n_rel.alias("n_rel"),
        n_hit.alias("n_rel_at_k"),
        F.expr(
            f"CAST(CAST(coalesce(n_rel_at_k, 0) AS DECIMAL(38,0)) "
            f"* 1000000 div {k} AS BIGINT)"
        ).alias("p_at_k_micro"),
        F.when(
            n_rel > 0,
            F.expr(
                "CAST(CAST(coalesce(n_rel_at_k, 0) AS DECIMAL(38,0)) "
                "* 1000000 div n_rel AS BIGINT)"
            ),
        ).alias("recall_at_k_micro"),
        F.col("first_rel_rank"),
        F.coalesce(
            F.expr(f"CAST({10**9} DIV first_rel_rank AS BIGINT)"), F.lit(0)
        ).alias("mrr_nano"),
    )


def dcg_weights(k: int) -> tuple[list[int], list[int]]:
    """Micro-int DCG discount table for ranks 1..k plus its prefix
    sums (the ideal-DCG lookup): w_r = round(1e6 / log2(r + 1)).
    Computed ONCE here in Python and embedded as INTEGER LITERALS on
    both engines (the hyperplane/centroid constant-folding trick),
    so the logarithm never executes inside either engine — the one
    place last-ulp libm drift could break cross-engine parity is
    compiled away. k is eval-sized (<= tens), so the table is a
    trivially broadcastable literal array."""
    import math

    if k <= 0:
        raise ValueError(f"dcg_weights: k must be > 0, got {k}")
    w = [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]
    prefix, acc = [], 0
    for x in w:
        acc += x
        prefix.append(acc)
    return w, prefix


def ndcg_at_k(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-position-aware retrieval eval: binary-relevance NDCG@k
    per query — the card eval_at_k cannot produce, because
    precision@k is position-blind (a run that buries its one
    relevant hit at rank k scores the same p@k as one that leads
    with it; NDCG separates them). DCG = Σ rel_r · w_r with the
    w_r = 1e6/log2(r+1) discount table from :func:`dcg_weights`;
    IDCG places the query's n_rel relevant docs at ranks 1..min(
    n_rel, k) — i.e. the discount prefix sum — and ndcg_micro =
    DCG·1e6 div IDCG. All integers end-to-end: the discount table is
    a Python-computed literal shared verbatim with the SQL oracle,
    sums are bigint (order-independent at any parallelism), division
    truncates. Same input contract and defensive dedup as
    eval_at_k; a query with no judgments reports NULL ndcg
    (undefined, not zero), a judged query with no retrieved
    relevant doc reports 0.

    Output: (query_id, n_rel, dcg_micro, idcg_micro, ndcg_micro).

    Scale shape: identical to eval_at_k — rank-cut results
    aggregate k-bounded rows, the relevance mark is a
    judgment-sized equi-join, per-query reduction is one
    combiner-fed groupBy; the discount arrays ride the plan as
    constant-folded literals.
    """
    if k <= 0:
        raise ValueError(f"ndcg_at_k: k must be > 0, got {k}")
    weights, prefix = dcg_weights(k)
    wlit = F.array(*[F.lit(x) for x in weights])
    plit = F.array(*[F.lit(x) for x in prefix])
    rel = (
        qrels.select(F.col(query_col), F.col(id_col))
        .distinct()
        .withColumn("__rel__", F.lit(1))
    )
    cut = (
        results.filter(F.col(rank_col) <= k)
        .groupBy(query_col, id_col)
        .agg(F.min(rank_col).cast("int").alias("__rank__"))
    )
    marked = cut.join(rel, [query_col, id_col], "left")
    per_q = marked.groupBy(query_col).agg(
        F.sum(
            F.when(
                F.col("__rel__") == 1,
                F.element_at(wlit, F.col("__rank__")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("__dcg__")
    )
    totals = rel.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    universe = (
        results.select(query_col)
        .unionByName(qrels.select(query_col))
        .distinct()
    )
    j = universe.join(per_q, query_col, "left").join(totals, query_col, "left")
    n_rel = F.coalesce(F.col("n_rel"), F.lit(0)).cast("bigint")
    dcg = F.coalesce(F.col("__dcg__"), F.lit(0)).cast("bigint")
    idcg = F.when(
        n_rel > 0,
        F.element_at(plit, F.least(n_rel, F.lit(k)).cast("int")),
    ).cast("bigint")
    return j.select(
        F.col(query_col),
        n_rel.alias("n_rel"),
        dcg.alias("dcg_micro"),
        idcg.alias("idcg_micro"),
    ).withColumn(
        "ndcg_micro",
        F.when(
            F.col("n_rel") > 0,
            F.expr("1000000 * dcg_micro div idcg_micro"),
        ).cast("bigint"),
    )
