"""Training-data operation queries (dedup / similarity / text
analysis / multimodal) with DuckDB oracles over the ``documents`` and
``embeddings`` tables. Oracle SQL for the hash-based operators is
GENERATED programmatically so it provably mirrors the Spark-side
construction (same salted-md5 signatures, same literal hyperplanes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ilogtail_spark.dataops import (
    analytics,
    conversations,
    corpus,
    dedup,
    multimodal,
    retrieval,
    sessions,
    similarity,
    textstats,
    urlops,
)
from ilogtail_spark.entryq import _t, query

# shared SQL fragments -----------------------------------------------------
SQL_TOKENS = "list_filter(string_split_regex({col}, '\\s+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# exact dedup — hash groupBy
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    """
    SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM documents GROUP BY 1 ORDER BY keep_id
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_t(spark, sf_dir, "documents")).orderBy("keep_id")


# ---------------------------------------------------------------------------
# minhash signatures (4 hash functions over 3-gram shingles)
# ---------------------------------------------------------------------------
def _minhash_oracle(num_hashes: int) -> str:
    mins = ",\n           ".join(
        f"list_aggregate(list_transform(s, x -> md5('{i}:' || x)), 'min') AS mh{i}"
        for i in range(num_hashes)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(len(w) - 2),
                                      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
                  ELSE [] END AS s
      FROM toks
    )
    SELECT doc_id, {mins}
    FROM sh ORDER BY doc_id
    """


@query("dedup_minhash_sig", _minhash_oracle(4))
def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sig = dedup.minhash_signature(docs, num_hashes=4)
    return sig.select("doc_id", "mh0", "mh1", "mh2", "mh3").orderBy("doc_id")


# ---------------------------------------------------------------------------
# minhash LSH candidate pairs (8 hashes, band size 2)
# ---------------------------------------------------------------------------
def _minhash_pairs_cte(docs_sql: str) -> str:
    """CTE chain (no leading WITH) producing ``pairs`` — the DISTINCT
    (a < b) candidate pairs of the 8-hash/band-2 MinHash construction
    over ``docs_sql`` (must yield (doc_id, text)). ONE copy shared by
    the pairs oracle and the split-leakage oracle so the hash
    construction can never drift between them."""
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {j} AS band_idx, "
        f"md5(mh{2 * j} || '|' || mh{2 * j + 1}) AS band_hash FROM sig"
        for j in range(4)
    )
    mins = ", ".join(
        f"list_aggregate(list_transform(s, x -> md5('{i}:' || x)), 'min') AS mh{i}"
        for i in range(8)
    )
    return f"""toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM ({docs_sql})
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(len(w) - 2),
                                      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
                  ELSE [] END AS s
      FROM toks
    ), sig AS (
      SELECT doc_id, {mins} FROM sh
    ), bands AS (
{band_selects}
    ), pairs AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM bands l JOIN bands r
        ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
    )"""


def _minhash_pairs_oracle() -> str:
    return f"""
    WITH {_minhash_pairs_cte("SELECT doc_id, text FROM documents")}
    SELECT a, b FROM pairs ORDER BY a, b
    """


@query("dedup_minhash_pairs", _minhash_pairs_oracle())
def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.minhash_candidate_pairs(docs).orderBy("a", "b")


# ---------------------------------------------------------------------------
# normalize-then-hash dedup: trivial variants (case / punctuation /
# whitespace) of every 6th doc injected under doc_id + 10^6 on both
# engines — they collapse into their original's group
# ---------------------------------------------------------------------------
@query(
    "dedup_normalized",
    r"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, upper(text) || '!!  ' AS text
      FROM documents WHERE doc_id % 6 = 0
    ), n AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g'))
               AS nm
      FROM d
    )
    SELECT md5(nm) AS text_md5, min(doc_id) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM n GROUP BY 1 ORDER BY keep_id
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("!!  ")).alias("text"),
    )
    aug = docs.union(variants)
    out = dedup.exact_dedup_normalized(aug)
    return out.select(
        "text_md5", "keep_id", F.col("dup_count").cast("bigint").alias("dup_count")
    ).orderBy("keep_id")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------
@query(
    "dedup_jaccard",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, unnest(
        CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                                 i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
      FROM toks
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b, round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2
    ORDER BY a, b
    """,
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.2).orderBy("a", "b")


# ---------------------------------------------------------------------------
# minhash signature calibration: estimated (signature-agreement)
# jaccard vs TRUE shingle jaccard per LSH candidate pair
# ---------------------------------------------------------------------------
def _minhash_calibration_oracle() -> str:
    match_sum = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    return f"""
    WITH {_minhash_pairs_cte("SELECT doc_id, text FROM documents")}, est AS (
      SELECT p.a, p.b,
             CAST(CAST(({match_sum}) AS HUGEINT) * 1000000 // 8 AS BIGINT)
               AS est_jaccard_micro
      FROM pairs p
      JOIN sig sa ON sa.doc_id = p.a
      JOIN sig sb ON sb.doc_id = p.b
    ), shd AS (
      SELECT DISTINCT doc_id, unnest(s) AS s FROM sh
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM shd GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM shd x JOIN shd y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT e.a, e.b, e.est_jaccard_micro,
           coalesce(round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6), 0.0)
             AS jaccard
    FROM est e
    LEFT JOIN inter ON inter.a = e.a AND inter.b = e.b
    JOIN sizes sa ON sa.doc_id = e.a
    JOIN sizes sb ON sb.doc_id = e.b
    ORDER BY e.a, e.b
    """


@query("dedup_minhash_calibration", _minhash_calibration_oracle())
def q_dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.minhash_calibration(docs).orderBy("a", "b")


# ---------------------------------------------------------------------------
# exact-dedup filtering form — keep min id per content group
# ---------------------------------------------------------------------------
@query(
    "dedup_exact_keep",
    """
    SELECT doc_id FROM (
      SELECT doc_id,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    ORDER BY doc_id
    """,
)
def q_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.drop_exact_duplicates(_t(spark, sf_dir, "documents"))
    return out.select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# end-to-end near-dup prune: LSH candidates -> jaccard verify -> drop
# higher id of each verified pair
# ---------------------------------------------------------------------------
def _near_dedup_oracle(threshold: float = 0.2) -> str:
    pairs = _minhash_pairs_oracle()
    # reuse the candidate-pair CTE body, then verify + anti-join
    return f"""
    WITH cand AS (
{pairs.replace("ORDER BY a, b", "")}
    ), toks2 AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sh2 AS (
      SELECT DISTINCT doc_id, unnest(
        CASE WHEN len(w) >= 3
             THEN list_transform(range(len(w) - 2),
                                 i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             ELSE [] END) AS s
      FROM toks2
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
      FROM sh2 x JOIN sh2 y ON x.s = y.s AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ), verified AS (
      SELECT i.a, i.b
      FROM inter i JOIN sizes sa ON sa.doc_id = i.a
                   JOIN sizes sb ON sb.doc_id = i.b
      WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= {threshold}
    ), drops AS (
      SELECT DISTINCT v.b AS doc_id
      FROM cand c JOIN verified v ON c.a = v.a AND c.b = v.b
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)
    ORDER BY d.doc_id
    """


# ---------------------------------------------------------------------------
# transitive near-dup clustering — connected components over the LSH
# candidate graph; oracle = recursive-CTE reachability + min id
# ---------------------------------------------------------------------------
def _cc_cte() -> str:
    """CTE chain (for a WITH RECURSIVE) producing ``ccomp`` =
    (id, comp): the transitive closure of the MinHash candidate-pair
    graph with min-id component labels. ONE copy shared by the
    cluster-ids oracle and the cluster-representatives oracle so the
    closure construction can never drift between them."""
    pairs = _minhash_pairs_oracle().replace("ORDER BY a, b", "")
    return f"""cand AS (
{pairs}
    ), sym AS (
      SELECT a AS x, b AS y FROM cand
      UNION
      SELECT b AS x, a AS y FROM cand
    ), reach(src, dst) AS (
      SELECT x, y FROM sym
      UNION
      SELECT r.src, e.y FROM reach r JOIN sym e ON r.dst = e.x
    ), nodes AS (
      SELECT DISTINCT x AS id FROM sym
    ), ccomp AS (
      SELECT n.id, least(n.id, min(r.dst)) AS comp
      FROM nodes n LEFT JOIN reach r ON r.src = n.id
      GROUP BY n.id
    )"""


def _cc_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_cte()}
    SELECT id, comp FROM ccomp ORDER BY id
    """


@query("dedup_cluster_ids", _cc_oracle())
def q_dedup_cluster_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dedup.minhash_candidate_pairs(docs)
    return dedup.connected_components(pairs).orderBy("id")


@query("dedup_near_filter", _near_dedup_oracle())
def q_dedup_near_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = dedup.near_dedup_filter(docs, threshold=0.2)
    return out.select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# simhash (32-bit expression engine)
# ---------------------------------------------------------------------------
def _simhash_votes_sql(nbits: int) -> str:
    """Shared SQL for the per-bit sign votes over the token-hash list
    ``hs`` — single source for every simhash oracle. Bit 63's mask is
    the signed-long min value (two's complement), mirroring the Spark
    engine — {1 << 63} would widen DuckDB's sum to HUGEINT."""
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {(1 << b) if b < 63 else -(1 << 63)} "
        f"ELSE 0 END)"
        for b in range(nbits)
    )


def _simhash_oracle(nbits: int) -> str:
    votes = _simhash_votes_sql(nbits)
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), hashed AS (
      SELECT doc_id,
             list_transform(w, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN hs IS NULL THEN NULL
                ELSE CAST({votes} AS BIGINT) END AS simhash
    FROM hashed ORDER BY doc_id
    """


@query("dedup_simhash", _simhash_oracle(64))
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exercises the nbits=64 DEFAULT — the corpus-scale operating point
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.simhash_expr(docs).select("doc_id", "simhash").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# brute-force cosine top-k (exact baseline ANN)
# ---------------------------------------------------------------------------
DIM = 64


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range({DIM}), i -> {a}[i+1] * {b}[i+1]))"
        f" / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({b}, x -> x * x))))"
    )


@query(
    "sim_cosine_topk",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_cosine_sql("c.e", "q.e")} AS cos_raw
      FROM v c JOIN q ON c.vec_id <> q.vec_id
    )
    SELECT query_id, nbr_id, rk, round(cos_raw, 6) AS cos
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_raw DESC, nbr_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, queries, k=5).orderBy("query_id", "rk")


# ---------------------------------------------------------------------------
# hard-negative mining: top-k most-similar vectors with a DIFFERENT
# label per anchor (contrastive-training batch construction)
# ---------------------------------------------------------------------------
@query(
    "sim_hard_negatives",
    f"""
    WITH v AS (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             c.label AS nbr_label,
             {_cosine_sql("c.e", "q.e")} AS cos_raw
      FROM v c JOIN q ON c.vec_id <> q.vec_id
       AND c.label IS DISTINCT FROM q.label
    )
    SELECT query_id, nbr_id, nbr_label, rk, round(cos_raw, 6) AS cos
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_raw DESC, nbr_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def q_sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "label", F.col("label").cast("bigint")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.hard_negatives(emb, queries, k=5).orderBy(
        "query_id", "rk"
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN: bucket assignment (the scale path's partitioner)
# ---------------------------------------------------------------------------
def _lsh_bucket_sql(num_planes: int = 8, plane_offset: int = 0) -> str:
    """Shared SQL for the sign-bit bucket over a double-list ``e`` —
    single source for every LSH oracle (bucket/topk/multiprobe/
    near-dup). ``plane_offset`` selects the independent plane-set of
    a multi-band near-dup pass."""
    bit_exprs = []
    for p in range(plane_offset, plane_offset + num_planes):
        terms = " + ".join(
            f"e[{d + 1}] * ({similarity.hyperplane_component(p, d):.1f})"
            for d in range(DIM)
        )
        bit_exprs.append(f"(CASE WHEN {terms} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bit_exprs)


def _lsh_bucket_oracle(num_planes: int = 8) -> str:
    concat = _lsh_bucket_sql(num_planes)
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    )
    SELECT {concat} AS bucket, count(*) AS n, min(vec_id) AS min_vec_id
    FROM v GROUP BY 1 ORDER BY bucket
    """


def _ann_topk_oracle(num_planes: int = 8) -> str:
    bucket = _lsh_bucket_sql(num_planes)
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), b AS (
      SELECT vec_id, e, {bucket} AS bucket FROM v
    ), q AS (SELECT * FROM b WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_cosine_sql("c.e", "q.e")} AS cos_raw
      FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
    )
    SELECT query_id, nbr_id, rk, round(cos_raw, 6) AS cos
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_raw DESC, nbr_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= 3
    ORDER BY query_id, rk
    """


@query("sim_ann_lsh_topk", _ann_topk_oracle())
def q_sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    # pinned operating point (the oracle models single-bucket probing);
    # library DEFAULTS are recall-aware — derived planes + probes=1
    out = similarity.ann_lsh_topk(
        emb, queries, dim=DIM, k=3, num_planes=8, probes=0
    )
    return out.orderBy("query_id", "rk")


def _ann_multiprobe_oracle(num_planes: int = 8) -> str:
    bucket = _lsh_bucket_sql(num_planes)
    flips = ", ".join(
        f"substr(bucket, 1, {i}) || "
        f"(CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END) || "
        f"substr(bucket, {i + 2}, {num_planes - i - 1})"
        for i in range(num_planes)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), b AS (
      SELECT vec_id, e, {bucket} AS bucket FROM v
    ), q0 AS (SELECT * FROM b WHERE vec_id < 20),
    q AS (
      SELECT vec_id, e, unnest([bucket, {flips}]) AS qbucket FROM q0
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_cosine_sql("c.e", "q.e")} AS cos_raw
      FROM b c JOIN q ON c.bucket = q.qbucket AND c.vec_id <> q.vec_id
    )
    SELECT query_id, nbr_id, rk, round(cos_raw, 6) AS cos
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_raw DESC, nbr_id
      ) AS rk
      FROM scored
    )
    WHERE rk <= 3
    ORDER BY query_id, rk
    """


@query("sim_ann_multiprobe", _ann_multiprobe_oracle())
def q_sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    out = similarity.ann_lsh_topk(
        emb, queries, dim=DIM, k=3, num_planes=8, probes=1
    )
    return out.orderBy("query_id", "rk")


def _ann_ivf_oracle(n_centroids: int = 16, nprobe: int = 2, k: int = 3) -> str:
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), c AS (
      SELECT vec_id AS cid,
             list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y))))
               AS ce
      FROM v WHERE vec_id < {n_centroids}
    ), scored_c AS (
      SELECT v.vec_id, c.cid,
             list_sum(list_transform(range({DIM}), i -> v.e[i+1] * c.ce[i+1])) AS s
      FROM v CROSS JOIN c
    ), assign AS (
      SELECT vec_id, cid AS ivf_list FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        FROM scored_c
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, cid AS probe_list FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        FROM scored_c WHERE vec_id < 20
      ) WHERE rn <= {nprobe}
    ), cand AS (
      SELECT p.query_id, a.vec_id AS nbr_id,
             {_cosine_sql("cv.e", "qv.e")} AS cos_raw
      FROM probes p
      JOIN assign a ON a.ivf_list = p.probe_list AND a.vec_id <> p.query_id
      JOIN v cv ON cv.vec_id = a.vec_id
      JOIN v qv ON qv.vec_id = p.query_id
    )
    SELECT query_id, nbr_id, rk, round(cos_raw, 6) AS cos
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_raw DESC, nbr_id
      ) AS rk
      FROM cand
    )
    WHERE rk <= {k}
    ORDER BY query_id, rk
    """


@query("sim_ann_ivf_topk", _ann_ivf_oracle())
def q_sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    out = similarity.ann_ivf_topk(emb, queries, k=3, n_centroids=16, nprobe=2)
    return out.orderBy("query_id", "rk")


def _semantic_dedup_oracle(n_centroids: int = 16, threshold: float = 0.3) -> str:
    # models the library's DEFAULT hot-cluster cap: clusters with more
    # than max_cluster members are skipped from pairing (all kept) —
    # idle at fixture scale, but the oracle must track the default or
    # any corpus with a hot cluster becomes a latent parity divergence
    max_cluster = similarity.SEMANTIC_MAX_CLUSTER
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), c AS (
      SELECT vec_id AS cid,
             list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y))))
               AS ce
      FROM v WHERE vec_id < {n_centroids}
    ), scored_c AS (
      SELECT v.vec_id, c.cid,
             list_sum(list_transform(range({DIM}), i -> v.e[i+1] * c.ce[i+1])) AS s
      FROM v CROSS JOIN c
    ), assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        FROM scored_c
      ) WHERE rn = 1
    ), sizes AS (
      SELECT cluster, count(*) AS n FROM assign GROUP BY cluster
    ), drops AS (
      SELECT DISTINCT r.vec_id
      FROM assign l
      JOIN assign r ON l.cluster = r.cluster AND l.vec_id < r.vec_id
      JOIN sizes sz ON sz.cluster = l.cluster AND sz.n <= {max_cluster}
      JOIN v lv ON lv.vec_id = l.vec_id
      JOIN v rv ON rv.vec_id = r.vec_id
      WHERE {_cosine_sql("lv.e", "rv.e")} >= {threshold}
    )
    SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster
    FROM assign a
    WHERE a.vec_id NOT IN (SELECT vec_id FROM drops)
    ORDER BY a.vec_id
    """


@query("dedup_semantic", _semantic_dedup_oracle())
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: IVF-cluster the embeddings, drop every vector with a
    lower-id cluster-mate above the cosine threshold (keep-min rule,
    deterministic on any engine)."""
    emb = _t(spark, sf_dir, "embeddings")
    # threshold 0.3 exercises real drops on the synthetic vectors
    # (production SemDeDup runs ~0.95 on model embeddings)
    out = similarity.semantic_dedup(emb, threshold=0.3, n_centroids=16)
    return out.select(
        "vec_id", F.col("cluster").cast("int").alias("cluster")
    ).orderBy("vec_id")


def _embedding_neardup_oracle(
    num_planes: int = 16, threshold: float = 0.3, num_bands: int = 1
) -> str:
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, e, {j} AS band_idx, "
        f"{_lsh_bucket_sql(num_planes, j * num_planes)} AS bucket FROM v"
        for j in range(num_bands)
    )
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), b AS (
{band_selects}
    ), cand AS (
      SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
      FROM b l JOIN b r
        ON l.band_idx = r.band_idx AND l.bucket = r.bucket
       AND l.vec_id < r.vec_id
    ), s AS (
      SELECT c.a, c.b, {_cosine_sql("va.e", "vb.e")} AS cos_raw
      FROM cand c JOIN v va ON va.vec_id = c.a JOIN v vb ON vb.vec_id = c.b
    )
    SELECT a, b, round(cos_raw, 6) AS cos
    FROM s WHERE cos_raw >= {threshold}
    ORDER BY a, b
    """


@query("dedup_embedding_cosine", _embedding_neardup_oracle(num_planes=16))
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-band, 16-plane near-dup pass — the scale-safe default
    (2^16 buckets; see embedding_neardup_pairs docstring)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(
        emb, dim=DIM, threshold=0.3, num_planes=16
    ).orderBy("a", "b")


@query(
    "dedup_embedding_banded",
    _embedding_neardup_oracle(num_planes=12, num_bands=2),
)
def q_dedup_embedding_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band variant: two independent 12-plane sets; a pair is a
    candidate on a collision in EITHER band — recall recovered
    minhash-banding-style while each band keeps 2^12 buckets."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(
        emb, dim=DIM, threshold=0.3, num_planes=12, num_bands=2
    ).orderBy("a", "b")


def _simhash_candidates_oracle(nbits: int = 64, blocks: int = 4) -> str:
    width = nbits // blocks
    mask = (1 << width) - 1
    votes = _simhash_votes_sql(nbits)
    block_rows = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {j} AS block_idx, "
        f"(simhash >> {j * width}) & {mask} AS block_val FROM sig"
        for j in range(blocks)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), hashed AS (
      SELECT doc_id,
             list_transform(w, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hs
      FROM toks
    ), sig AS (
      -- NULL text => NULL signature (mirrors Spark's null propagation
      -- through aggregate); NULL block_val then joins nothing, so
      -- signature-less docs never form candidate pairs on either side
      SELECT doc_id,
             CASE WHEN hs IS NULL THEN NULL
                  ELSE CAST({votes} AS BIGINT) END AS simhash
      FROM hashed
    ), blk AS (
{block_rows}
    )
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM blk l JOIN blk r
      ON l.block_idx = r.block_idx AND l.block_val = r.block_val
     AND l.doc_id < r.doc_id
    ORDER BY a, b
    """


@query("dedup_simhash_candidates", _simhash_candidates_oracle())
def q_dedup_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exercises the nbits=64 defaults (2^16-value blocks, the safe
    # corpus-scale configuration)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sig = dedup.simhash_expr(docs).select("doc_id", "simhash")
    return dedup.simhash_candidates(sig).orderBy("a", "b")


@query("sim_lsh_buckets", _lsh_bucket_oracle())
def q_sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    b = similarity.lsh_bucket(emb, dim=DIM, num_planes=8)
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------
@query(
    "text_token_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, text, {SQL_TOKENS.format(col="text")} AS w FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
                 / greatest(len(w), 1), 6) AS avg_token_len
    FROM toks ORDER BY doc_id
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_stats(_t(spark, sf_dir, "documents")).orderBy("doc_id")


_STOP_SQL = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)


@query(
    "text_quality",
    f"""
    WITH toks AS (
      SELECT doc_id, text, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), feat AS (
      SELECT doc_id,
             len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct,
             len(list_filter(w, x -> list_contains([{_STOP_SQL}], lower(x)))) AS stop_hits,
             len(list_distinct(w)) AS n_distinct,
             len(w) AS n_tok,
             len(text) AS n
      FROM toks
    ), micro AS (
      SELECT doc_id,
             round(CAST(punct AS DOUBLE) / greatest(n, 1), 6) AS punct_ratio,
             round(CAST(stop_hits AS DOUBLE) / greatest(n_tok, 1), 6) AS stopword_ratio,
             round(CAST(n_distinct AS DOUBLE) / greatest(n_tok, 1), 6) AS distinct_ratio,
             CAST(floor(punct * 1000000 / greatest(n, 1)) AS BIGINT) AS punct_micro,
             CAST(floor(stop_hits * 1000000 / greatest(n_tok, 1)) AS BIGINT) AS stop_micro,
             CAST(floor(n_distinct * 1000000 / greatest(n_tok, 1)) AS BIGINT) AS distinct_micro,
             n
      FROM feat
    )
    SELECT doc_id, punct_ratio, stopword_ratio, distinct_ratio,
           CAST((CASE WHEN n BETWEEN 50 AND 10000 THEN 250000 ELSE 0 END)
                + (CASE WHEN punct_micro <= 200000 THEN 250000 ELSE 0 END)
                + CAST(floor(least(stop_micro * 10, 1000000) / 4.0) AS BIGINT)
                + CAST(floor(distinct_micro / 4.0) AS BIGINT)
             AS BIGINT) AS quality_score_micro
    FROM micro ORDER BY doc_id
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_score(_t(spark, sf_dir, "documents")).orderBy("doc_id")


# corpus-level boilerplate line removal (C4 filter): a banner line is
# prepended to half the docs on BOTH sides; with df far above the
# threshold it must vanish from every doc while unique lines survive
@query(
    "text_drop_boilerplate",
    """
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN 'please accept our cookie policy' || chr(10) || text
                  ELSE text END AS t
      FROM documents
    ), l AS (
      SELECT doc_id, string_split(t, chr(10)) AS ls FROM src
    ), el AS (
      SELECT DISTINCT doc_id, md5(x.u) AS lh
      FROM l, unnest(ls) AS x(u) WHERE length(x.u) >= 1
    ), hot AS (
      SELECT lh FROM el GROUP BY lh HAVING count(*) > 10
    ), hl AS (
      SELECT coalesce(list(lh), []) AS hs FROM hot
    )
    SELECT doc_id,
           array_to_string(
             list_filter(ls, x -> NOT (length(x) >= 1 AND list_contains(hs, md5(x)))),
             chr(10)) AS text
    FROM l CROSS JOIN hl
    ORDER BY doc_id
    """,
)
def q_text_drop_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("please accept our cookie policy\n"), F.col("text")),
    ).otherwise(F.col("text"))
    out = textstats.drop_boilerplate_lines(
        docs.withColumn("text", t), max_line_df=10
    )
    return out.orderBy("doc_id")


# documents text is single-line; synthesize line structure (and a
# deterministic repeated tail for some docs) identically on both sides
@query(
    "text_repetition",
    """
    WITH src AS (
      SELECT doc_id,
             coalesce(text, '') || CASE WHEN doc_id % 3 = 0
                          THEN chr(10) || 'repeat me' || chr(10) || 'repeat me'
                          ELSE '' END AS t
      FROM documents
    ), feat AS (
      SELECT doc_id,
             list_filter(string_split(t, chr(10)), x -> x <> '') AS lines,
             list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS w
      FROM src
    ), bi AS (
      SELECT doc_id, lines,
             CASE WHEN len(w) >= 2
                  THEN list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])
                  ELSE [] END AS b
      FROM feat
    ), counts AS (
      SELECT doc_id,
             len(lines) AS nl,
             len(list_distinct(lines)) AS dl,
             len(b) AS nb,
             len(list_distinct(b)) AS db,
             coalesce((SELECT max(cnt) FROM (
                SELECT count(*) AS cnt FROM unnest(b) AS u(x) GROUP BY x
             )), 0) AS topb
      FROM bi
    )
    SELECT doc_id,
           CAST(floor((nl - dl) * 1000000 / greatest(nl, 1)) AS BIGINT) AS dup_line_frac_micro,
           CAST(floor(topb * 1000000 / greatest(nb, 1)) AS BIGINT) AS top_bigram_frac_micro,
           CAST(floor((nb - db) * 1000000 / greatest(nb, 1)) AS BIGINT) AS dup_bigram_frac_micro
    FROM counts ORDER BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit("\nrepeat me\nrepeat me")),
    ).otherwise(F.col("text"))
    return textstats.repetition_stats(docs.withColumn("text", t)).orderBy("doc_id")


@query(
    "text_vocab_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="lower(text)")} AS w FROM documents
    ), term_counts AS (
      SELECT term, count(*) AS term_count
      FROM (SELECT unnest(w) AS term FROM toks)
      GROUP BY term
    ), doc_freqs AS (
      SELECT term, count(*) AS doc_freq
      FROM (SELECT DISTINCT doc_id, unnest(w) AS term FROM toks)
      GROUP BY term
    )
    SELECT c.term, c.term_count, d.doc_freq
    FROM term_counts c JOIN doc_freqs d USING (term)
    ORDER BY c.term_count DESC, c.term ASC
    LIMIT 25
    """,
)
def q_text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.vocab_topk(_t(spark, sf_dir, "documents"), k=25)


# documents is English-only, so the multi-language paths are exercised
# by deterministically swapping in fixture sentences per doc_id bucket
# on BOTH sides (same trick as the PII oracle below)
_LANG_FIXTURES = [
    (1, "der Hund und die Katze sind nicht mit einem Ball von den Kindern"),
    (2, "le chat est dans la maison pour que une personne du village passe"),
    (3, "el perro es para una persona del pueblo pero como más gente"),
    (4, "os gatos não são um problema para do da casa com mais calma"),
    (5, "Собака и кошка живут в большом доме у реки"),
    (6, "狗和猫住在房子里它们每天一起玩耍"),
    (7, "犬と猫は家に住んでいますとても元気です"),
]


def _lang_id_oracle() -> str:
    cases = " ".join(
        f"WHEN doc_id % 8 = {k} THEN '{s}'" for k, s in _LANG_FIXTURES
    )
    per_doc = textstats.lang_id_oracle_sql(
        table="documents", text_expr=f"CASE {cases} ELSE text END"
    )
    return f"""
    SELECT lang_pred, count(*) AS n
    FROM ({per_doc}) GROUP BY 1 ORDER BY lang_pred
    """


# ---------------------------------------------------------------------------
# per-source language mixture (same language-swapped fixture as
# text_lang_id, composed with a per-source share aggregate)
# ---------------------------------------------------------------------------
def _lang_mix_oracle() -> str:
    cases = " ".join(
        f"WHEN doc_id % 8 = {k} THEN '{s}'" for k, s in _LANG_FIXTURES
    )
    per_doc = textstats.lang_id_oracle_sql(
        table="documents", text_expr=f"CASE {cases} ELSE text END"
    )
    return f"""
    WITH lp AS ({per_doc}), j AS (
      SELECT d.source, lp.lang_pred AS lang
      FROM lp JOIN documents d USING (doc_id)
    ), per AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM j GROUP BY 1, 2
    ), tot AS (
      SELECT source, sum(n_docs) AS t FROM per GROUP BY source
    )
    SELECT per.source, lang, n_docs,
           CAST(CAST(n_docs AS HUGEINT) * 1000000 // t AS BIGINT)
             AS share_micro
    FROM per JOIN tot USING (source) ORDER BY source, lang
    """


@query("corpus_lang_mix", _lang_mix_oracle())
def q_corpus_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    swapped = F.col("text")
    for k, s in reversed(_LANG_FIXTURES):
        swapped = F.when(F.col("doc_id") % 8 == k, F.lit(s)).otherwise(swapped)
    out = corpus.language_mix_by_source(docs.withColumn("text", swapped))
    return out.orderBy("source", "lang")


@query("text_lang_id", _lang_id_oracle())
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    swapped = F.col("text")
    for k, s in reversed(_LANG_FIXTURES):
        swapped = F.when(F.col("doc_id") % 8 == k, F.lit(s)).otherwise(swapped)
    out = textstats.lang_id(docs.withColumn("text", swapped))
    return (
        out.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n")).orderBy("lang_pred")
    )


# events props carry no PII; synthesize a text column that sometimes
# does, deterministically on BOTH sides, to exercise every pattern
@query(
    "text_pii_flags",
    f"""
    WITH d AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 5 = 0
                          THEN ' contact bob' || CAST(doc_id AS VARCHAR) || '@example.com'
                          ELSE '' END
                  || CASE WHEN doc_id % 7 = 0
                          THEN ' call 555-123-4567' ELSE '' END
                  || CASE WHEN doc_id % 11 = 0
                          THEN ' host 10.1.2.3' ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{textstats.EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{textstats.PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(text, '{textstats.SSN_RE}')) AS n_ssns,
           len(regexp_extract_all(text, '{textstats.IP_RE}')) AS n_ips,
           CAST(len(regexp_extract_all(text, '{textstats.EMAIL_RE}'))
                + len(regexp_extract_all(text, '{textstats.PHONE_RE}'))
                + len(regexp_extract_all(text, '{textstats.SSN_RE}'))
                + len(regexp_extract_all(text, '{textstats.IP_RE}')) > 0 AS INT)
             AS has_pii
    FROM d ORDER BY doc_id
    """,
)
def q_text_pii_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.format_string(" contact bob%d@example.com", F.col("doc_id")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" host 10.1.2.3")).otherwise(
                F.lit("")
            ),
        ),
    )
    return textstats.pii_flags(d).orderBy("doc_id")


@query(
    "text_fingerprint",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
      FROM documents
    )
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS fingerprint
    FROM toks ORDER BY doc_id
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprint(_t(spark, sf_dir, "documents")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal plumbing — mapInPandas feature extraction over binary
# ---------------------------------------------------------------------------
@query(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(list_sum(list_transform(range(octet_length(encode(text))),
                i -> ('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2))::INT))
             AS BIGINT) AS byte_sum,
           lower(substr(hex(encode(text)), 1, 16)) AS head_hex
    FROM documents ORDER BY media_id
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    return multimodal.extract_features(media).orderBy("media_id")


# ---------------------------------------------------------------------------
# multimodal frame sampling — the explode shape a real frame sampler
# produces (one row per sampled byte offset), oracle reconstructs the
# sampled bytes from the utf-8 hex
# ---------------------------------------------------------------------------
@query(
    "multimodal_frames",
    """
    WITH m AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    ), offs AS (
      SELECT doc_id, payload,
             unnest(range(CAST(ceil(octet_length(payload) / 64.0) AS BIGINT))) AS k
      FROM m
    )
    SELECT doc_id AS media_id,
           CAST(k * 64 AS BIGINT) AS frame_off,
           CAST(('0x' || substr(hex(payload), CAST(k * 128 + 1 AS INT), 2)) AS INT)::BIGINT
             AS frame_sum
    FROM offs
    ORDER BY media_id, frame_off
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    return multimodal.frame_sample_stub(media, every_n_bytes=64).orderBy(
        "media_id", "frame_off"
    )


# ---------------------------------------------------------------------------
# multimodal resize plumbing — byte-downsample stand-in; the oracle
# reconstructs the every-4th-byte payload from the utf-8 hex and
# compares it via its md5 (binary columns hash-compare cleanly as hex)
# ---------------------------------------------------------------------------
@query(
    "multimodal_resize",
    """
    WITH m AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    ), resized AS (
      SELECT doc_id, payload,
             COALESCE(octet_length(payload), 0) AS n_in,
             -- empty payload: list_aggregate over [] is NULL, but the
             -- pipeline emits an EMPTY resized payload -> coalesce ''
             COALESCE(list_aggregate(
               list_transform(
                 range(CAST(ceil(octet_length(payload) / 4.0) AS BIGINT)),
                 k -> substr(hex(payload), CAST(k * 8 + 1 AS INT), 2)
               ), 'string_agg', ''), '') AS hex_out
      FROM m
    )
    SELECT doc_id AS media_id,
           CAST(n_in AS BIGINT) AS n_bytes_in,
           CAST(CASE WHEN payload IS NULL THEN 0
                     ELSE length(hex_out) / 2 END AS BIGINT) AS n_bytes_out,
           CASE WHEN payload IS NULL THEN NULL
                ELSE md5(lower(hex_out)) END AS resized_md5
    FROM resized ORDER BY media_id
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.documents_as_media(_t(spark, sf_dir, "documents"))
    out = multimodal.resize_stub(media, factor=4)
    return out.select(
        "media_id",
        "n_bytes_in",
        "n_bytes_out",
        F.md5(F.lower(F.hex(F.col("resized")))).alias("resized_md5"),
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# corpus ops: decontamination, dup-window stats, deterministic
# sampling, token-budget packing (dataops/corpus.py)
# ---------------------------------------------------------------------------
def _shingle_sql(n: int) -> str:
    """DuckDB n-token shingle list from token array ``w`` — mirrors
    dedup.shingles_from_tokens."""
    joined = " || ' ' || ".join(f"w[i+{j + 1}]" for j in range(n))
    return (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_distinct(list_transform(range(len(w) - {n - 1}), i -> {joined})) "
        f"ELSE [] END"
    )


def _decontaminate_oracle(n: int = 5, bench_mod: int = 29, bench_rem: int = 3) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_shingle_sql(n)} AS s FROM toks
    ), bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh
      WHERE doc_id % {bench_mod} = {bench_rem}
    ), probe AS (
      SELECT doc_id, unnest(s) AS g FROM sh
    ), hits AS (
      SELECT doc_id, count(*) AS n_contaminated FROM probe
      WHERE g IN (SELECT g FROM bench) GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(len(s.s) AS BIGINT) AS n_ngrams,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           coalesce(h.n_contaminated, 0) > 0 AS contaminated
    FROM sh s LEFT JOIN hits h USING (doc_id)
    ORDER BY doc_id
    """


@query("corpus_decontaminate", _decontaminate_oracle())
def q_corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 29 == 3)
    out = corpus.contamination_stats(docs, bench, n=5, hash_fn=F.md5)
    return out.select(
        "doc_id",
        F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
        F.col("n_contaminated").cast("bigint").alias("n_contaminated"),
        "contaminated",
    ).orderBy("doc_id")


def _dup_windows_oracle(k: int = 5) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_shingle_sql(k)} AS s FROM toks
    ), win AS (
      SELECT doc_id, unnest(s) AS g FROM sh
    ), dfreq AS (
      SELECT g, count(*) AS c FROM win GROUP BY g
    ), per AS (
      SELECT doc_id, count(*) AS n_windows,
             CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM win JOIN dfreq USING (g) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_windows,
           CAST(floor(coalesce(n_dup, 0) * 1000000
                      / greatest(coalesce(n_windows, 0), 1)) AS BIGINT)
             AS dup_frac_micro
    FROM documents d LEFT JOIN per USING (doc_id)
    ORDER BY doc_id
    """


@query("corpus_dup_windows", _dup_windows_oracle())
def q_corpus_dup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = corpus.dup_window_stats(docs, k=5, hash_fn=F.md5)
    return out.select(
        "doc_id",
        F.col("n_windows").cast("bigint").alias("n_windows"),
        F.col("n_dup_windows").cast("bigint").alias("n_dup_windows"),
        "dup_frac_micro",
    ).orderBy("doc_id")


def _sample_oracle(salt: str, hi: float, lo: float) -> str:
    hi_t = corpus.sample_threshold_hex(hi)
    lo_t = corpus.sample_threshold_hex(lo)
    return f"""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8)
          < CASE WHEN lang = 'en' THEN '{hi_t}' ELSE '{lo_t}' END
    ORDER BY doc_id
    """


@query("corpus_quality_sample", _sample_oracle("s1", 0.9, 0.3))
def q_corpus_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = corpus.quality_tiered_sample(
        docs, [(F.col("lang") == "en", 0.9)], salt="s1", default_rate=0.3
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def _pack_oracle(budget: int) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id,
             len({SQL_TOKENS.format(col="text")}) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id) AS c
      FROM toks
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor((c - n_tokens) / {budget}) AS BIGINT) AS shard_id
    FROM cum ORDER BY doc_id
    """


@query("corpus_pack_shards", _pack_oracle(2000))
def q_corpus_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = corpus.pack_token_budget(docs, budget=2000, num_partitions=8)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "shard_id",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# document chunking — overlapping token windows (RAG / long-doc prep)
# ---------------------------------------------------------------------------
@query(
    "corpus_chunk_windows",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sized AS (
      SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0
    ), st AS (
      SELECT doc_id, w, n, unnest(range(0, n, 64)) AS s FROM sized
    )
    SELECT doc_id,
           CAST(s // 64 AS BIGINT) AS chunk_idx,
           CAST(s AS BIGINT) AS start_tok,
           CAST(least(128, n - s) AS BIGINT) AS n_tokens,
           md5(array_to_string(w[s+1:s+128], ' ')) AS chunk_md5
    FROM st ORDER BY doc_id, chunk_idx
    """,
)
def q_corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return corpus.chunk_windows(docs, window=128, stride=64).orderBy(
        "doc_id", "chunk_idx"
    )


# ---------------------------------------------------------------------------
# chunk-level exact dedup — chunk_windows composed with keep-min on
# the chunk digest (the RAG indexing-prep pipeline)
# ---------------------------------------------------------------------------
@query(
    "corpus_chunk_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sized AS (
      SELECT doc_id, w, len(w) AS n FROM toks WHERE len(w) > 0
    ), st AS (
      SELECT doc_id, w, n, unnest(range(0, n, 64)) AS s FROM sized
    ), ch AS (
      SELECT doc_id,
             CAST(s // 64 AS BIGINT) AS chunk_idx,
             CAST(s AS BIGINT) AS start_tok,
             CAST(least(128, n - s) AS BIGINT) AS n_tokens,
             md5(array_to_string(w[s+1:s+128], ' ')) AS chunk_md5
      FROM st
    )
    SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_md5,
           CAST(dup_count AS BIGINT) AS dup_count
    FROM (
      SELECT *,
             row_number() OVER (
               PARTITION BY chunk_md5 ORDER BY doc_id, chunk_idx) AS rn,
             count(*) OVER (PARTITION BY chunk_md5) AS dup_count
      FROM ch
    ) WHERE rn = 1
    ORDER BY doc_id, chunk_idx
    """,
)
def q_corpus_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = corpus.chunk_dedup(docs, window=128, stride=64)
    return out.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        "n_tokens",
        "chunk_md5",
        F.col("dup_count").cast("bigint").alias("dup_count"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# BM25 retrieval top-k — inverted-index scoring
# ---------------------------------------------------------------------------
def _bm25_probes(docs: DataFrame) -> DataFrame:
    """The shared BM25 probe frame (every 97th document's first 8
    lowercased tokens): ONE construction for the bm25/hybrid/eval@k
    queries, so the probe definition can never drift between the run
    being scored and the judgments scoring it (the SQL twin lives in
    _bm25_oracle's qterms CTE: doc_id % 97 = 5, w[1:8])."""
    return docs.filter(F.col("doc_id") % 97 == 5).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(dedup.tokens_col(F.lower(F.col("text"))), 1, 8), " "
        ).alias("qtext"),
    )


def _bm25_oracle(k: int = 5, qmod: int = 97, qrem: int = 5, qlen: int = 8) -> str:
    toks = SQL_TOKENS.format(col="lower(text)")
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS w FROM documents
    ), lens AS (
      SELECT doc_id, len(w) AS dl FROM toks
    ), stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl FROM lens
    ), qterms AS (
      SELECT DISTINCT doc_id AS query_id, unnest(w[1:{qlen}]) AS term
      FROM toks WHERE doc_id % {qmod} = {qrem}
    ), posts AS (
      SELECT doc_id, unnest(w) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM posts
      WHERE term IN (SELECT DISTINCT term FROM qterms)
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), contrib AS (
      -- per-term contribution floored to micro-ints BEFORE the sum
      -- (mirrors bm25_topk: bigint sums are order-independent)
      SELECT q.query_id, t.doc_id,
             CAST(floor(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
               * 1000000) AS BIGINT) AS c
      FROM tf t
      JOIN dfreq d USING (term)
      JOIN qterms q USING (term)
      JOIN lens l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    ), scored AS (
      SELECT query_id, doc_id,
             CAST(sum(c) AS BIGINT) AS score_micro
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score_micro,
           CAST(row_number() OVER (
             PARTITION BY query_id
             ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
    FROM scored
    QUALIFY rank <= {k}
    ORDER BY query_id, rank
    """


@query("retrieval_bm25_topk", _bm25_oracle())
def q_retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # probes: the first 8 tokens of every 97th document — short
    # keyword queries, the realistic probe shape
    probes = _bm25_probes(docs)
    out = retrieval.bm25_topk(docs, probes, k=5)
    return out.select(
        "query_id", "doc_id", "score_micro", F.col("rank").cast("int").alias("rank")
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# retrieval eval@k over the same BM25 run: qrels = substring-
# containment relevance (every doc whose lowercased text contains the
# probe string — the probe's source doc always qualifies, so n_rel >= 1)
# ---------------------------------------------------------------------------
def _eval_at_k_oracle(k: int = 5, qmod: int = 97, qrem: int = 5) -> str:
    toks = SQL_TOKENS.format(col="lower(text)")
    return f"""
    WITH results AS ({_bm25_oracle(k)}), probes AS (
      SELECT doc_id AS query_id,
             array_to_string(({toks})[1:8], ' ') AS qtext
      FROM documents WHERE doc_id % {qmod} = {qrem}
    ), qrels AS (
      SELECT DISTINCT p.query_id, d.doc_id
      FROM documents d CROSS JOIN probes p
      WHERE position(p.qtext IN lower(d.text)) > 0
    ), marked AS (
      SELECT r.query_id, r.rank,
             CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM results r LEFT JOIN qrels q
        ON q.query_id = r.query_id AND q.doc_id = r.doc_id
      WHERE r.rank <= {k}
    ), per_q AS (
      SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_rel_at_k,
             min(CASE WHEN rel = 1 THEN rank END) AS first_rel_rank
      FROM marked GROUP BY query_id
    ), totals AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
      FROM qrels GROUP BY query_id
    )
    SELECT query_id,
           coalesce(n_rel, 0) AS n_rel,
           coalesce(n_rel_at_k, 0) AS n_rel_at_k,
           CAST(CAST(coalesce(n_rel_at_k, 0) AS HUGEINT) * 1000000
                // {k} AS BIGINT) AS p_at_k_micro,
           CASE WHEN coalesce(n_rel, 0) > 0
                THEN CAST(CAST(coalesce(n_rel_at_k, 0) AS HUGEINT)
                          * 1000000 // n_rel AS BIGINT) END
             AS recall_at_k_micro,
           CAST(coalesce(first_rel_rank, -1) AS BIGINT)
             AS first_rel_rank,
           CAST(coalesce(1000000000 // first_rel_rank, 0) AS BIGINT)
             AS mrr_nano
    FROM per_q FULL OUTER JOIN totals USING (query_id)
    ORDER BY query_id
    """


@query("retrieval_eval_at_k", _eval_at_k_oracle())
def q_retrieval_eval_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    probes = _bm25_probes(docs)
    results = retrieval.bm25_topk(docs, probes, k=5)
    qrels = (
        docs.crossJoin(F.broadcast(probes))
        .filter(F.instr(F.lower(F.col("text")), F.col("qtext")) > 0)
        .select("query_id", "doc_id")
    )
    out = retrieval.eval_at_k(results, qrels, k=5)
    # -1 sentinel for "no relevant doc retrieved within k" (the
    # pandas nullable-int stringification caveat, as conv_context_
    # overflow)
    return out.select(
        "query_id",
        "n_rel",
        "n_rel_at_k",
        "p_at_k_micro",
        "recall_at_k_micro",
        F.coalesce("first_rel_rank", F.lit(-1))
        .cast("bigint")
        .alias("first_rel_rank"),
        "mrr_nano",
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# DSIR importance scores — hashed n-gram log-likelihood ratio
# ---------------------------------------------------------------------------
def _importance_oracle(nb: int = 10007, tmod: int = 29, trem: int = 3) -> str:
    toks = SQL_TOKENS.format(col="lower(text)")
    bigrams = (
        "CASE WHEN len(w) >= 2 THEN "
        "list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2]) "
        "ELSE [] END"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS w FROM documents
    ), feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(f), 1, 15))::BIGINT % {nb} AS b
      FROM (SELECT doc_id, unnest(list_concat(w, {bigrams})) AS f FROM toks)
    ), rc AS (
      SELECT b, count(*) AS rc FROM feats GROUP BY b
    ), tc AS (
      SELECT b, count(*) AS tc FROM feats WHERE doc_id % {tmod} = {trem} GROUP BY b
    ), tot AS (
      SELECT (SELECT count(*) FROM feats) AS rt,
             (SELECT count(*) FROM feats WHERE doc_id % {tmod} = {trem}) AS tt
    ), weights AS (
      SELECT rc.b,
             CAST(floor((ln((coalesce(tc.tc, 0) + 1.0) / (tot.tt + {nb}))
                         - ln((rc.rc + 1.0) / (tot.rt + {nb}))) * 1000000)
                  AS BIGINT) AS wgt
      FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
    ), scored AS (
      SELECT doc_id, count(*) AS n_features, sum(wgt) AS logratio_micro
      FROM feats JOIN weights USING (b) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_features, 0) AS BIGINT) AS n_features,
           CAST(coalesce(s.logratio_micro, 0) AS BIGINT) AS logratio_micro
    FROM documents d LEFT JOIN scored s USING (doc_id)
    ORDER BY d.doc_id
    """


@query("corpus_importance_scores", _importance_oracle())
def q_corpus_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 29 == 3)
    out = corpus.importance_scores(docs, target)
    return out.select(
        "doc_id",
        F.col("n_features").cast("bigint").alias("n_features"),
        F.col("logratio_micro").cast("bigint").alias("logratio_micro"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# URL hygiene — canonicalization, URL-level dedup, domain blocklist
# ---------------------------------------------------------------------------
_URL_FIXTURE_SQL = """
      SELECT doc_id, source,
             CASE doc_id % 4
               WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/p/'
                           || CAST(doc_id % 10 AS VARCHAR) || '/?utm_source=x&b=2&a=1#f'
               WHEN 1 THEN 'https://' || source || '.example.com/p/'
                           || CAST(doc_id % 10 AS VARCHAR) || '?a=1&b=2'
               WHEN 2 THEN 'http://' || source || CAST(doc_id % 3 AS VARCHAR)
                           || '.co.uk/page' || CAST(doc_id % 5 AS VARCHAR) || '/'
               ELSE source || '.example.com/q?fbclid=1'
             END AS url
      FROM documents
"""


def _url_fixture_col() -> F.Column:
    m = F.col("doc_id") % 4
    did = F.col("doc_id")
    return (
        F.when(
            m == 0,
            F.concat(
                F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.COM:443/p/"),
                (did % 10).cast("string"), F.lit("/?utm_source=x&b=2&a=1#f"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/p/"),
                (did % 10).cast("string"), F.lit("?a=1&b=2"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("http://"), F.col("source"), (did % 3).cast("string"),
                F.lit(".co.uk/page"), (did % 5).cast("string"), F.lit("/"),
            ),
        )
        .otherwise(F.concat(F.col("source"), F.lit(".example.com/q?fbclid=1")))
    )


def _url_norm_ctes() -> str:
    """DuckDB CTE chain mirroring urlops.normalize_url +
    registered_domain step for step (shared regex constants)."""
    track = urlops.TRACKING_PARAM_RE
    cc = ", ".join(f"'{s}'" for s in urlops.CC_SLD_SUFFIXES)
    return f"""
    u AS (
{_URL_FIXTURE_SQL}
    ), n1 AS (
      SELECT doc_id, url, regexp_replace(trim(url), '#.*$', '') AS uu FROM u
    ), n2 AS (
      SELECT doc_id, url, uu,
             regexp_extract(uu, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS sr,
             regexp_replace(uu, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
      FROM n1
    ), n3 AS (
      SELECT doc_id, url,
             CASE WHEN sr = '' THEN 'http' ELSE lower(sr) END AS scheme,
             regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)),
                            '^www\\.', '') AS hostport,
             regexp_replace(rest, '^[^/?]*', '') AS pathq
      FROM n2
    ), n4 AS (
      SELECT doc_id, url, scheme,
             CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
                    THEN regexp_replace(hostport, ':80$', '')
                  WHEN scheme = 'https' AND hostport LIKE '%:443'
                    THEN regexp_replace(hostport, ':443$', '')
                  ELSE hostport END AS host,
             regexp_extract(pathq, '^([^?]*)', 1) AS path0,
             regexp_extract(pathq, '\\?(.*)$', 1) AS qs
      FROM n3
    ), n5 AS (
      SELECT doc_id, url, scheme, host,
             CASE WHEN path0 = '' THEN '/'
                  WHEN length(path0) > 1 AND path0 LIKE '%/'
                    THEN regexp_replace(path0, '/$', '')
                  ELSE path0 END AS path,
             list_sort(list_filter(string_split(qs, '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '{track}'))) AS kept
      FROM n4
    ), n6 AS (
      SELECT doc_id, url,
             scheme || '://' || host || path ||
             CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
                  ELSE '' END AS url_norm
      FROM n5
    ), dm AS (
      SELECT doc_id,
             lower(regexp_extract(
               regexp_replace(trim(url), '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
               '^([^/:?#]*)', 1)) AS h
      FROM u
    ), dml AS (
      SELECT doc_id, h, string_split(h, '.') AS ls, len(string_split(h, '.')) AS n
      FROM dm
    ), dom AS (
      SELECT doc_id,
             CASE WHEN n <= 2 THEN h
                  WHEN (ls[n-1] || '.' || ls[n]) IN ({cc})
                    THEN ls[n-2] || '.' || ls[n-1] || '.' || ls[n]
                  ELSE ls[n-1] || '.' || ls[n] END AS domain
      FROM dml
    )"""


@query(
    "url_normalize",
    f"""
    WITH {_url_norm_ctes()}
    SELECT n6.doc_id, n6.url_norm, dom.domain
    FROM n6 JOIN dom USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    with_url = docs.withColumn("url", _url_fixture_col())
    return with_url.select(
        "doc_id",
        urlops.normalize_url(F.col("url")).alias("url_norm"),
        urlops.registered_domain(F.col("url")).alias("domain"),
    ).orderBy("doc_id")


_URL_BLOCKLIST = ["src00.co.uk", "src51.co.uk"]


@query(
    "url_dedup_filter",
    f"""
    WITH {_url_norm_ctes()}
    , keep AS (
      SELECT doc_id FROM (
        SELECT n6.doc_id,
               row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn
        FROM n6
      ) WHERE rn = 1
    )
    SELECT k.doc_id FROM keep k JOIN dom USING (doc_id)
    WHERE dom.domain NOT IN ({", ".join(f"'{d}'" for d in _URL_BLOCKLIST)})
    ORDER BY doc_id
    """,
)
def q_url_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    with_url = docs.withColumn("url", _url_fixture_col())
    bl = with_url.sparkSession.createDataFrame(
        [(d,) for d in _URL_BLOCKLIST], "domain string"
    )
    kept = urlops.drop_url_duplicates(with_url)
    out = urlops.domain_blocklist_filter(kept, bl)
    return out.select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# event sessionization — gap-based session windows (batch form)
# ---------------------------------------------------------------------------
def _session_cte(gap: int) -> str:
    return f"""
    flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > {gap}::BIGINT * 1000000
                  THEN 1 ELSE 0 END AS f
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT event_id, user_id, ts,
             sum(f) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS ord
      FROM flagged
    )"""


_SESSION_GAP = 21600  # 6 h


@query(
    "sessionize_events",
    f"""
    WITH {_session_cte(_SESSION_GAP)}
    SELECT event_id, user_id,
           CAST(ord AS BIGINT) AS session_ordinal,
           CAST(user_id AS VARCHAR) || ':' || CAST(ord AS VARCHAR) AS session_id
    FROM sess WHERE user_id % 50 = 7
    ORDER BY event_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = sessions.sessionize(ev, gap_seconds=_SESSION_GAP, order_col="event_id")
    return (
        out.where(F.col("user_id") % 50 == 7)
        .select(
            "event_id",
            "user_id",
            F.col("session_ordinal").cast("bigint").alias("session_ordinal"),
            "session_id",
        )
        .orderBy("event_id")
    )


@query(
    "sessionize_daily",
    """
    WITH bkt AS (
      SELECT event_id, user_id, ts,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS b
      FROM events
    ), flagged AS (
      SELECT event_id, user_id, ts, b,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > 3600::BIGINT * 1000000
                  THEN 1 ELSE 0 END AS f
      FROM bkt
      WINDOW w AS (PARTITION BY user_id, b ORDER BY ts, event_id)
    ), sess AS (
      SELECT event_id, user_id, b,
             sum(f) OVER (PARTITION BY user_id, b ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS ord
      FROM flagged
    )
    SELECT event_id, user_id,
           CAST(b AS BIGINT) AS session_bucket,
           CAST(ord AS BIGINT) AS session_ordinal,
           CAST(user_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)
             || ':' || CAST(ord AS VARCHAR) AS session_id
    FROM sess WHERE user_id % 50 = 7
    ORDER BY event_id
    """,
)
def q_sessionize_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe sessionization: windows partition on (user, day) so a
    hot user spreads over #days tasks; sessions split at UTC midnight
    by design (daily-rollup semantics)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = sessions.sessionize_bounded(
        ev, gap_seconds=3600, order_col="event_id"
    )
    return (
        out.where(F.col("user_id") % 50 == 7)
        .select(
            "event_id",
            "user_id",
            F.col("session_bucket").cast("bigint").alias("session_bucket"),
            F.col("session_ordinal").cast("bigint").alias("session_ordinal"),
            "session_id",
        )
        .orderBy("event_id")
    )


@query(
    "session_stats",
    f"""
    WITH {_session_cte(_SESSION_GAP)}
    SELECT user_id, CAST(ord AS BIGINT) AS session_ordinal,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS started_at, max(ts) AS ended_at,
           max(CAST(floor(epoch(ts)) AS BIGINT))
             - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_sec
    FROM sess GROUP BY user_id, ord
    ORDER BY user_id, session_ordinal
    """,
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = sessions.session_stats(
        ev, gap_seconds=_SESSION_GAP, order_col="event_id"
    )
    return out.select(
        "user_id",
        F.col("session_ordinal").cast("bigint").alias("session_ordinal"),
        "n_events",
        "started_at",
        "ended_at",
        "duration_sec",
    ).orderBy("user_id", "session_ordinal")


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) exact dedup — new batch vs digest state
# ---------------------------------------------------------------------------
@query(
    "dedup_incremental",
    """
    WITH state AS (
      SELECT DISTINCT md5(text) AS d FROM documents WHERE doc_id % 3 = 0
    ), batch AS (
      SELECT doc_id, md5(text) AS d,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents WHERE doc_id % 3 <> 0
    )
    SELECT b.doc_id, b.d AS text_md5 FROM batch b
    WHERE b.rn = 1 AND NOT EXISTS (SELECT 1 FROM state s WHERE s.d = b.d)
    ORDER BY doc_id
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    state = dedup.state_digests_for(docs.filter(F.col("doc_id") % 3 == 0))
    new = docs.filter(F.col("doc_id") % 3 != 0)
    out = dedup.incremental_exact_dedup(new, state)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("text_md5")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# unigram LM cross-entropy scoring (CCNet-style quality signal): the
# reference LM is fit on a "domain sample" (doc_id % 7 = 0), every
# document is scored under it with a small vocab so OOV is exercised
# ---------------------------------------------------------------------------
def _unigram_lm_oracle(vocab_size: int = 64) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="lower(text)")} AS w FROM documents
    ), tok AS (
      SELECT doc_id, unnest(w) AS t FROM toks
    ), cnt AS (
      SELECT t, count(*) AS c FROM tok WHERE doc_id % 7 = 0 GROUP BY t
    ), tot AS (
      SELECT coalesce(sum(c), 0) AS tt FROM cnt
    ), vocab AS (
      SELECT t, c FROM cnt ORDER BY c DESC, t ASC LIMIT {vocab_size}
    ), vstat AS (
      SELECT count(*) AS V, coalesce(sum(c), 0) AS vc FROM vocab
    ), wt AS (
      SELECT t, CAST(floor(-ln((c + 1.0) / (tt + V + 1.0)) * 1000000) AS BIGINT)
               AS cost
      FROM vocab, tot, vstat
    ), oov AS (
      SELECT CAST(floor(-ln((tt - vc + 1.0) / (tt + V + 1.0)) * 1000000) AS BIGINT)
               AS cost
      FROM tot, vstat
    ), scored AS (
      SELECT tok.doc_id,
             count(*) AS n_tokens,
             sum(CASE WHEN wt.cost IS NULL THEN 1 ELSE 0 END) AS n_oov,
             sum(coalesce(wt.cost, oov.cost)) AS s
      FROM tok LEFT JOIN wt ON tok.t = wt.t CROSS JOIN oov
      GROUP BY tok.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
           CAST(coalesce(s, 0) AS BIGINT) AS sum_cost_micro,
           CAST(floor(coalesce(s, 0) / greatest(coalesce(n_tokens, 0), 1))
                AS BIGINT) AS ce_micro
    FROM documents d LEFT JOIN scored USING (doc_id)
    ORDER BY doc_id
    """


@query("text_unigram_lm", _unigram_lm_oracle())
def q_text_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 7 == 0)
    out = textstats.unigram_lm_scores(docs, ref=ref, vocab_size=64)
    return out.orderBy("doc_id")


# ---------------------------------------------------------------------------
# exact-substring span removal (ExactSubstr rewrite form): excise all
# occurrences of k-token windows shared by >= 2 documents
# ---------------------------------------------------------------------------
def _span_removal_oracle(k: int = 5) -> str:
    joined = " || ' ' || ".join(f"w[i+{j + 1}]" for j in range(k))
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), win AS (
      SELECT doc_id,
             unnest(range(len(w) - {k - 1})) AS pos,
             unnest(list_transform(range(len(w) - {k - 1}),
                                   i -> {joined})) AS g
      FROM toks
    ), dup AS (
      SELECT g FROM win GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ), cov AS (
      SELECT DISTINCT w.doc_id, w.pos + t.j AS idx
      FROM win w JOIN dup USING (g)
      CROSS JOIN unnest(range({k})) AS t(j)
    ), tokpos AS (
      SELECT doc_id, unnest(w) AS tok, unnest(range(len(w))) AS idx FROM toks
    ), keep AS (
      SELECT doc_id, tok, idx FROM tokpos tp
      WHERE NOT EXISTS (SELECT 1 FROM cov c
                        WHERE c.doc_id = tp.doc_id AND c.idx = tp.idx)
    ), agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS cleaned
      FROM keep GROUP BY doc_id
    ), ncov AS (
      SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.w) AS BIGINT) AS n_tokens,
           CAST(coalesce(n.n_removed, 0) AS BIGINT) AS n_removed,
           md5(coalesce(a.cleaned, '')) AS cleaned_md5
    FROM toks t
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN ncov n USING (doc_id)
    ORDER BY doc_id
    """


@query("corpus_span_removal", _span_removal_oracle())
def q_corpus_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = corpus.remove_duplicate_spans(docs, k=5, hash_fn=F.md5)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.col("cleaned")).alias("cleaned_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# streaming sessionization — closed sessions across micro-batches must
# equal the batch definition (the open tail session per user is the
# withheld pending state, so the oracle excludes each user's last one)
# ---------------------------------------------------------------------------
def _drain_two_batch_stream(spark, ev, schema: str, transform):
    """Shared micro-batch harness for the stateful streaming queries:
    write ``ev`` as two time-ordered parquet files split at the
    midpoint of ``ts`` (distinct mtimes => deterministic batch order),
    drain them as two micro-batches (maxFilesPerTrigger=1,
    AvailableNow) through ``transform(readStream)``, and return the
    parquet sink read back. State that spans the midpoint cut is
    exactly what each caller's test pins."""
    import tempfile
    import time as _time

    root = tempfile.mkdtemp(prefix="ilogtail_spark_stream2_")
    in_dir, out_dir, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    ev.filter(F.col("ts") < F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    _time.sleep(1.1)  # distinct mtimes => deterministic batch order
    ev.filter(F.col("ts") >= F.lit(mid)).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out_dir)


@query(
    "streaming_sessionize",
    f"""
    WITH {_session_cte(_SESSION_GAP)}
    , stats AS (
      SELECT user_id, CAST(ord AS INT) AS session_ordinal,
             CAST(count(*) AS BIGINT) AS n_events,
             min(epoch_us(ts)) AS started_us,
             max(epoch_us(ts)) AS ended_us
      FROM sess GROUP BY user_id, ord
    ), mx AS (
      SELECT user_id, max(session_ordinal) AS mo FROM stats GROUP BY user_id
    )
    SELECT s.user_id, s.session_ordinal, s.n_events, s.started_us, s.ended_us
    FROM stats s JOIN mx USING (user_id)
    WHERE s.session_ordinal < mx.mo
    ORDER BY user_id, session_ordinal
    """,
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import streaming_sessionize

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    # sessions span the midpoint cut between the two micro-batches
    out = _drain_two_batch_stream(
        spark,
        ev,
        "event_id long, ts timestamp, user_id long",
        lambda s: streaming_sessionize(s, gap_seconds=_SESSION_GAP),
    )
    return (
        out
        .select(
            "user_id", "session_ordinal", "n_events", "started_us", "ended_us"
        )
        .orderBy("user_id", "session_ordinal")
    )


# ---------------------------------------------------------------------------
# token-blocklist document filter (C4 "bad words") and per-source
# corpus mixture report
# ---------------------------------------------------------------------------
_BADWORDS = ["slow", "vector", "xylophone"]


@query(
    "corpus_badwords_filter",
    f"""
    SELECT doc_id FROM (
      SELECT doc_id,
             len(list_filter({SQL_TOKENS.format(col="lower(text)")},
                             x -> list_contains({_BADWORDS!r}, x))) AS hits
      FROM documents
    ) WHERE hits <= 1 ORDER BY doc_id
    """,
)
def q_corpus_badwords_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = corpus.token_blocklist_filter(docs, _BADWORDS, max_hits=1)
    return out.select("doc_id").orderBy("doc_id")


@query(
    "corpus_mixture_report",
    """
    WITH narrow AS (
      SELECT source AS g, md5(coalesce(text, '')) AS d,
             len(list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                             x -> x <> '')) AS nt,
             length(coalesce(text, '')) AS nc
      FROM documents
    ), freq AS (
      SELECT d, count(*) AS f FROM narrow GROUP BY d
    )
    SELECT g AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(nc) AS BIGINT) AS n_chars,
           CAST(sum(CASE WHEN f > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
    FROM narrow JOIN freq USING (d)
    GROUP BY g ORDER BY source
    """,
)
def q_corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return corpus.mixture_report(docs).orderBy("source")


# ---------------------------------------------------------------------------
# as-of join — latest prior error state attached to every click
# ---------------------------------------------------------------------------
# shared by asof_prior_error and asof_prior_error_daily: the bucketed
# (skew-safe) plan is contract-identical to the plain as-of join, so
# both run against the SAME DuckDB ASOF JOIN oracle
_ASOF_ORACLE = """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), r0 AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'error' AND user_id IS NOT NULL AND ts IS NOT NULL
    ), r AS (
      -- deterministic winner among equal (user, ts): greatest payload,
      -- mirroring the Spark side's lexicographic struct ordering
      SELECT user_id, ts, event_id, value FROM (
        SELECT r0.*, row_number() OVER (
          PARTITION BY user_id, ts ORDER BY event_id DESC, value DESC) AS rn
        FROM r0) WHERE rn = 1
    )
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           coalesce(epoch_us(r.ts), -1) AS err_ts_us,
           coalesce(r.event_id, -1) AS err_event_id,
           coalesce(r.value, -1.0) AS err_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """


def _asof_query(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    from ilogtail_spark.dataops import asof

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof.asof_join(
        left, right, on="user_id", ts_col="ts",
        right_cols=["event_id", "value"], prefix="err_", **kw
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.coalesce(
            F.unix_micros(F.col("err_ts").cast("timestamp")), F.lit(-1)
        ).alias("err_ts_us"),
        F.coalesce(F.col("err_event_id"), F.lit(-1)).alias("err_event_id"),
        F.coalesce(F.col("err_value"), F.lit(-1.0)).alias("err_value"),
    ).orderBy("event_id")


@query("asof_prior_error", _ASOF_ORACLE)
def q_asof_prior_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _asof_query(spark, sf_dir)


@query("asof_prior_error_daily", _ASOF_ORACLE)
def q_asof_prior_error_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe variant: (key, day) windows + per-day seed rows —
    same oracle, because the bucketed plan is contract-identical;
    a hot key spreads over #days tasks instead of serializing."""
    return _asof_query(spark, sf_dir, bucket_seconds=86_400)


# ---------------------------------------------------------------------------
# bucketed co-located join — shuffle elimination persisted at rest
# ---------------------------------------------------------------------------
@query(
    "bucketed_colocated_join",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(floor(sum(l_quantity)) AS BIGINT) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders and lineitem bucketed by orderkey, then join them
    WITHOUT any exchange under the join (the bucket spec co-locates
    both sides at rest — plans/bucketed.py docstring has the 100 TB
    sizing rule). The aggregate on top is the only shuffle, and it
    carries (priority, count, sum) rows. Results are identical to the
    unbucketed oracle join by construction — bucketing is a physical
    layout choice, invisible to semantics."""
    from ilogtail_spark.plans import bucketed as B

    db = B.create_bucket_db(spark)
    try:
        B.write_bucketed(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            f"{db}.orders_b", "o_orderkey", 8,
        )
        B.write_bucketed(
            _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
            f"{db}.lineitem_b", "l_orderkey", 8,
        )
        j = B.colocated_join(
            spark, f"{db}.orders_b", f"{db}.lineitem_b",
            "o_orderkey", "l_orderkey",
        )
        agg = (
            j.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                F.floor(F.sum("l_quantity")).cast("bigint").alias("sum_qty"),
            )
            .orderBy("o_orderpriority")
        )
        # materialize the 5-row result BEFORE dropping the bucket db:
        # repeated harness invocations must not accumulate full
        # bucketed table copies under /tmp
        rows, schema = agg.collect(), agg.schema
        return spark.createDataFrame(rows, schema)
    finally:
        B.drop_bucket_db(spark, db)


# ---------------------------------------------------------------------------
# Gopher word-level quality rules (integer cross-multiplied flags)
# ---------------------------------------------------------------------------
@query(
    "text_gopher_flags",
    f"""
    WITH feat AS (
      SELECT doc_id,
             {SQL_TOKENS.format(col="coalesce(text, '')")} AS w,
             length(coalesce(text, '')) - length(replace(coalesce(text, ''), '#', '')) AS hash_n,
             (length(coalesce(text, '')) - length(replace(coalesce(text, ''), '...', ''))) // 3 AS ell_n
      FROM documents
    ), f2 AS (
      SELECT doc_id, len(w) AS nw,
             coalesce(list_aggregate(list_transform(w, x -> length(x)), 'sum'), 0) AS wlen,
             len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha,
             hash_n + ell_n AS sym,
             len(list_intersect(list_transform(w, x -> lower(x)),
                 ['the','be','to','of','and','that','have','with'])) AS stop
      FROM feat
    )
    SELECT doc_id, CAST(nw AS BIGINT) AS n_tokens,
      CAST(CASE WHEN nw < 30 OR nw > 100000 THEN 1 ELSE 0 END AS BIGINT) AS flag_token_count,
      CAST(CASE WHEN wlen < 3 * nw OR wlen > 10 * nw THEN 1 ELSE 0 END AS BIGINT) AS flag_mean_word_len,
      CAST(CASE WHEN sym * 100 > 10 * nw THEN 1 ELSE 0 END AS BIGINT) AS flag_symbol_ratio,
      CAST(CASE WHEN alpha * 100 < 80 * nw THEN 1 ELSE 0 END AS BIGINT) AS flag_alpha_ratio,
      CAST(CASE WHEN stop < 1 THEN 1 ELSE 0 END AS BIGINT) AS flag_stopwords,
      CAST(CASE WHEN (CASE WHEN nw < 30 OR nw > 100000 THEN 1 ELSE 0 END)
                   + (CASE WHEN wlen < 3 * nw OR wlen > 10 * nw THEN 1 ELSE 0 END)
                   + (CASE WHEN sym * 100 > 10 * nw THEN 1 ELSE 0 END)
                   + (CASE WHEN alpha * 100 < 80 * nw THEN 1 ELSE 0 END)
                   + (CASE WHEN stop < 1 THEN 1 ELSE 0 END) = 0
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM f2 ORDER BY doc_id
    """,
)
def q_text_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return textstats.gopher_flags(
        docs, min_tokens=30, min_stop_hits=1
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# salted skew-safe join — hot-key spreading with exact join parity
# ---------------------------------------------------------------------------
@query(
    "salted_skew_join",
    """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_events
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join must produce EXACTLY the rows of the plain
    equi join (the oracle) — salting is a physical spreading of one
    hot key over salt_buckets tasks, invisible to semantics."""
    from ilogtail_spark.plans import skew

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "event_id"
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_nationkey"
    )
    j = skew.salted_join(ev, cust, on="k", salt_buckets=8, salt_src=["event_id"])
    return (
        j.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# incremental MinHash near-dedup — new batch vs the LSH band state of
# previously-kept docs (state = doc_id % 3 == 0, batch = the rest)
# ---------------------------------------------------------------------------
def _minhash_incremental_oracle() -> str:
    mins = ", ".join(
        f"list_aggregate(list_transform(s, x -> md5('{i}:' || x)), 'min') AS mh{i}"
        for i in range(8)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"      SELECT doc_id, {j} AS band_idx, "
        f"md5(mh{2 * j} || '|' || mh{2 * j + 1}) AS band_hash FROM sig"
        for j in range(4)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(len(w) - 2),
                                      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
                  ELSE [] END AS s
      FROM toks
    ), sig AS (
      SELECT doc_id, {mins} FROM sh
    ), bands AS (
{band_selects}
    ), state_b AS (
      SELECT DISTINCT band_idx, band_hash FROM bands
      WHERE doc_id % 3 = 0 AND band_hash IS NOT NULL
    ), batch AS (
      SELECT doc_id, md5(text) AS d,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents WHERE doc_id % 3 <> 0
    ), bk AS (
      SELECT doc_id, d FROM batch WHERE rn = 1
    ), hit AS (
      SELECT DISTINCT b.doc_id
      FROM bands b JOIN state_b s USING (band_idx, band_hash)
      WHERE b.doc_id % 3 <> 0
    )
    SELECT bk.doc_id, bk.d AS text_md5 FROM bk
    WHERE NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = bk.doc_id)
    ORDER BY doc_id
    """


@query("dedup_minhash_incremental", _minhash_incremental_oracle())
def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    state = dedup.state_bands_for(docs.filter(F.col("doc_id") % 3 == 0))
    new = docs.filter(F.col("doc_id") % 3 != 0)
    out = dedup.incremental_near_dedup(new, state)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("text_md5")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# mixture rebalancing to target per-source token shares (DoReMi-style
# weighting; exact-integer thresholds so any engine keeps the same docs)
# ---------------------------------------------------------------------------
_REBALANCE_TARGETS = {
    "src0": 400_000,
    "src1": 300_000,
    "src2": 200_000,
    "src3": 100_000,
    "src4": 1_000_000,  # target above the source's volume -> kept whole
}
_REBALANCE_BUDGET = 2000


def _rebalance_oracle() -> str:
    values = ", ".join(
        f"('{s}', {w})" for s, w in sorted(_REBALANCE_TARGETS.items())
    )
    d = corpus._REBALANCE_HEX_DIGITS
    scale = 16**d
    # HUGEINT products mirror the Spark side's DECIMAL(38,0) math —
    # both 128-bit exact, so neither engine can wrap or round
    return f"""
    WITH tok AS (
      SELECT doc_id, source, len({SQL_TOKENS.format(col="text")}) AS nt
      FROM documents
    ), tot AS (
      SELECT source, sum(nt) AS tot FROM tok GROUP BY source
    ), w(source, wm) AS (
      VALUES {values}
    ), tgt AS (
      SELECT tot.source, tot.tot,
             CAST((CAST({_REBALANCE_BUDGET} AS HUGEINT) * coalesce(w.wm, 0))
                  // 1000000 AS BIGINT) AS tgt
      FROM tot LEFT JOIN w USING (source)
    ), thr AS (
      SELECT source,
             CASE WHEN tgt >= tot THEN 'g'
                  ELSE lower(lpad(to_hex(CAST(
                         (CAST(tgt AS HUGEINT) * {scale}) // tot AS BIGINT)),
                       {d}, '0')) END
               AS thr
      FROM tgt
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(nt) AS BIGINT) AS kept_tokens
    FROM tok JOIN thr USING (source)
    WHERE substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, {d}) < thr
    GROUP BY source ORDER BY source
    """


@query("corpus_mixture_rebalance", _rebalance_oracle())
def q_corpus_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    kept = corpus.rebalance_mixture(
        docs, _REBALANCE_TARGETS, token_budget=_REBALANCE_BUDGET, salt="mix"
    )
    ntok = F.size(dedup.tokens_col(F.coalesce(F.col("text"), F.lit(""))))
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum(ntok).cast("bigint").alias("kept_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII redaction — the rewrite twin of text_pii_flags, same injected PII
# ---------------------------------------------------------------------------
def _pii_redact_oracle() -> str:
    red = "text"
    counts = []
    for pattern, placeholder in textstats.PII_REDACTIONS:
        red = f"regexp_replace({red}, '{pattern}', '{placeholder}', 'g')"
        counts.append(f"len(regexp_extract_all(text, '{pattern}'))")
    total = " + ".join(counts)
    return f"""
    WITH d AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 5 = 0
                          THEN ' contact bob' || CAST(doc_id AS VARCHAR) || '@example.com'
                          ELSE '' END
                  || CASE WHEN doc_id % 7 = 0
                          THEN ' call 555-123-4567' ELSE '' END
                  || CASE WHEN doc_id % 11 = 0
                          THEN ' host 10.1.2.3' ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           md5({red}) AS redacted_md5,
           CAST({total} AS BIGINT) AS n_redacted
    FROM d ORDER BY doc_id
    """


@query("text_pii_redact", _pii_redact_oracle())
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.format_string(" contact bob%d@example.com", F.col("doc_id")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" host 10.1.2.3")).otherwise(
                F.lit("")
            ),
        ),
    ).select("doc_id", "text")
    out = textstats.pii_redact(d)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("redacted_md5"), "n_redacted"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# heavy-hitter / hot-key report — the measurement step before salting
# ---------------------------------------------------------------------------
@query(
    "events_hotkeys",
    """
    WITH c AS (
      SELECT event_type AS key, count(*) AS n_rows FROM events GROUP BY 1
    ), t AS (
      SELECT sum(n_rows) AS tot FROM c
    )
    SELECT key,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST((CAST(n_rows AS HUGEINT) * 1000000) // tot AS BIGINT)
             AS share_micro,
           CAST((CAST(n_rows AS HUGEINT) * 1000000) // tot >= 100000 AS INT)
             AS is_hot
    FROM c, t ORDER BY n_rows DESC, key ASC LIMIT 5
    """,
)
def q_events_hotkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans import skew

    ev = _t(spark, sf_dir, "events").select("event_type")
    return skew.hotkey_stats(
        ev, "event_type", top_k=5, hot_share_micro=100_000
    )


# ---------------------------------------------------------------------------
# decontamination FILTER — the rewrite form of corpus_decontaminate
# (same n=5 / benchmark = doc_id % 29 == 3 operating point)
# ---------------------------------------------------------------------------
def _decontaminate_filter_oracle(
    n: int = 5, bench_mod: int = 29, bench_rem: int = 3, max_hits: int = 0
) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="text")} AS w FROM documents
    ), sh AS (
      SELECT doc_id, {_shingle_sql(n)} AS s FROM toks
    ), bench AS (
      SELECT DISTINCT unnest(s) AS g FROM sh
      WHERE doc_id % {bench_mod} = {bench_rem}
    ), probe AS (
      SELECT doc_id, unnest(s) AS g FROM sh
    ), hits AS (
      SELECT doc_id, count(*) AS n_contaminated FROM probe
      WHERE g IN (SELECT g FROM bench) GROUP BY doc_id
    )
    SELECT d.doc_id, md5(d.text) AS text_md5
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE coalesce(h.n_contaminated, 0) <= {max_hits}
    ORDER BY doc_id
    """


@query("corpus_decontaminate_filter", _decontaminate_filter_oracle())
def q_corpus_decontaminate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 29 == 3)
    out = corpus.decontaminate_filter(docs, bench, n=5, hash_fn=F.md5)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("text_md5")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# embedding-cluster data card (population / label diversity per IVF list)
# ---------------------------------------------------------------------------
def _cluster_report_oracle(n_centroids: int = 16) -> str:
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), c AS (
      SELECT vec_id AS cid,
             list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y))))
               AS ce
      FROM v WHERE vec_id < {n_centroids}
    ), scored_c AS (
      SELECT v.vec_id, c.cid,
             list_sum(list_transform(range({DIM}), i -> v.e[i+1] * c.ce[i+1])) AS s
      FROM v CROSS JOIN c
    ), assign AS (
      SELECT vec_id, cid AS ivf_list FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
        FROM scored_c
      ) WHERE rn = 1
    ), lab AS (
      SELECT a.ivf_list, CAST(e.label AS BIGINT) AS label, count(*) AS n
      FROM assign a JOIN embeddings e USING (vec_id)
      GROUP BY 1, 2
    )
    SELECT CAST(ivf_list AS BIGINT) AS ivf_list,
           CAST(n_vectors AS BIGINT) AS n_vectors,
           CAST(n_labels AS BIGINT) AS n_labels,
           top_label,
           CAST(top_label_n AS BIGINT) AS top_label_n,
           CAST((CAST(top_label_n AS HUGEINT) * 1000000) // n_vectors AS BIGINT)
             AS top_share_micro
    FROM (
      SELECT ivf_list, label AS top_label, n AS top_label_n,
             sum(n) OVER (PARTITION BY ivf_list) AS n_vectors,
             count(*) OVER (PARTITION BY ivf_list) AS n_labels,
             row_number() OVER (
               PARTITION BY ivf_list ORDER BY n DESC, label ASC) AS rn
      FROM lab
    ) WHERE rn = 1 ORDER BY ivf_list
    """


@query("sim_cluster_report", _cluster_report_oracle())
def q_sim_cluster_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cluster_report(emb, n_centroids=16).orderBy("ivf_list")


# ---------------------------------------------------------------------------
# deterministic split assignment (train/val/test; frozen-eval-set draw)
# ---------------------------------------------------------------------------
_SPLITS_MICRO = {"train": 900_000, "val": 50_000, "test": 50_000}


def _split_assign_oracle() -> str:
    names = list(_SPLITS_MICRO)
    cum = 0
    whens = []
    for name in names[:-1]:
        cum += _SPLITS_MICRO[name]
        thr = format(cum * 16**8 // 1_000_000, "08x")
        whens.append(f"WHEN draw < '{thr}' THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
    return f"""
    WITH d AS (
      SELECT doc_id,
             substring(md5('' || CAST(doc_id AS VARCHAR)), 1, 8) AS draw
      FROM documents
    )
    SELECT doc_id, {case} AS split FROM d ORDER BY doc_id
    """


@query("corpus_split_assign", _split_assign_oracle())
def q_corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = corpus.assign_splits(docs, _SPLITS_MICRO)
    return out.select("doc_id", "split").orderBy("doc_id")


# ---------------------------------------------------------------------------
# split-leakage audit: near-dup pairs crossing an i.i.d. per-doc split.
# Exact clones of every 9th doc are injected under doc_id + 10^6 on
# BOTH engines — a clone shares every LSH band with its original, so
# candidate pairs provably exist, and ~18.5% of (id, id+10^6) draws
# land in different splits under the 90/5/5 shares
# ---------------------------------------------------------------------------
def _split_case_sql(key_sql: str) -> str:
    # thresholds derive from the SAME _SPLITS_MICRO dict as
    # _split_assign_oracle, with the draw inlined per key expression
    names = list(_SPLITS_MICRO)
    draw = f"substring(md5('' || CAST({key_sql} AS VARCHAR)), 1, 8)"
    cum = 0
    whens = []
    for name in names[:-1]:
        cum += _SPLITS_MICRO[name]
        thr = format(cum * 16**8 // 1_000_000, "08x")
        whens.append(f"WHEN {draw} < '{thr}' THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def _split_leakage_oracle() -> str:
    docs_sql = """SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id % 9 = 0"""
    return f"""
    WITH {_minhash_pairs_cte(docs_sql)}, sp AS (
      SELECT {_split_case_sql("a")} AS sa,
             {_split_case_sql("b")} AS sb,
             a, b
      FROM pairs
    ), lk AS (
      SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b, a, b
      FROM sp WHERE sa <> sb
    ), np AS (
      SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
      FROM lk GROUP BY 1, 2
    ), nd AS (
      SELECT split_a, split_b, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
      FROM (
        SELECT split_a, split_b, a AS d FROM lk
        UNION ALL
        SELECT split_a, split_b, b AS d FROM lk
      ) GROUP BY 1, 2
    )
    SELECT np.split_a, np.split_b, n_pairs, n_docs
    FROM np JOIN nd USING (split_a, split_b)
    ORDER BY split_a, split_b
    """


@query("corpus_split_leakage", _split_leakage_oracle())
def q_corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    aug = docs.union(clones)
    return corpus.split_leakage(aug, _SPLITS_MICRO).orderBy(
        "split_a", "split_b"
    )


# ---------------------------------------------------------------------------
# snapshot diff (added/removed/changed between two corpus snapshots)
# ---------------------------------------------------------------------------
def _snapshot_diff_oracle() -> str:
    return """
    WITH old AS (
      SELECT doc_id, md5(text) AS old_md5 FROM documents
    ), new_snap AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                      ELSE text END) AS new_md5
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             md5('added doc ' || CAST(doc_id AS VARCHAR)) AS new_md5
      FROM documents WHERE doc_id % 11 = 0
    ), j AS (
      SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_md5, n.new_md5
      FROM old o FULL OUTER JOIN new_snap n USING (doc_id)
    )
    SELECT doc_id,
           CASE WHEN old_md5 IS NULL THEN 'added'
                WHEN new_md5 IS NULL THEN 'removed'
                WHEN old_md5 <> new_md5 THEN 'changed'
                ELSE 'unchanged' END AS status,
           old_md5, new_md5
    FROM j
    WHERE NOT (old_md5 IS NOT NULL AND new_md5 IS NOT NULL
               AND old_md5 = new_md5)
    ORDER BY doc_id
    """


@query("corpus_snapshot_diff", _snapshot_diff_oracle())
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    new_snap = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat(
                    F.lit("added doc "), F.col("doc_id").cast("string")
                ).alias("text"),
            )
        )
    )
    return corpus.snapshot_diff(docs, new_snap).orderBy("doc_id")


# ---------------------------------------------------------------------------
# per-source exact-duplication rate (clones of every 6th doc injected
# under the SAME source on both engines, the cluster-histogram idiom)
# ---------------------------------------------------------------------------
_DUP_RATE_DIGEST = "coalesce(md5(text), '__null__')"


@query(
    "corpus_dup_rate",
    f"""
    WITH d AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT source, text FROM documents WHERE doc_id % 6 = 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT {_DUP_RATE_DIGEST}) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT {_DUP_RATE_DIGEST}) AS BIGINT)
             AS n_dup_docs,
           CAST(CAST(count(*) - count(DISTINCT {_DUP_RATE_DIGEST})
                     AS HUGEINT) * 1000000 // count(*) AS BIGINT)
             AS dup_rate_micro
    FROM d GROUP BY source ORDER BY source
    """,
)
def q_corpus_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    aug = docs.union(
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 6 == 0)
        .select("source", "text")
    )
    return corpus.dup_rate_by_source(aug).orderBy("source")


# ---------------------------------------------------------------------------
# per-source drift card between two snapshots (same synthesized new
# snapshot as corpus_snapshot_diff: %5 edited, %7 dropped, %11 added)
# ---------------------------------------------------------------------------
_DRIFT_TOKENS = f"coalesce(len({SQL_TOKENS.format(col='text')}), 0)"


@query(
    "corpus_snapshot_drift",
    f"""
    WITH old AS (
      SELECT source, text FROM documents
    ), new_snap AS (
      SELECT source,
             CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END
               AS text
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT source, 'added doc ' || CAST(doc_id AS VARCHAR) AS text
      FROM documents WHERE doc_id % 11 = 0
    ), co AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs_old,
             CAST(sum({_DRIFT_TOKENS}) AS BIGINT) AS tokens_old
      FROM old GROUP BY source
    ), cn AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs_new,
             CAST(sum({_DRIFT_TOKENS}) AS BIGINT) AS tokens_new
      FROM new_snap GROUP BY source
    )
    SELECT coalesce(co.source, cn.source) AS source,
           coalesce(n_docs_old, 0) AS n_docs_old,
           coalesce(n_docs_new, 0) AS n_docs_new,
           coalesce(n_docs_new, 0) - coalesce(n_docs_old, 0) AS doc_delta,
           coalesce(tokens_old, 0) AS tokens_old,
           coalesce(tokens_new, 0) AS tokens_new,
           coalesce(tokens_new, 0) - coalesce(tokens_old, 0) AS token_delta,
           CASE WHEN coalesce(n_docs_old, 0) > 0
                THEN CAST(CAST(coalesce(tokens_old, 0) AS HUGEINT)
                          * 1000000 // n_docs_old AS BIGINT) END
             AS mean_tokens_old_micro,
           CASE WHEN coalesce(n_docs_new, 0) > 0
                THEN CAST(CAST(coalesce(tokens_new, 0) AS HUGEINT)
                          * 1000000 // n_docs_new AS BIGINT) END
             AS mean_tokens_new_micro
    FROM co FULL OUTER JOIN cn USING (source)
    ORDER BY source
    """,
)
def q_corpus_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    new_snap = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "source",
                F.concat(
                    F.lit("added doc "), F.col("doc_id").cast("string")
                ).alias("text"),
            )
        )
    )
    return corpus.snapshot_drift(docs, new_snap).orderBy("source")


# ---------------------------------------------------------------------------
# int8-quantized cosine top-k (exact-integer dot products)
# ---------------------------------------------------------------------------
def _cosine_topk_quantized_oracle(k: int = 5) -> str:
    dot = f"list_sum(list_transform(range({DIM}), i -> c.qv[i+1] * q.qv[i+1]))"
    nc = f"list_sum(list_transform(range({DIM}), i -> c.qv[i+1] * c.qv[i+1]))"
    nq = f"list_sum(list_transform(range({DIM}), i -> q.qv[i+1] * q.qv[i+1]))"
    return f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), m AS (
      SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS mx FROM v
    ), q8 AS (
      SELECT vec_id,
             CASE WHEN mx = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(
                    e, x -> CAST(floor((x * 127.0) / mx + 0.5) AS BIGINT))
             END AS qv
      FROM m
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {dot} AS dot_q, {nc} AS nc, {nq} AS nq
      FROM q8 c CROSS JOIN q8 q
      WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
    ), ranked AS (
      SELECT query_id, nbr_id, dot_q,
             CASE WHEN nc > 0 AND nq > 0
                  THEN dot_q / sqrt(CAST(nc * nq AS DOUBLE)) END AS cos_raw,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY (CASE WHEN nc > 0 AND nq > 0
                         THEN dot_q / sqrt(CAST(nc * nq AS DOUBLE)) END)
                        DESC NULLS LAST,
                        nbr_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, nbr_id, rk, CAST(dot_q AS BIGINT) AS dot_q,
           round(cos_raw, 6) AS cos_q
    FROM ranked WHERE rk <= {k} ORDER BY query_id, rk
    """


@query("sim_cosine_topk_quantized", _cosine_topk_quantized_oracle())
def q_sim_cosine_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk_quantized(emb, queries, k=5).orderBy(
        "query_id", "rk"
    )


# ---------------------------------------------------------------------------
# per-source quota sampling (domain caps)
# ---------------------------------------------------------------------------
def _source_quota_oracle(quota: int) -> str:
    # semantics contract: exactly the quota LOWEST (draw, id) per source
    return f"""
    WITH d AS (
      SELECT doc_id, source,
             substring(md5('' || CAST(doc_id AS VARCHAR)), 1, 8) AS draw
      FROM documents
    ), r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source ORDER BY draw, doc_id) AS rn
      FROM d
    )
    SELECT doc_id, source FROM r WHERE rn <= {quota} ORDER BY doc_id
    """


@query("corpus_source_quota", _source_quota_oracle(10))
def q_corpus_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # prefilter_factor=2 with 25-doc sources forces the candidate-
    # threshold path (cap 20 < 25), not just the keep-all branch
    out = corpus.source_quota_sample(docs, quota=10, prefilter_factor=2)
    return out.select("doc_id", "source").orderBy("doc_id")


# ---------------------------------------------------------------------------
# exact nearest-rank value quantiles per event type
# ---------------------------------------------------------------------------
_QS_MICRO = (500_000, 900_000, 990_000)


def _quantiles_oracle() -> str:
    qlist = ", ".join(str(q) for q in _QS_MICRO)
    return f"""
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ), qs AS (SELECT unnest([{qlist}]) AS q_micro)
    SELECT r.event_type, CAST(q.q_micro AS BIGINT) AS q_micro,
           r.n, r.value AS q_value
    FROM r CROSS JOIN qs q
    WHERE r.rn = greatest(1, (q.q_micro * r.n + 999999) // 1000000)
    ORDER BY event_type, q_micro
    """


@query("events_value_quantiles", _quantiles_oracle())
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = analytics.grouped_quantiles(ev, "event_type", "value", _QS_MICRO)
    return out.orderBy("event_type", "q_micro")


# ---------------------------------------------------------------------------
# quantile drift between two event snapshots (drift injected on both
# engines: %3 rows dropped, value doubled on %5 — doubling a double
# is exact, so deltas are deterministic)
# ---------------------------------------------------------------------------
def _quantile_drift_oracle() -> str:
    qlist = ", ".join(str(q) for q in _QS_MICRO)

    def side(tbl: str) -> str:
        return f"""SELECT event_type, CAST(q.q_micro AS BIGINT) AS q_micro,
           r.n, r.value AS q_value
    FROM (SELECT event_type, value,
                 row_number() OVER (
                   PARTITION BY event_type ORDER BY value) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM {tbl} WHERE value IS NOT NULL) r
    CROSS JOIN (SELECT unnest([{qlist}]) AS q_micro) q
    WHERE r.rn = greatest(1, (q.q_micro * r.n + 999999) // 1000000)"""

    return f"""
    WITH new_snap AS (
      SELECT event_type,
             CASE WHEN event_id % 5 = 0 THEN value * 2 ELSE value END
               AS value
      FROM events WHERE event_id % 3 <> 0
    ), qo AS ({side("events")}), qn AS ({side("new_snap")})
    SELECT coalesce(qo.event_type, qn.event_type) AS event_type,
           coalesce(qo.q_micro, qn.q_micro) AS q_micro,
           CAST(coalesce(qo.n, 0) AS BIGINT) AS n_old,
           CAST(coalesce(qn.n, 0) AS BIGINT) AS n_new,
           qo.q_value AS q_value_old,
           qn.q_value AS q_value_new,
           qn.q_value - qo.q_value AS q_delta
    FROM qo FULL OUTER JOIN qn
      ON qo.event_type = qn.event_type AND qo.q_micro = qn.q_micro
    ORDER BY event_type, q_micro
    """


@query("events_quantile_drift", _quantile_drift_oracle())
def q_events_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    new = ev.filter(F.col("event_id") % 3 != 0).withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.col("value") * 2).otherwise(
            F.col("value")
        ),
    )
    out = analytics.grouped_quantile_diff(
        ev, new, "event_type", "value", _QS_MICRO
    )
    return out.orderBy("event_type", "q_micro")


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 + vector cosine fused with reciprocal-rank fusion
# ---------------------------------------------------------------------------
def _hybrid_rrf_oracle(
    k: int = 5, per_list: int = 10, k0: int = 60, qmod: int = 97, qrem: int = 5
) -> str:
    toks = SQL_TOKENS.format(col="lower(text)")
    cos = _cosine_sql("c.e", "q.e")
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS w FROM documents
    ), lens AS (
      SELECT doc_id, len(w) AS dl FROM toks
    ), stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl FROM lens
    ), qterms AS (
      SELECT DISTINCT doc_id AS query_id, unnest(w[1:8]) AS term
      FROM toks WHERE doc_id % {qmod} = {qrem}
    ), posts AS (
      SELECT doc_id, unnest(w) AS term FROM toks
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM posts
      WHERE term IN (SELECT DISTINCT term FROM qterms)
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), contrib AS (
      SELECT q.query_id, t.doc_id,
             CAST(floor(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
               * 1000000) AS BIGINT) AS c
      FROM tf t
      JOIN dfreq d USING (term)
      JOIN qterms q USING (term)
      JOIN lens l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
    ), lex AS (
      SELECT query_id, doc_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(sum(c) AS BIGINT) DESC, doc_id ASC) AS rank
      FROM contrib GROUP BY query_id, doc_id
      QUALIFY rank <= {per_list}
    ), v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), vq AS (SELECT * FROM v WHERE vec_id % {qmod} = {qrem}),
    vec AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos} DESC, c.vec_id ASC) AS rank
        FROM v c JOIN vq q ON c.vec_id <> q.vec_id
      ) WHERE rank <= {per_list}
    ), unioned AS (
      SELECT query_id, doc_id, 1000000000 // ({k0} + rank) AS c, rank
      FROM lex
      UNION ALL
      SELECT query_id, doc_id, 1000000000 // ({k0} + rank) AS c, rank
      FROM vec
    ), fused AS (
      SELECT query_id, doc_id,
             CAST(sum(c) AS BIGINT) AS rrf_nano,
             CAST(count(*) AS BIGINT) AS n_lists,
             CAST(min(rank) AS INT) AS best_rank
      FROM unioned GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_nano, n_lists, best_rank,
           CAST(row_number() OVER (
             PARTITION BY query_id
             ORDER BY rrf_nano DESC, doc_id ASC) AS INT) AS rank
    FROM fused
    QUALIFY rank <= {k}
    ORDER BY query_id, rank
    """


@query("retrieval_hybrid_rrf", _hybrid_rrf_oracle())
def q_retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    probes = _bm25_probes(docs)
    lex = retrieval.bm25_topk(docs, probes, k=10)
    emb = _t(spark, sf_dir, "embeddings")
    vqueries = emb.filter(F.col("vec_id") % 97 == 5)
    vec = similarity.cosine_topk(emb, vqueries, k=10, round_to=None).select(
        F.col("query_id"),
        F.col("nbr_id").alias("doc_id"),
        F.col("rk").alias("rank"),
    )
    fused = retrieval.rrf_fuse([lex, vec], k=5)
    return fused.orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# composed end-to-end corpus prep: dedup -> quality filter -> split -> card
# ---------------------------------------------------------------------------
def _prep_report_oracle(min_q: int = 700_000) -> str:
    # duplicate docs are synthesized (every 50th doc re-appears under
    # id+1e6) so the dedup stage provably fires; quality formula and
    # split thresholds mirror text_quality / corpus_split_assign
    names = list(_SPLITS_MICRO)
    cum = 0
    whens = []
    for name in names[:-1]:
        cum += _SPLITS_MICRO[name]
        thr = format(cum * 16**8 // 1_000_000, "08x")
        whens.append(f"WHEN draw < '{thr}' THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
    toks = SQL_TOKENS.format(col="text")
    return f"""
    WITH unioned AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, source
      FROM documents WHERE doc_id % 50 = 0
    ), keepers AS (
      SELECT doc_id, text, source FROM (
        SELECT doc_id, text, source,
               row_number() OVER (
                 PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM unioned) t WHERE rn = 1
    ), toks AS (
      SELECT doc_id, text, source, {toks} AS w FROM keepers
    ), feat AS (
      SELECT doc_id, source, len(w) AS n_tok,
             len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct,
             len(list_filter(w, x -> list_contains([{_STOP_SQL}], lower(x)))) AS stop_hits,
             len(list_distinct(w)) AS n_distinct,
             len(text) AS n
      FROM toks
    ), scored AS (
      SELECT doc_id, source, n_tok,
             CAST((CASE WHEN n BETWEEN 50 AND 10000 THEN 250000 ELSE 0 END)
                  + (CASE WHEN floor(punct * 1000000 / greatest(n, 1)) <= 200000
                          THEN 250000 ELSE 0 END)
                  + CAST(floor(least(floor(stop_hits * 1000000 / greatest(n_tok, 1)) * 10,
                                     1000000) / 4.0) AS BIGINT)
                  + CAST(floor(floor(n_distinct * 1000000 / greatest(n_tok, 1)) / 4.0) AS BIGINT)
               AS BIGINT) AS q_micro
      FROM feat
    ), good AS (
      SELECT *, substring(md5('' || CAST(doc_id AS VARCHAR)), 1, 8) AS draw
      FROM scored WHERE q_micro >= {min_q}
    )
    SELECT {case} AS split, source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(q_micro) AS BIGINT) AS sum_quality_micro
    FROM good
    GROUP BY 1, 2 ORDER BY split, source
    """


@query("corpus_prep_report", _prep_report_oracle())
def q_corpus_prep_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    unioned = docs.unionByName(
        docs.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
        )
    )
    return corpus.prep_report(
        unioned, _SPLITS_MICRO, min_quality_micro=700_000
    )


# ---------------------------------------------------------------------------
# C4 global line dedup (keep one occurrence corpus-wide, rewrite docs)
# ---------------------------------------------------------------------------
def _line_dedup_oracle(per_line: int = 8) -> str:
    # documents are single-line fixtures, so both sides first re-wrap
    # text into 8-token lines (same deterministic rewrap)
    toks = SQL_TOKENS.format(col="text")
    return f"""
    WITH wrapped AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 range((len(w) + {per_line} - 1) // {per_line}),
                 i -> array_to_string(w[i*{per_line}+1 : i*{per_line}+{per_line}], ' ')),
               chr(10)) AS text
      FROM (SELECT doc_id, {toks} AS w FROM documents)
    ), lines AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM wrapped
    ), keyed AS (
      SELECT doc_id, unnest(range(len(ls))) AS pos, ls FROM lines
    ), k2 AS (
      SELECT doc_id, pos, md5(trim(ls[pos+1])) AS lh,
             len(trim(ls[pos+1])) >= 1 AS eligible
      FROM keyed
    ), winners AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               row_number() OVER (
                 PARTITION BY lh ORDER BY doc_id, pos) AS rn
        FROM k2 WHERE eligible) t WHERE rn = 1
    ), keep AS (
      SELECT doc_id, pos FROM winners
      UNION ALL
      SELECT doc_id, pos FROM k2 WHERE NOT eligible
    ), agg AS (
      SELECT doc_id, list_sort(list(pos)) AS kept FROM keep GROUP BY doc_id
    )
    SELECT l.doc_id,
           CAST(len(ls) AS INT) AS n_lines,
           CAST(len(ls) - len(coalesce(kept, [])) AS INT) AS n_removed,
           coalesce(array_to_string(
             list_transform(coalesce(kept, []), p -> ls[p+1]),
             chr(10)), '') AS cleaned
    FROM lines l LEFT JOIN agg a USING (doc_id)
    ORDER BY l.doc_id
    """


def _rewrap_lines(docs: DataFrame, per_line: int = 8) -> DataFrame:
    toks = dedup.tokens_col(F.col("text"))
    n_lines = F.ceil(F.size(toks) / F.lit(per_line)).cast("int")
    # guard n_lines >= 1: sequence(0, -1) defaults to step -1 and
    # yields [0, -1] on a zero-token doc, diverging from the oracle's
    # empty range(0) (latent — current fixtures have no empty docs)
    lines = F.when(n_lines <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(
                F.slice(toks, i * per_line + 1, per_line), " "
            ),
        )
    )
    return docs.select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )


@query("corpus_line_dedup", _line_dedup_oracle())
def q_corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return corpus.drop_duplicate_lines(_rewrap_lines(docs)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# funnel analysis (ordered view -> click -> purchase conversion)
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = ["view", "click", "purchase"]


def _funnel_oracle() -> str:
    return """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t FROM events e
      JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), counts AS (
      SELECT 1 AS step_idx, 'view' AS step, count(*) AS n FROM s1
      UNION ALL SELECT 2, 'click', count(*) FROM s2
      UNION ALL SELECT 3, 'purchase', count(*) FROM s3
    )
    SELECT CAST(step_idx AS INT) AS step_idx, step,
           CAST(n AS BIGINT) AS n_users,
           CAST((n * 1000000) // (SELECT n FROM counts WHERE step_idx = 1)
                AS BIGINT) AS conversion_micro
    FROM counts ORDER BY step_idx
    """


@query("events_funnel", _funnel_oracle())
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.funnel_report(ev, _FUNNEL_STEPS)


# ---------------------------------------------------------------------------
# weekly cohort retention
# ---------------------------------------------------------------------------
def _retention_oracle() -> str:
    return """
    WITH a AS (
      SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS p
      FROM events WHERE ts IS NOT NULL
    ), c AS (
      SELECT u, min(p) AS c FROM a GROUP BY u
    ), cells AS (
      SELECT c.c AS cohort,
             CAST(datediff('day', CAST(c.c AS DATE), CAST(a.p AS DATE)) // 7
                  AS INT) AS "offset",
             count(*) AS n_users
      FROM a JOIN c USING (u) GROUP BY 1, 2
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort, "offset",
           CAST(n_users AS BIGINT) AS n_users,
           CAST((n_users * 1000000)
                // (max(CASE WHEN "offset" = 0 THEN n_users END)
                    OVER (PARTITION BY cohort)) AS BIGINT) AS retention_micro
    FROM cells ORDER BY cohort, "offset"
    """


@query("events_cohort_retention", _retention_oracle())
def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.cohort_retention(ev, period="week")


# ---------------------------------------------------------------------------
# per-source token-length distribution (reuses grouped_quantiles)
# ---------------------------------------------------------------------------
def _token_quantiles_oracle() -> str:
    toks = SQL_TOKENS.format(col="coalesce(text, '')")
    qlist = ", ".join(str(q) for q in _QS_MICRO)
    return f"""
    WITH t AS (
      SELECT source, len({toks}) AS n_tokens FROM documents
    ), r AS (
      SELECT source, n_tokens,
             row_number() OVER (
               PARTITION BY source ORDER BY n_tokens) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM t
    ), qs AS (SELECT unnest([{qlist}]) AS q_micro)
    SELECT r.source, CAST(q.q_micro AS BIGINT) AS q_micro, r.n,
           CAST(r.n_tokens AS BIGINT) AS n_tokens
    FROM r CROSS JOIN qs q
    WHERE r.rn = greatest(1, (q.q_micro * r.n + 999999) // 1000000)
    ORDER BY source, q_micro
    """


@query("corpus_token_quantiles", _token_quantiles_oracle())
def q_corpus_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # coalesce: NULL text = 0 tokens on BOTH engines (Spark size(NULL)
    # is -1; DuckDB ranks NULL lengths last) — same guard as the
    # mixture-rebalance query above
    lens = docs.select(
        "source",
        F.size(
            dedup.tokens_col(F.coalesce(F.col("text"), F.lit("")))
        ).cast("bigint").alias("n_tokens"),
    )
    out = analytics.grouped_quantiles(
        lens, "source", "n_tokens", _QS_MICRO, out_value="n_tokens"
    )
    return out.orderBy("source", "q_micro")


# ---------------------------------------------------------------------------
# event-rate spike report (factor-over-trailing-mean, exact integers)
# ---------------------------------------------------------------------------
def _rate_spikes_oracle(
    trailing: int = 24, factor_micro: int = 3_000_000, min_trailing: int = 3
) -> str:
    return f"""
    WITH counts AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             count(*) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ), t AS (
      SELECT event_type, bucket_ts, n_events,
             CAST(count(n_events) OVER w AS BIGINT) AS trailing_n,
             CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT)
               AS trailing_sum
      FROM counts
      WINDOW w AS (
        PARTITION BY event_type ORDER BY bucket_ts
        ROWS BETWEEN {trailing} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_ts, n_events, trailing_n, trailing_sum,
           (trailing_n >= {min_trailing}
            AND n_events * trailing_n * 1000000
                > {factor_micro} * trailing_sum) AS is_spike
    FROM t ORDER BY event_type, bucket_ts
    """


@query("events_rate_spikes", _rate_spikes_oracle())
def q_events_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.rate_spikes(ev).orderBy("event_type", "bucket_ts")


# ---------------------------------------------------------------------------
# per-source length outliers (docs above their source's p99 tokens)
# ---------------------------------------------------------------------------
def _length_outliers_oracle(q_micro: int = 990_000) -> str:
    toks = SQL_TOKENS.format(col="coalesce(text, '')")
    return f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({toks}) AS BIGINT) AS n_tokens
      FROM documents
    ), r AS (
      SELECT source, n_tokens,
             row_number() OVER (
               PARTITION BY source ORDER BY n_tokens) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM t
    ), p99 AS (
      SELECT source, n_tokens AS p99_tokens
      FROM r
      WHERE rn = greatest(1, ({q_micro} * n + 999999) // 1000000)
    )
    SELECT t.doc_id, t.source, t.n_tokens, p.p99_tokens
    FROM t JOIN p99 p USING (source)
    WHERE t.n_tokens > p.p99_tokens
    ORDER BY t.doc_id
    """


@query("corpus_length_outliers", _length_outliers_oracle())
def q_corpus_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # coalesce: NULL text must count as 0 tokens on BOTH engines —
    # size(NULL) is -1 in Spark while DuckDB ranks NULL lengths last
    lens = docs.select(
        "doc_id",
        "source",
        F.size(
            dedup.tokens_col(F.coalesce(F.col("text"), F.lit("")))
        ).cast("bigint").alias("n_tokens"),
    )
    # lens feeds BOTH the p99 aggregate and the outer filter side;
    # without a checkpoint Spark scans + regex-tokenizes the text
    # twice (subtrees differ after column pruning). Checkpointing the
    # narrow (id, source, n_tokens) ints costs one ~24 B/doc write —
    # far cheaper than a second full-text tokenize pass at corpus
    # scale. Same trade as corpus.dup_windows (corpus.py localCheckpoint
    # note); windowing by source instead would sort all docs on a
    # handful of hot source keys.
    lens = lens.localCheckpoint(eager=False)
    p99 = analytics.grouped_quantiles(
        lens, "source", "n_tokens", (990_000,), out_value="p99_tokens"
    ).select("source", "p99_tokens")
    out = lens.join(F.broadcast(p99), "source").filter(
        F.col("n_tokens") > F.col("p99_tokens")
    )
    return out.select("doc_id", "source", "n_tokens", "p99_tokens").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# streaming rate-spike monitor — closed buckets across micro-batches
# must equal the batch rate_spikes definition (each type's open tail
# bucket is withheld pending state, so the oracle excludes it)
# ---------------------------------------------------------------------------
@query(
    "streaming_rate_spikes",
    """
    WITH counts AS (
      SELECT event_type,
             CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS bucket_us,
             count(*) AS n_events
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ), t AS (
      SELECT event_type, bucket_us, n_events,
             CAST(count(n_events) OVER w AS BIGINT) AS trailing_n,
             CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT)
               AS trailing_sum
      FROM counts
      WINDOW w AS (
        PARTITION BY event_type ORDER BY bucket_us
        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ), mx AS (
      SELECT event_type, max(bucket_us) AS mb FROM t GROUP BY event_type
    )
    SELECT t.event_type, t.bucket_us, CAST(t.n_events AS BIGINT) AS n_events,
           t.trailing_n, t.trailing_sum,
           (t.trailing_n >= 3
            AND t.n_events * t.trailing_n * 1000000
                > 3000000 * t.trailing_sum) AS is_spike
    FROM t JOIN mx USING (event_type)
    WHERE t.bucket_us < mx.mb
    ORDER BY event_type, bucket_us
    """,
)
def q_streaming_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import streaming_rate_spikes

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    # hour buckets span the midpoint cut between the two micro-batches
    out = _drain_two_batch_stream(
        spark,
        ev,
        "event_id long, ts timestamp, event_type string",
        streaming_rate_spikes,
    )
    return (
        out
        .select(
            "event_type", "bucket_us", "n_events", "trailing_n",
            "trailing_sum", "is_spike",
        )
        .orderBy("event_type", "bucket_us")
    )


# ---------------------------------------------------------------------------
# zero-filled per-(type, hour) counts (telemetry gap-fill / resample)
# ---------------------------------------------------------------------------
@query(
    "events_gapfill_hourly",
    """
    WITH base AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts
      FROM events WHERE ts IS NOT NULL
    ), counts AS (
      SELECT event_type, bucket_ts, count(*) AS n FROM base GROUP BY 1, 2
    ), spans AS (
      SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM base GROUP BY 1
    ), dense AS (
      SELECT s.event_type,
             unnest(generate_series(s.lo, s.hi, INTERVAL 1 HOUR))
               AS bucket_ts
      FROM spans s
    )
    SELECT d.event_type, d.bucket_ts,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
    FROM dense d LEFT JOIN counts c USING (event_type, bucket_ts)
    ORDER BY event_type, bucket_ts
    """,
)
def q_events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.gapfill_counts(ev)


# ---------------------------------------------------------------------------
# conversation structural integrity + SFT pair extraction: the driver's
# events table is reshaped into the transcripts shape DETERMINISTICALLY
# on BOTH engines (conv = user, turn_idx = per-user event rank, role =
# event_type mapping), with integrity defects INJECTED for the report
# query (every 19th event_id shifts its idx +1 => one dup + one gap)
# ---------------------------------------------------------------------------
_ROLE_CASE = """CASE event_type WHEN 'click' THEN 'user'
        WHEN 'view' THEN 'assistant' WHEN 'purchase' THEN 'assistant'
        WHEN 'error' THEN 'tool' ELSE 'system' END"""

# the oracle-side mirror of _as_transcript(inject=False): ONE shared
# CTE body so the transcript reshaping (idx tiebreak, role mapping)
# can never desynchronize between the conversation oracles
_TRANSCRIPT_SQL = f"""SELECT user_id AS conv_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1
               AS turn_idx,
             {_ROLE_CASE} AS role,
             props AS text
      FROM events"""


def _as_transcript(
    spark: SparkSession, sf_dir: str, inject: bool, with_ts: bool = False
) -> DataFrame:
    from pyspark.sql import Window as _W

    # alias user_id -> conv_id BEFORE the rank window so the single
    # hash exchange lands on conv_id and every downstream window in
    # the conversation operators reuses it (aliasing above the window
    # would strand the partitioning on user_id)
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("conv_id"),
        "event_id",
        "event_type",
        "props",
        *(["ts"] if with_ts else []),
    )
    rn = (
        F.row_number().over(_W.partitionBy("conv_id").orderBy("event_id")) - 1
    ).cast("bigint")
    idx = rn + F.when(F.col("event_id") % 19 == 0, 1).otherwise(0) if inject else rn
    role = (
        F.when(F.col("event_type") == "click", "user")
        .when(F.col("event_type").isin("view", "purchase"), "assistant")
        .when(F.col("event_type") == "error", "tool")
        .otherwise("system")
    )
    return ev.select(
        "conv_id",
        idx.alias("turn_idx"),
        role.alias("role"),
        F.col("props").alias("text"),
        *(["ts"] if with_ts else []),
    )


@query(
    "conv_integrity_report",
    f"""
    WITH t AS (
      SELECT user_id AS conv_id,
             (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1)
               + CASE WHEN event_id % 19 = 0 THEN 1 ELSE 0 END AS turn_idx,
             {_ROLE_CASE} AS role
      FROM events
    ), f AS (
      SELECT conv_id, turn_idx, role,
             lag(role) OVER (PARTITION BY conv_id
                             ORDER BY turn_idx, role) AS prev_role
      FROM t
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(min(turn_idx) AS BIGINT) AS min_idx,
           CAST(max(turn_idx) AS BIGINT) AS max_idx,
           CAST(count(*) - count(DISTINCT turn_idx) AS BIGINT) AS n_dup_idx,
           CAST(max(turn_idx) - min(turn_idx) + 1
                - count(DISTINCT turn_idx) AS BIGINT) AS n_gap_idx,
           CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
                AS BIGINT) AS n_role_repeats,
           CAST(sum(CASE WHEN role = 'tool'
                         AND coalesce(prev_role, '') <> 'assistant'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_tool,
           (count(*) = count(DISTINCT turn_idx)
            AND max(turn_idx) - min(turn_idx) + 1 = count(DISTINCT turn_idx)
            AND sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) = 0
            AND sum(CASE WHEN role = 'tool'
                         AND coalesce(prev_role, '') <> 'assistant'
                    THEN 1 ELSE 0 END) = 0
            AND min(turn_idx) = 0) AS is_clean
    FROM f GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=True)
    return conversations.conversation_integrity(t).orderBy("conv_id")


@query(
    "conv_sft_pairs",
    f"""
    WITH t AS (
      {_TRANSCRIPT_SQL}
    ), n AS (
      SELECT conv_id, turn_idx, role,
             md5(text) AS d, CAST(length(text) AS BIGINT) AS ch,
             lead(turn_idx) OVER w AS nidx, lead(role) OVER w AS nrole,
             lead(md5(text)) OVER w AS nd,
             lead(CAST(length(text) AS BIGINT)) OVER w AS nch
      FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, role)
    )
    SELECT conv_id,
           CAST(turn_idx AS BIGINT) AS prompt_idx,
           CAST(nidx AS BIGINT) AS response_idx,
           d AS prompt_md5, nd AS response_md5,
           ch AS prompt_chars, nch AS response_chars
    FROM n
    WHERE role = 'user' AND nrole = 'assistant' AND nidx = turn_idx + 1
    ORDER BY conv_id, prompt_idx
    """,
)
def q_conv_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.sft_pairs(t)


# ---------------------------------------------------------------------------
# conversation-LEVEL dedup + near-dup: the transcript is cloned
# deterministically on BOTH engines (conversations of every 7th user
# re-ingested under conv_id + 10^6; the near-dup variant additionally
# regenerates the clone's first turn) so the duplicate detectors
# provably fire
# ---------------------------------------------------------------------------
def _conv_clones(spark: SparkSession, sf_dir: str, edit: bool) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    c = t.filter(F.col("conv_id") % 7 == 0).withColumn(
        "conv_id", F.col("conv_id") + F.lit(1_000_000)
    )
    if edit:
        c = c.withColumn(
            "text",
            F.when(F.col("turn_idx") == 0, F.lit("REGENERATED")).otherwise(
                F.col("text")
            ),
        )
    return t.unionByName(c)


def _conv_clone_sql(edit: bool) -> str:
    text_expr = (
        "CASE WHEN turn_idx = 0 THEN 'REGENERATED' ELSE text END"
        if edit
        else "text"
    )
    return f"""t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT * FROM t0
      UNION ALL
      SELECT conv_id + 1000000, turn_idx, role, {text_expr}
      FROM t0 WHERE conv_id % 7 = 0
    )"""


@query(
    "conv_dedup",
    f"""
    WITH {_conv_clone_sql(edit=False)}, d AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
             md5(string_agg(role || ':' || coalesce(md5(text), ''), '|'
                 ORDER BY turn_idx, role, coalesce(md5(text), '')))
               AS conv_md5
      FROM t GROUP BY conv_id
    )
    SELECT conv_id, conv_md5, n_turns,
           CAST(count(*) OVER (PARTITION BY conv_md5) AS BIGINT)
             AS dup_count,
           (row_number() OVER (PARTITION BY conv_md5 ORDER BY conv_id) = 1)
             AS keep
    FROM d ORDER BY conv_id
    """,
)
def q_conv_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _conv_clones(spark, sf_dir, edit=False)
    return conversations.conversation_dedup(t).orderBy("conv_id")


@query(
    "conv_near_pairs",
    f"""
    WITH {_conv_clone_sql(edit=True)}, seq AS (
      SELECT conv_id,
             list(role || ':' || coalesce(md5(text), '')
                  ORDER BY turn_idx, role, coalesce(md5(text), '')) AS l
      FROM t GROUP BY conv_id
    ), sh AS (
      SELECT DISTINCT conv_id,
             unnest(CASE WHEN len(l) >= 3
                    THEN list_transform(range(len(l) - 2),
                         i -> md5(array_to_string(l[i+1:i+3], '|')))
                    ELSE [] END) AS s
      FROM seq
    ), sizes AS (
      SELECT conv_id, count(*) AS sz FROM sh GROUP BY conv_id
    ), inter AS (
      SELECT x.conv_id AS a, y.conv_id AS b, count(*) AS inter
      FROM sh x JOIN sh y ON x.s = y.s AND x.conv_id < y.conv_id
      GROUP BY 1, 2
    )
    SELECT a, b,
           round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6)
             AS jaccard
    FROM inter JOIN sizes sa ON sa.conv_id = a
               JOIN sizes sb ON sb.conv_id = b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
    ORDER BY a, b
    """,
)
def q_conv_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _conv_clones(spark, sf_dir, edit=True)
    return conversations.conversation_shingle_pairs(t, threshold=0.5).orderBy(
        "a", "b"
    )


# ---------------------------------------------------------------------------
# context-window trim — keep each conversation's LAST turns fitting a
# 20-whitespace-token budget (props are 2-token JSON fragments, so the
# filter bites mid-conversation)
# ---------------------------------------------------------------------------
@query(
    "conv_window_trim",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), s AS (
      SELECT conv_id, turn_idx, role,
             CAST(len({SQL_TOKENS.format(col="coalesce(text, '')")})
                  AS BIGINT) AS n_tokens,
             coalesce(md5(text), '') AS d
      FROM t0
    ), r AS (
      SELECT conv_id, turn_idx, role, n_tokens,
             sum(n_tokens) OVER (PARTITION BY conv_id
                 ORDER BY coalesce(turn_idx, -1) DESC,
                          coalesce(role, '') DESC, d DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev
      FROM s
    )
    SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role, n_tokens
    FROM r WHERE rev <= 20 ORDER BY conv_id, turn_idx
    """,
)
def q_conv_window_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.trim_to_context(t, max_tokens=20).orderBy(
        "conv_id", "turn_idx"
    )


# ---------------------------------------------------------------------------
# per-role corpus card over the transcript shape
# ---------------------------------------------------------------------------
@query(
    "conv_role_stats",
    f"""
    WITH t0 AS (
      SELECT user_id AS conv_id, {_ROLE_CASE} AS role, props AS text
      FROM events
    )
    SELECT role,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           CAST(sum(len({SQL_TOKENS.format(col="coalesce(text, '')")}))
                AS BIGINT) AS tokens_total,
           CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS chars_total,
           CAST(CAST(sum(length(coalesce(text, ''))) AS HUGEINT) * 1000000
                // count(*) AS BIGINT) AS avg_turn_chars_micro
    FROM t0 GROUP BY role ORDER BY role
    """,
)
def q_conv_role_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.role_stats(t).orderBy("role")


# ---------------------------------------------------------------------------
# conversation-atomic shard packing (1000-token shards)
# ---------------------------------------------------------------------------
@query(
    "conv_pack_shards",
    f"""
    WITH t0 AS (
      SELECT user_id AS conv_id, props AS text FROM events
    ), c AS (
      SELECT conv_id,
             CAST(sum(len({SQL_TOKENS.format(col="coalesce(text, '')")}))
                  AS BIGINT) AS n_tokens
      FROM t0 GROUP BY conv_id
    ), s AS (
      SELECT conv_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY conv_id) AS cum
      FROM c
    )
    SELECT conv_id, n_tokens,
           CAST((cum - n_tokens) // 1000 AS BIGINT) AS shard_id
    FROM s ORDER BY conv_id
    """,
)
def q_conv_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    out = conversations.pack_conversations(t, budget=1000, num_partitions=8)
    return out.orderBy("conv_id")


# ---------------------------------------------------------------------------
# interval join — events inside each error's 4-hour incident window
# (same user), via the bucketed range-join decomposition
# ---------------------------------------------------------------------------
@query(
    "events_error_context",
    """
    WITH e AS (
      SELECT event_id, user_id, ts FROM events WHERE ts IS NOT NULL
    ), r AS (
      SELECT event_id AS err_id, user_id, ts AS start_ts,
             ts + INTERVAL 4 HOUR AS end_ts
      FROM events WHERE event_type = 'error' AND ts IS NOT NULL
    )
    SELECT r.err_id, CAST(count(*) AS BIGINT) AS n_events
    FROM r JOIN e ON e.user_id = r.user_id
                 AND e.ts >= r.start_ts AND e.ts < r.end_ts
    GROUP BY 1 ORDER BY 1
    """,
)
def q_events_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pts = ev.filter(F.col("ts").isNotNull()).select(
        "event_id", "user_id", "ts"
    )
    rng = ev.filter(
        (F.col("event_type") == "error") & F.col("ts").isNotNull()
    ).select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("end_ts"),
    )
    j = analytics.interval_join(
        pts, rng, keys=("user_id",), bucket_seconds=14400
    )
    return (
        j.groupBy("r_err_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(F.col("r_err_id").alias("err_id"), "n_events")
        .orderBy("err_id")
    )


# ---------------------------------------------------------------------------
# hopping-window (sliding) counts — 2h windows advancing every 30min:
# each event lands in exactly 4 windows; exact integer-microsecond
# window starts on both engines
# ---------------------------------------------------------------------------
@query(
    "events_sliding_counts",
    """
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS eu
      FROM events WHERE ts IS NOT NULL
    ), x AS (
      SELECT event_type,
             unnest([(eu // 1800000000) * 1800000000 - i * 1800000000
                     for i in range(4)]) AS ws
      FROM e
    )
    SELECT event_type,
           make_timestamp(ws) AS window_start,
           make_timestamp(ws + 7200000000) AS window_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM x GROUP BY 1, 2, 3
    ORDER BY event_type, window_start
    """,
)
def q_events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.sliding_counts(
        ev, window_seconds=7200, slide_seconds=1800
    ).orderBy("event_type", "window_start")


# the ONE SQL builder for textstats.quality_score's per-turn feature
# columns (expects CTE columns `text` and tokenized `w`) and scoring
# arithmetic (expects the feature columns) — shared by the
# conv_quality_gate and conv_prep_report oracles so the quality
# formula can never desynchronize between them
_QUALITY_FEAT_COLS_SQL = f"""len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct,
             len(list_filter(w, x -> list_contains([{_STOP_SQL}], lower(x))))
               AS stop_hits,
             len(list_distinct(w)) AS n_distinct,
             len(w) AS n_tok,
             len(text) AS n"""

_QUALITY_Q_SQL = """(CASE WHEN n BETWEEN 50 AND 10000 THEN 250000 ELSE 0 END)
             + (CASE WHEN CAST(floor(punct * 1000000 / greatest(n, 1))
                           AS BIGINT) <= 200000 THEN 250000 ELSE 0 END)
             + CAST(floor(least(CAST(floor(stop_hits * 1000000
                    / greatest(n_tok, 1)) AS BIGINT) * 10, 1000000) / 4.0)
                    AS BIGINT)
             + CAST(floor(CAST(floor(n_distinct * 1000000
                    / greatest(n_tok, 1)) AS BIGINT) / 4.0) AS BIGINT)"""


# ---------------------------------------------------------------------------
# conversation quality gate — the fixture's turn texts are uniform
# short JSON (every conversation would score identically), so every
# 3rd conversation's turns are deterministically repeated 8x on BOTH
# engines: those cross the length band and change distinct ratios,
# making the keep flag provably discriminate
# ---------------------------------------------------------------------------
@query(
    "conv_quality_gate",
    f"""
    WITH t0 AS (
      {{transcript}}
    ), tv AS (
      SELECT conv_id, role,
             CASE WHEN conv_id % 3 = 0
                  THEN repeat(coalesce(text, ''), 8)
                  ELSE coalesce(text, '') END AS text
      FROM t0
    ), toks AS (
      SELECT conv_id, role, text,
             {SQL_TOKENS.format(col="text")} AS w
      FROM tv
    ), feat AS (
      SELECT conv_id, role,
             {_QUALITY_FEAT_COLS_SQL}
      FROM toks
    ), scored AS (
      SELECT conv_id, role,
             {_QUALITY_Q_SQL}
               AS q
      FROM feat
    ), agg AS (
      SELECT conv_id,
             CAST(count(*) AS BIGINT) AS n_turns,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_assistant,
             sum(CASE WHEN role = 'assistant' THEN q END) AS sq
      FROM scored GROUP BY conv_id
    )
    SELECT conv_id, n_turns, n_assistant,
           CAST(sq // n_assistant AS BIGINT)
             AS avg_assistant_quality_micro,
           (n_turns >= 2 AND n_assistant >= 1
            AND sq // n_assistant >= 300000) AS keep
    FROM agg ORDER BY conv_id
    """.replace("{transcript}", "%TRANSCRIPT%").replace(
        "{stop}", "%STOP%"
    ).replace("%TRANSCRIPT%", _TRANSCRIPT_SQL).replace("%STOP%", _STOP_SQL),
)
def q_conv_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    tv = t.withColumn(
        "text",
        F.when(
            F.col("conv_id") % 3 == 0,
            F.expr("repeat(coalesce(text, ''), 8)"),
        ).otherwise(F.coalesce(F.col("text"), F.lit(""))),
    )
    return conversations.conversation_quality_gate(tv).orderBy("conv_id")


# ---------------------------------------------------------------------------
# repeated-turn (retry-artifact) report: turn 1 of every 5th
# conversation is cloned verbatim on BOTH engines, so the repeat
# detector provably fires; everything else reports zero repeats
# ---------------------------------------------------------------------------
@query(
    "conv_repeated_turns",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT * FROM t0
      UNION ALL
      SELECT conv_id, turn_idx, role, text
      FROM t0 WHERE conv_id % 5 = 0 AND turn_idx = 1
    ), s AS (
      SELECT conv_id,
             coalesce(turn_idx, -1) AS i,
             coalesce(role, '') AS r,
             coalesce(md5(text), '') AS d
      FROM t
    ), f AS (
      SELECT conv_id, i, r, d,
             coalesce(r = lag(r) OVER w AND d = lag(d) OVER w, FALSE)
               AS rep
      FROM s WINDOW w AS (PARTITION BY conv_id ORDER BY i, r, d)
    ), g AS (
      SELECT conv_id, rep,
             sum(CASE WHEN rep THEN 0 ELSE 1 END)
               OVER (PARTITION BY conv_id ORDER BY i, r, d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
      FROM f
    ), pr AS (
      SELECT conv_id, run, count(*) AS len
      FROM g GROUP BY 1, 2
    )
    SELECT conv_id,
           CAST(sum(len) AS BIGINT) AS n_turns,
           CAST(sum(len) - count(*) AS BIGINT) AS n_repeat_pairs,
           CAST(max(len) AS BIGINT) AS max_run,
           max(len) > 1 AS has_repeats
    FROM pr GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_repeated_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    dup = t.filter((F.col("conv_id") % 5 == 0) & (F.col("turn_idx") == 1))
    return conversations.repeated_turn_stats(t.unionByName(dup)).orderBy(
        "conv_id"
    )


# ---------------------------------------------------------------------------
# conversation PII exposure report: PII strings are appended to
# deterministic turns on BOTH engines (an email on every 4th
# conversation's early USER turns — exercising the user-turn counter —
# a phone+SSN on every 6th conversation's turn 1, an IP on every 9th
# conversation's turn 2)
# ---------------------------------------------------------------------------
_PII_INJECT_SQL = """coalesce(text, '')
          || CASE WHEN conv_id % 4 = 0 AND role = 'user' AND turn_idx <= 10
                  THEN ' reach me at u' || CAST(conv_id AS VARCHAR)
                       || '@example.com' ELSE '' END
          || CASE WHEN conv_id % 6 = 0 AND turn_idx = 1
                  THEN ' call 555-123-4567 ssn 123-45-6789' ELSE '' END
          || CASE WHEN conv_id % 9 = 0 AND turn_idx = 2
                  THEN ' from 10.1.2.3' ELSE '' END"""


@query(
    "conv_pii_report",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, role, {_PII_INJECT_SQL} AS text FROM t0
    ), c AS (
      SELECT conv_id,
             role = 'user' AS u,
             len(regexp_extract_all(text, '{textstats.EMAIL_RE}')) AS em,
             len(regexp_extract_all(text, '{textstats.PHONE_RE}')) AS ph,
             len(regexp_extract_all(text, '{textstats.SSN_RE}')) AS ss,
             len(regexp_extract_all(text, '{textstats.IP_RE}')) AS ip
      FROM t
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(em) AS BIGINT) AS n_emails,
           CAST(sum(ph) AS BIGINT) AS n_phones,
           CAST(sum(ss) AS BIGINT) AS n_ssns,
           CAST(sum(ip) AS BIGINT) AS n_ips,
           CAST(sum(CASE WHEN em + ph + ss + ip > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pii_turns,
           CAST(sum(CASE WHEN (em + ph + ss + ip > 0) AND u THEN 1
                         ELSE 0 END) AS BIGINT) AS n_pii_user_turns,
           max(em + ph + ss + ip > 0) AS has_pii
    FROM c GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    injected = t.withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                (F.col("conv_id") % 4 == 0)
                & (F.col("role") == "user")
                & (F.col("turn_idx") <= 10),
                F.concat(
                    F.lit(" reach me at u"),
                    F.col("conv_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                (F.col("conv_id") % 6 == 0) & (F.col("turn_idx") == 1),
                F.lit(" call 555-123-4567 ssn 123-45-6789"),
            ).otherwise(F.lit("")),
            F.when(
                (F.col("conv_id") % 9 == 0) & (F.col("turn_idx") == 2),
                F.lit(" from 10.1.2.3"),
            ).otherwise(F.lit("")),
        ),
    )
    return conversations.conversation_pii_report(injected).orderBy("conv_id")


# ---------------------------------------------------------------------------
# log-template mining: varied log lines are SYNTHESIZED from events
# columns identically on both engines (request paths with ids, IPv4s,
# a md5-derived uuid, a hex error code) plus a rare 'panic' family on
# every 499th event_id — so the masking provably collapses variable
# fields and the rare filter provably fires at every SF
# ---------------------------------------------------------------------------
_LOG_LINE_TMPL = """CASE WHEN event_id % 499 = 0 THEN
        'panic in ' || CASE event_id % 3 WHEN 0 THEN 'alpha'
                       WHEN 1 THEN 'beta' ELSE 'gamma' END
        || ' worker crashed'
      ELSE CASE event_type
        WHEN 'view' THEN 'GET /api/item/' || CAST(event_id AS {S})
          || ' status 200 bytes ' || CAST(event_id % 4096 AS {S})
        WHEN 'click' THEN 'POST /api/cart from 10.'
          || CAST(user_id % 200 AS {S}) || '.0.'
          || CAST(event_id % 250 AS {S}) || ' latency '
          || CAST(event_id % 900 AS {S}) || 'ms'
        WHEN 'purchase' THEN 'order '
          || substr(md5(CAST(event_id AS {S})), 1, 8) || '-'
          || substr(md5(CAST(event_id AS {S})), 9, 4) || '-'
          || substr(md5(CAST(event_id AS {S})), 13, 4) || '-'
          || substr(md5(CAST(event_id AS {S})), 17, 4) || '-'
          || substr(md5(CAST(event_id AS {S})), 21, 12)
          || ' total ' || CAST(user_id % 500 AS {S})
        WHEN 'error' THEN 'ERROR code=0x' || {HEX}(event_id % 65536)
          || ' retrying'
        ELSE 'heartbeat seq ' || CAST(event_id AS {S}) END
      END"""
# hex() (Spark) and to_hex() (DuckDB) agree: uppercase, no padding —
# and the value is masked to <HEX> anyway, so only presence matters
_LOG_LINE_SPARK = _LOG_LINE_TMPL.format(S="STRING", HEX="hex")
_LOG_LINE_DUCK = _LOG_LINE_TMPL.format(S="VARCHAR", HEX="to_hex")


def _log_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        F.expr(_LOG_LINE_SPARK).alias("line"), "ts"
    )


_TEMPLATES_ORACLE_CORE = f"""
    WITH lines AS (
      SELECT {_LOG_LINE_DUCK} AS line, ts FROM events
    ), m AS (
      SELECT {analytics.template_masks_sql('line')} AS template, ts
      FROM lines WHERE line IS NOT NULL
    ), c AS (
      SELECT template,
             CAST(count(*) AS BIGINT) AS n_events,
             min(ts) AS first_ts, max(ts) AS last_ts
      FROM m GROUP BY template
    ), tot AS (
      SELECT sum(n_events) AS total FROM c
    ), sh AS (
      SELECT template, n_events,
             CAST(CAST(n_events AS HUGEINT) * 1000000 // total AS BIGINT)
               AS share_micro,
             first_ts, last_ts
      FROM c, tot
    )"""


@query(
    "events_log_templates",
    _TEMPLATES_ORACLE_CORE
    + """
    SELECT * FROM sh ORDER BY template
    """,
)
def q_events_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _log_lines(spark, sf_dir)
    return analytics.log_templates(lines, text_col="line", ts_col="ts").orderBy(
        "template"
    )


@query(
    "events_rare_templates",
    _TEMPLATES_ORACLE_CORE
    + """
    SELECT * FROM sh WHERE share_micro <= 10000 ORDER BY template
    """,
)
def q_events_rare_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _log_lines(spark, sf_dir)
    # share-based rarity (1%) so the same query selects the panic
    # family at sf0.001 and at sf0.1 — an absolute count bar would
    # stop firing as volume grows
    return analytics.rare_templates(
        lines,
        text_col="line",
        ts_col="ts",
        max_count=None,
        max_share_micro=10_000,
    ).orderBy("template")


# ---------------------------------------------------------------------------
# log-template drift between two snapshots: the 'new' snapshot drops
# every 3rd event AND the panic family (vanished), and rewrites every
# 7th surviving line into a circuit-breaker family (new) — so all
# four statuses provably appear
# ---------------------------------------------------------------------------
_DRIFT_NEW_LINE_DUCK = f"""CASE WHEN event_id % 7 = 0
      THEN 'circuit breaker open for service '
           || CAST(user_id % 50 AS VARCHAR)
      ELSE {_LOG_LINE_DUCK} END"""


@query(
    "events_template_drift",
    f"""
    WITH old_lines AS (
      SELECT {_LOG_LINE_DUCK} AS line FROM events
    ), new_lines AS (
      SELECT {_DRIFT_NEW_LINE_DUCK} AS line
      FROM events WHERE event_id % 3 <> 0 AND event_id % 499 <> 0
    ), co AS (
      SELECT {analytics.template_masks_sql('line')} AS template,
             CAST(count(*) AS BIGINT) AS n_old
      FROM old_lines WHERE line IS NOT NULL GROUP BY 1
    ), cn AS (
      SELECT {analytics.template_masks_sql('line')} AS template,
             CAST(count(*) AS BIGINT) AS n_new
      FROM new_lines WHERE line IS NOT NULL GROUP BY 1
    )
    SELECT coalesce(co.template, cn.template) AS template,
           coalesce(n_old, 0) AS n_old,
           coalesce(n_new, 0) AS n_new,
           coalesce(n_new, 0) - coalesce(n_old, 0) AS delta,
           CASE WHEN coalesce(n_old, 0) = 0 THEN 'new'
                WHEN coalesce(n_new, 0) = 0 THEN 'vanished'
                WHEN n_new <> n_old THEN 'changed'
                ELSE 'stable' END AS status,
           CASE WHEN coalesce(n_old, 0) > 0 AND coalesce(n_new, 0) > 0
                THEN CAST(CAST(n_new AS HUGEINT) * 1000000 // n_old
                          AS BIGINT)
                ELSE -1 END AS growth_micro
    FROM co FULL OUTER JOIN cn ON co.template = cn.template
    ORDER BY template
    """,
)
def q_events_template_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    old = _log_lines(spark, sf_dir).select("line")
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_id") % 3 != 0) & (F.col("event_id") % 499 != 0)
    )
    new = ev.select(
        F.when(
            F.col("event_id") % 7 == 0,
            F.concat(
                F.lit("circuit breaker open for service "),
                (F.col("user_id") % 50).cast("string"),
            ),
        )
        .otherwise(F.expr(_LOG_LINE_SPARK))
        .alias("line")
    )
    out = analytics.template_drift(old, new, text_col="line")
    # -1 sentinel for undefined growth (new/vanished): the pandas
    # nullable-int stringification caveat, as conv_context_overflow
    return out.select(
        "template",
        "n_old",
        "n_new",
        "delta",
        "status",
        F.coalesce("growth_micro", F.lit(-1))
        .cast("bigint")
        .alias("growth_micro"),
    ).orderBy("template")


# ---------------------------------------------------------------------------
# state-transition matrices: event-type flow per user and role bigrams
# per conversation
# ---------------------------------------------------------------------------
_TRANSITIONS_ORACLE_TMPL = """
    WITH s AS (
      {SRC}
    ), p AS (
      SELECT coalesce(lag(st) OVER (PARTITION BY k ORDER BY {ORD}),
                      '<START>') AS prev_state,
             st AS state
      FROM s
    ), c AS (
      SELECT prev_state, state, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2
    )
    SELECT prev_state, state, n,
           CAST(CAST(n AS HUGEINT) * 1000000
                // (sum(n) OVER (PARTITION BY prev_state)) AS BIGINT)
             AS out_share_micro
    FROM c ORDER BY prev_state, state
    """


@query(
    "events_type_transitions",
    _TRANSITIONS_ORACLE_TMPL.format(
        SRC="SELECT user_id AS k, event_id AS o,"
        " coalesce(event_type, '') AS st FROM events",
        ORD="o",
    ),
)
def q_events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.transition_counts(
        ev, "user_id", ("event_id",), "event_type"
    ).orderBy("prev_state", "state")


@query(
    "conv_role_transitions",
    _TRANSITIONS_ORACLE_TMPL.format(
        SRC=f"SELECT conv_id AS k, turn_idx AS o, coalesce(role, '') AS st"
        f" FROM ({_TRANSCRIPT_SQL})",
        ORD="o",
    ),
)
def q_conv_role_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return analytics.transition_counts(
        t, "conv_id", ("turn_idx",), "role"
    ).orderBy("prev_state", "state")


# ---------------------------------------------------------------------------
# assistant response latency: the ts-bearing transcript reshape (same
# role mapping as _TRANSCRIPT_SQL, plus the event ts); latencies are
# exact epoch-microsecond differences on both engines
# ---------------------------------------------------------------------------
@query(
    "conv_response_latency",
    f"""
    WITH t AS (
      SELECT user_id AS conv_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1
               AS turn_idx,
             {_ROLE_CASE} AS role,
             ts
      FROM events
    ), f AS (
      SELECT conv_id, role, epoch_us(ts) AS us,
             last_value(CASE WHEN role = 'user' THEN epoch_us(ts) END
                        IGNORE NULLS)
               OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pu
      FROM t
    ), l AS (
      SELECT conv_id,
             CASE WHEN role = 'assistant' AND pu IS NOT NULL
                  THEN us - pu END AS lat
      FROM f
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(count(lat) AS BIGINT) AS n_responses,
           CAST(sum(lat) // count(lat) AS BIGINT) AS avg_latency_us,
           CAST(max(lat) AS BIGINT) AS max_latency_us
    FROM l GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_response_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False, with_ts=True)
    return conversations.response_latency(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# per-conversation language mixture: marker words are appended to
# deterministic turns on BOTH engines (English on conv%3==0, German on
# conv%3==1, raw props stay 'unknown'; a French burst on every 5th
# conversation's turn_idx%4==1 turns makes those conversations mixed)
# ---------------------------------------------------------------------------
_LANG_INJECT_SQL = """coalesce(text, '')
          || CASE WHEN conv_id % 3 = 0 THEN ' the and is of to this'
                  WHEN conv_id % 3 = 1 THEN ' der und ist nicht von zu'
                  ELSE '' END
          || CASE WHEN conv_id % 5 = 0 AND turn_idx % 4 = 1
                  THEN ' le les est dans pour que une des du pas'
                  ELSE '' END"""


@query(
    "conv_lang_mix",
    f"""
    WITH tr AS (
      SELECT conv_id, turn_idx, {_LANG_INJECT_SQL} AS text
      FROM ({_TRANSCRIPT_SQL})
    ), conv_turns AS (
      SELECT conv_id AS doc_id, text FROM tr
    ), lab AS (
      SELECT * FROM ({textstats.lang_id_oracle_sql("conv_turns", "text")})
    ), c AS (
      SELECT doc_id AS conv_id, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM lab GROUP BY 1, 2
    ), r AS (
      SELECT conv_id, lang_pred, n,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY n DESC, lang_pred ASC) AS rk,
             sum(n) OVER (PARTITION BY conv_id) AS n_turns,
             count(*) OVER (PARTITION BY conv_id) AS n_langs
      FROM c
    )
    SELECT conv_id,
           CAST(n_turns AS BIGINT) AS n_turns,
           CAST(n_langs AS BIGINT) AS n_langs,
           lang_pred AS majority_lang,
           CAST(CAST(n AS HUGEINT) * 1000000 // n_turns AS BIGINT)
             AS majority_share_micro,
           n_langs > 1 AS is_mixed
    FROM r WHERE rk = 1 ORDER BY conv_id
    """,
)
def q_conv_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    injected = t.withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("conv_id") % 3 == 0, F.lit(" the and is of to this")
            )
            .when(
                F.col("conv_id") % 3 == 1,
                F.lit(" der und ist nicht von zu"),
            )
            .otherwise(F.lit("")),
            F.when(
                (F.col("conv_id") % 5 == 0) & (F.col("turn_idx") % 4 == 1),
                F.lit(" le les est dans pour que une des du pas"),
            ).otherwise(F.lit("")),
        ),
    )
    return conversations.language_mix(injected).orderBy("conv_id")


# ---------------------------------------------------------------------------
# streaming NEW-template detector: the emitted template SET across
# micro-batches must equal the batch distinct-template set (which
# concrete line first exhibits a template is arrival-order-dependent;
# the template set is not)
# ---------------------------------------------------------------------------
@query(
    "streaming_new_templates",
    f"""
    WITH lines AS (
      SELECT {_LOG_LINE_DUCK} AS line FROM events
    )
    SELECT DISTINCT {analytics.template_masks_sql('line')} AS template
    FROM lines WHERE line IS NOT NULL ORDER BY template
    """,
)
def q_streaming_new_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import streaming_new_templates

    lines = _log_lines(spark, sf_dir)
    out = _drain_two_batch_stream(
        spark,
        lines,
        "line string, ts timestamp",
        lambda s: streaming_new_templates(s, text_col="line"),
    )
    return out.select("template").orderBy("template")


# ---------------------------------------------------------------------------
# KMV distinct sketch: distinct user_id per event_type at k=64 — the
# per-type user populations (hundreds at sf0.01) exceed k, so the
# ESTIMATOR path is exercised, not just the exact-below-k fallback;
# determinism makes the sketch itself oracle-checkable
# ---------------------------------------------------------------------------
@query(
    "events_kmv_distinct",
    """
    WITH d AS (
      SELECT DISTINCT event_type AS g,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL
    ), r AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM d
    ), kk AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS hk
      FROM r WHERE rn <= 64 GROUP BY g
    )
    SELECT g AS event_type, n_sketch,
           CASE WHEN n_sketch < 64 THEN n_sketch
                ELSE CAST(CAST(63 AS HUGEINT) * 1152921504606846976
                          // greatest(hk, 1)
                          AS BIGINT) END AS est_distinct,
           n_sketch < 64 AS is_exact
    FROM kk ORDER BY event_type
    """,
)
def q_events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.kmv_distinct(
        ev, "event_type", "user_id", k=64
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# rolling active users (DAU / trailing-7d) over events
# ---------------------------------------------------------------------------
@query(
    "events_active_users",
    """
    WITH daily AS (
      SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM daily GROUP BY d
    ), ends AS (
      SELECT DISTINCT u, d + CAST(x AS INTEGER) AS e
      FROM daily CROSS JOIN range(7) AS t(x)
    ), rolling AS (
      SELECT e, CAST(count(*) AS BIGINT) AS rolling_au
      FROM ends GROUP BY e
    )
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau,
           rolling.rolling_au
    FROM dau JOIN rolling ON dau.d = rolling.e
    ORDER BY day
    """,
)
def q_events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = analytics.active_users(ev, window_days=7)
    # DATE renders differently across the compare harness's pandas
    # paths (date vs midnight timestamp) — pin the ISO string form,
    # as the cohort oracle does
    return out.withColumn(
        "day", F.date_format("day", "yyyy-MM-dd")
    ).orderBy("day")


# ---------------------------------------------------------------------------
# assistant refusal report: refusal surface forms are appended to
# deterministic turns on BOTH engines — assistant turns on conv%4==1
# (counted) and a turn_idx==3 turn of ANY role on conv%11==0 (counted
# only when that turn happens to be an assistant turn — pinning the
# role gate)
# ---------------------------------------------------------------------------
# the operator's regex, SQL-escaped for the DuckDB literal (the
# quote class ['’] carries a single quote)
REFUSAL_SQL_RE = conversations.REFUSAL_RE.replace("'", "''")
IDENTITY_SQL_RE = conversations.IDENTITY_RE.replace("'", "''")


# ---------------------------------------------------------------------------
# per-conversation identity-statement report: "As an AI ..." phrases
# injected on deterministic assistant turns (and one USER turn, which
# must NOT count — the role gate pin) on both engines
# ---------------------------------------------------------------------------
@query(
    "conv_identity_leaks",
    f"""
    WITH t0 AS (
      {{transcript}}
    ), t AS (
      SELECT conv_id, role,
             coalesce(text, '')
             || CASE WHEN conv_id % 4 = 3 AND role = 'assistant'
                          AND turn_idx % 5 = 1
                THEN ' As an AI language model, I cannot browse.'
                ELSE '' END
             || CASE WHEN conv_id % 9 = 0 AND turn_idx = 2
                THEN ' i was trained by someone' ELSE '' END AS text
      FROM t0
    ), c AS (
      SELECT conv_id,
             CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS a,
             CASE WHEN role = 'assistant'
                       AND regexp_matches(text, '{IDENTITY_SQL_RE}')
                  THEN 1 ELSE 0 END AS i
      FROM t
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(a) AS BIGINT) AS n_assistant,
           CAST(sum(i) AS BIGINT) AS n_identity,
           CAST(CAST(sum(i) AS HUGEINT) * 1000000 // nullif(sum(a), 0)
                AS BIGINT) AS identity_rate_micro,
           sum(i) > 0 AS has_identity
    FROM c GROUP BY conv_id ORDER BY conv_id
    """.replace("{transcript}", _TRANSCRIPT_SQL),
)
def q_conv_identity_leaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    injected = t.withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                (F.col("conv_id") % 4 == 3)
                & (F.col("role") == "assistant")
                & (F.col("turn_idx") % 5 == 1),
                F.lit(" As an AI language model, I cannot browse."),
            ).otherwise(F.lit("")),
            F.when(
                (F.col("conv_id") % 9 == 0) & (F.col("turn_idx") == 2),
                F.lit(" i was trained by someone"),
            ).otherwise(F.lit("")),
        ),
    )
    return conversations.identity_leak_stats(injected).orderBy("conv_id")


_REFUSAL_INJECT_SQL = """coalesce(text, '')
          || CASE WHEN conv_id % 4 = 1 AND role = 'assistant'
                       AND turn_idx % 6 = 2
                  THEN ' I cannot help with that request.' ELSE '' END
          || CASE WHEN conv_id % 11 = 0 AND turn_idx = 3
                  THEN ' i won''t be able to do that' ELSE '' END"""


@query(
    "conv_refusal_stats",
    f"""
    WITH t AS (
      SELECT conv_id, role, {_REFUSAL_INJECT_SQL} AS text
      FROM ({_TRANSCRIPT_SQL})
    ), c AS (
      SELECT conv_id,
             CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS a,
             CASE WHEN role = 'assistant'
                       AND regexp_matches(text,
                           '{REFUSAL_SQL_RE}')
                  THEN 1 ELSE 0 END AS r
      FROM t
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(a) AS BIGINT) AS n_assistant,
           CAST(sum(r) AS BIGINT) AS n_refusals,
           CAST(CAST(sum(r) AS HUGEINT) * 1000000 // sum(a) AS BIGINT)
             AS refusal_rate_micro,
           sum(r) > 0 AS has_refusal
    FROM c GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_refusal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    injected = t.withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                (F.col("conv_id") % 4 == 1)
                & (F.col("role") == "assistant")
                & (F.col("turn_idx") % 6 == 2),
                F.lit(" I cannot help with that request."),
            ).otherwise(F.lit("")),
            F.when(
                (F.col("conv_id") % 11 == 0) & (F.col("turn_idx") == 3),
                F.lit(" i won't be able to do that"),
            ).otherwise(F.lit("")),
        ),
    )
    return conversations.refusal_stats(injected).orderBy("conv_id")


# ---------------------------------------------------------------------------
# per-tool usage report: the transcript's tool column is synthesized
# identically on both engines (tool turns get 'tool_<turn_idx%5>',
# other roles NULL = no tool call)
# ---------------------------------------------------------------------------
@query(
    "conv_tool_stats",
    f"""
    WITH t AS (
      SELECT conv_id,
             CASE WHEN role = 'tool'
                  THEN 'tool_' || CAST(turn_idx % 5 AS VARCHAR) END
               AS tool
      FROM ({_TRANSCRIPT_SQL})
    ), pc AS (
      SELECT tool, conv_id, CAST(count(*) AS BIGINT) AS n
      FROM t WHERE tool IS NOT NULL GROUP BY 1, 2
    ), pt AS (
      SELECT tool, CAST(sum(n) AS BIGINT) AS n_calls,
             CAST(count(*) AS BIGINT) AS n_convs
      FROM pc GROUP BY tool
    ), tot AS (SELECT sum(n_calls) AS total FROM pt)
    SELECT tool, n_calls,
           CAST(CAST(n_calls AS HUGEINT) * 1000000 // total AS BIGINT)
             AS share_micro,
           n_convs,
           CAST(CAST(n_calls AS HUGEINT) * 1000000 // n_convs AS BIGINT)
             AS calls_per_conv_micro
    FROM pt, tot ORDER BY tool
    """,
)
def q_conv_tool_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    with_tool = t.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.concat(F.lit("tool_"), (F.col("turn_idx") % 5).cast("string")),
        ),
    )
    return conversations.tool_stats(with_tool).orderBy("tool")


# ---------------------------------------------------------------------------
# tool-call chain report: ordered per-conversation tool sequences
# folded to 'a>b>c' chains, counted across conversations (same
# synthesized tool column as conv_tool_stats)
# ---------------------------------------------------------------------------
@query(
    "conv_tool_chains",
    f"""
    WITH t AS (
      SELECT conv_id, turn_idx,
             CASE WHEN role = 'tool'
                  THEN 'tool_' || CAST(turn_idx % 5 AS VARCHAR) END
               AS tool
      FROM ({_TRANSCRIPT_SQL})
    ), c AS (
      SELECT conv_id,
             string_agg(tool, '>' ORDER BY turn_idx, tool) AS chain,
             CAST(count(*) AS BIGINT) AS chain_len
      FROM t WHERE tool IS NOT NULL GROUP BY conv_id
    ), pc AS (
      SELECT chain, chain_len,
             CAST(count(*) AS BIGINT) AS n_convs
      FROM c GROUP BY chain, chain_len
    ), tot AS (SELECT count(*) AS total FROM c)
    SELECT chain, chain_len, n_convs,
           CAST(CAST(n_convs AS HUGEINT) * 1000000 // total AS BIGINT)
             AS share_micro
    FROM pc, tot ORDER BY chain, chain_len
    """,
)
def q_conv_tool_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    with_tool = t.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.concat(F.lit("tool_"), (F.col("turn_idx") % 5).cast("string")),
        ),
    )
    return conversations.tool_chains(with_tool).orderBy("chain", "chain_len")


# ---------------------------------------------------------------------------
# cross-conversation boilerplate-response report: two canned assistant
# replies are INJECTED (text replaced, identical on both engines) on
# deterministic (conv, turn) slots so exact cross-conv repeats provably
# exist; natural props repeats (if any) are computed identically too
# ---------------------------------------------------------------------------
_BOILERPLATE_CASE = """CASE
        WHEN role = 'assistant' AND conv_id % 3 = 2 AND turn_idx % 4 = 2
        THEN 'I''m sorry, but I can''t help with that request.'
        WHEN role = 'assistant' AND conv_id % 5 = 1 AND turn_idx % 6 = 3
        THEN 'Here is a summary of the results you asked for.'
        ELSE text END"""


def _inject_boilerplate(t: DataFrame) -> DataFrame:
    """DataFrame twin of _BOILERPLATE_CASE (one Spark-side copy shared
    by the repeated-response report and its dedup rewrite, so the two
    fixtures cannot desynchronize)."""
    return t.withColumn(
        "text",
        F.when(
            (F.col("role") == "assistant")
            & (F.col("conv_id") % 3 == 2)
            & (F.col("turn_idx") % 4 == 2),
            F.lit("I'm sorry, but I can't help with that request."),
        )
        .when(
            (F.col("role") == "assistant")
            & (F.col("conv_id") % 5 == 1)
            & (F.col("turn_idx") % 6 == 3),
            F.lit("Here is a summary of the results you asked for."),
        )
        .otherwise(F.col("text")),
    )


@query(
    "conv_repeated_responses",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, role, {_BOILERPLATE_CASE} AS text FROM t0
    ), a AS (
      SELECT md5(text) AS text_md5,
             substring(text, 1, 60) AS snip,
             conv_id
      FROM t WHERE role = 'assistant' AND text IS NOT NULL
    )
    SELECT text_md5,
           min(snip) AS snippet,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           min(conv_id) AS first_conv
    FROM a GROUP BY text_md5
    HAVING count(DISTINCT conv_id) >= 2
    ORDER BY text_md5
    """,
)
def q_conv_repeated_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    injected = _inject_boilerplate(t)
    return conversations.repeated_response_report(injected).orderBy("text_md5")


# ---------------------------------------------------------------------------
# conversation flow-shape dictionary: first-12 role initials per
# conversation (+ '+' when deeper), counted across conversations
# ---------------------------------------------------------------------------
@query(
    "conv_flow_shapes",
    f"""
    WITH t AS (
      {_TRANSCRIPT_SQL}
    ), r AS (
      SELECT conv_id,
             coalesce(lower(substr(role, 1, 1)), '?') AS x,
             row_number() OVER (
               PARTITION BY conv_id
               ORDER BY coalesce(turn_idx, -1), coalesce(role, '')) AS rn,
             count(*) OVER (PARTITION BY conv_id) AS nt
      FROM t
    ), f AS (
      SELECT conv_id,
             coalesce(string_agg(CASE WHEN rn <= 12 THEN x END, ''
                                 ORDER BY rn), '')
               || CASE WHEN max(nt) > 12 THEN '+' ELSE '' END AS flow
      FROM r GROUP BY conv_id
    ), pf AS (
      SELECT flow, CAST(count(*) AS BIGINT) AS n_convs
      FROM f GROUP BY flow
    ), tot AS (SELECT sum(n_convs) AS total FROM pf)
    SELECT flow, n_convs,
           CAST(CAST(n_convs AS HUGEINT) * 1000000 // total AS BIGINT)
             AS share_micro
    FROM pf, tot ORDER BY flow
    """,
)
def q_conv_flow_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.flow_shapes(t, max_depth=12).orderBy("flow")


# ---------------------------------------------------------------------------
# rewrite twin of conv_repeated_responses: keep the FIRST occurrence
# of each exact assistant text, drop later repeats (same boilerplate
# injection so cross-conversation repeats provably exist)
# ---------------------------------------------------------------------------
@query(
    "conv_response_dedup",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, turn_idx, role, {_BOILERPLATE_CASE} AS text FROM t0
    ), a AS (
      SELECT conv_id, turn_idx, role,
             row_number() OVER (
               PARTITION BY md5(text)
               ORDER BY conv_id, coalesce(turn_idx, -1),
                        coalesce(role, '')) AS rn
      FROM t WHERE role = 'assistant' AND text IS NOT NULL
    )
    SELECT conv_id, turn_idx, role FROM a WHERE rn = 1
    UNION ALL
    SELECT conv_id, turn_idx, role FROM t
    WHERE role IS DISTINCT FROM 'assistant' OR text IS NULL
    ORDER BY conv_id, turn_idx, role
    """,
)
def q_conv_response_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    injected = _inject_boilerplate(t)
    return conversations.drop_repeated_responses(injected).orderBy(
        "conv_id", "turn_idx", "role"
    )


# ---------------------------------------------------------------------------
# turn-position profile: per (role, depth-decile) token stats
# ---------------------------------------------------------------------------
@query(
    "conv_position_stats",
    f"""
    WITH t AS (
      {_TRANSCRIPT_SQL}
    ), c AS (
      SELECT coalesce(role, '') AS role,
             coalesce(len({SQL_TOKENS.format(col="text")}), 0) AS n,
             row_number() OVER (
               PARTITION BY conv_id
               ORDER BY coalesce(turn_idx, -1), coalesce(role, ''),
                        coalesce(md5(text), '')) - 1 AS rn,
             count(*) OVER (PARTITION BY conv_id) AS nt
      FROM t
    )
    SELECT role, CAST(rn * 10 // nt AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(CAST(sum(n) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
             AS mean_tokens_micro
    FROM c GROUP BY role, bucket ORDER BY role, bucket
    """,
)
def q_conv_position_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.turn_position_stats(t, n_buckets=10).orderBy(
        "role", "bucket"
    )


# ---------------------------------------------------------------------------
# context-budget overflow card: running token total per conversation
# vs a 130-token budget (fixture conv totals span ~98-176, so both
# fits=true and overflow rows exist at every SF)
# ---------------------------------------------------------------------------
_OVERFLOW_TOKENS = f"coalesce(len({SQL_TOKENS.format(col='text')}), 0)"


@query(
    "conv_context_overflow",
    f"""
    WITH t AS (
      {_TRANSCRIPT_SQL}
    ), c AS (
      SELECT conv_id, turn_idx AS idx,
             {_OVERFLOW_TOKENS} AS n,
             sum({_OVERFLOW_TOKENS}) OVER (
               PARTITION BY conv_id
               ORDER BY turn_idx, coalesce(role, ''),
                        coalesce(md5(text), '')
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           coalesce(min(CASE WHEN cum > 130 THEN idx END), -1)
             AS first_overflow_idx,
           CAST(sum(CASE WHEN cum > 130 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_turns_over,
           max(CASE WHEN cum > 130 THEN 1 ELSE 0 END) = 0 AS fits
    FROM c GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_context_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    out = conversations.context_overflow_report(t, max_tokens=130)
    # the operator reports NULL for fits-entirely conversations; the
    # driver compare stringifies pandas nullable ints as floats, so
    # the registry surface pins a -1 sentinel on both engines
    return out.select(
        "conv_id",
        "n_turns",
        "total_tokens",
        F.coalesce("first_overflow_idx", F.lit(-1))
        .cast("bigint")
        .alias("first_overflow_idx"),
        "n_turns_over",
        "fits",
    ).orderBy("conv_id")


# ---------------------------------------------------------------------------
# composed conversation-prep pipeline: all four gates provably fire —
# quality boost (x8 repeat) on conv%3==0, PII on conv%6==0 turn 1,
# refusal on conv%4==1 assistant turns, and whole-conversation clones
# (conv_id + 10^6) of every 7th conversation AFTER injection so the
# clone is an exact content duplicate and dedup drops it
# ---------------------------------------------------------------------------
_PREP_INJECT_SQL = """CASE WHEN conv_id % 3 = 0
                  THEN repeat(coalesce(text, ''), 8)
                  ELSE coalesce(text, '') END
          || CASE WHEN conv_id % 6 = 0 AND turn_idx = 1
                  THEN ' call 555-123-4567 ssn 123-45-6789' ELSE '' END
          || CASE WHEN conv_id % 4 = 1 AND role = 'assistant'
                       AND turn_idx % 6 = 2
                  THEN ' I cannot help with that request.' ELSE '' END"""


@query(
    "conv_prep_report",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), inj AS (
      SELECT conv_id, turn_idx, role, {_PREP_INJECT_SQL} AS text
      FROM t0
    ), t AS (
      SELECT * FROM inj
      UNION ALL
      SELECT conv_id + 1000000, turn_idx, role, text
      FROM inj WHERE conv_id % 7 = 0
    ), toks AS (
      SELECT conv_id, turn_idx, role, text,
             {SQL_TOKENS.format(col="text")} AS w
      FROM t
    ), feat AS (
      SELECT conv_id, turn_idx, role, text,
             {_QUALITY_FEAT_COLS_SQL}
      FROM toks
    ), scored AS (
      SELECT conv_id,
             coalesce(turn_idx, -1) AS i,
             coalesce(role, '') AS r,
             md5(text) AS d,
             CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS a,
             {_QUALITY_Q_SQL}
               AS q,
             CASE WHEN len(regexp_extract_all(text, '{textstats.EMAIL_RE}'))
                       + len(regexp_extract_all(text, '{textstats.PHONE_RE}'))
                       + len(regexp_extract_all(text, '{textstats.SSN_RE}'))
                       + len(regexp_extract_all(text, '{textstats.IP_RE}'))
                       > 0 THEN 1 ELSE 0 END AS pii,
             CASE WHEN role = 'assistant'
                       AND regexp_matches(text, '{REFUSAL_SQL_RE}')
                  THEN 1 ELSE 0 END AS ref
      FROM feat
    ), agg AS (
      SELECT conv_id,
             CAST(count(*) AS BIGINT) AS n_turns,
             CAST(sum(a) AS BIGINT) AS n_assistant,
             sum(CASE WHEN a = 1 THEN q END) AS sq,
             max(pii) AS pii,
             max(ref) AS ref,
             md5(string_agg(r || ':' || d, '|' ORDER BY i, r, d))
               AS conv_md5
      FROM scored GROUP BY conv_id
    ), ddp AS (
      SELECT *, row_number() OVER (PARTITION BY conv_md5
                                   ORDER BY conv_id) AS rn
      FROM agg
    )
    SELECT conv_id, n_turns, n_assistant,
           CAST(sq // n_assistant AS BIGINT)
             AS avg_assistant_quality_micro,
           rn = 1 AS keep_dedup,
           (n_turns >= 2 AND n_assistant >= 1
            AND sq // n_assistant >= 300000) AS keep_quality,
           pii = 1 AS has_pii,
           ref = 1 AS has_refusal,
           (rn = 1 AND n_turns >= 2 AND n_assistant >= 1
            AND sq // n_assistant >= 300000
            AND pii = 0 AND ref = 0) AS keep
    FROM ddp ORDER BY conv_id
    """,
)
def q_conv_prep_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    inj = t.withColumn(
        "text",
        F.concat(
            F.when(
                F.col("conv_id") % 3 == 0,
                F.expr("repeat(coalesce(text, ''), 8)"),
            ).otherwise(F.coalesce(F.col("text"), F.lit(""))),
            F.when(
                (F.col("conv_id") % 6 == 0) & (F.col("turn_idx") == 1),
                F.lit(" call 555-123-4567 ssn 123-45-6789"),
            ).otherwise(F.lit("")),
            F.when(
                (F.col("conv_id") % 4 == 1)
                & (F.col("role") == "assistant")
                & (F.col("turn_idx") % 6 == 2),
                F.lit(" I cannot help with that request."),
            ).otherwise(F.lit("")),
        ),
    )
    dup = inj.filter(F.col("conv_id") % 7 == 0).withColumn(
        "conv_id", F.col("conv_id") + 1_000_000
    )
    return conversations.conversation_prep(inj.unionByName(dup)).orderBy(
        "conv_id"
    )


# ---------------------------------------------------------------------------
# hopping-window DISTINCT users per type (sliding uniques, 2h/30min —
# same window alignment as events_sliding_counts, distinct core)
# ---------------------------------------------------------------------------
@query(
    "events_sliding_distinct",
    """
    WITH e AS (
      SELECT event_type, user_id, epoch_us(ts) AS eu
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), w AS (
      SELECT DISTINCT event_type, user_id, ws
      FROM (
        SELECT event_type, user_id,
               unnest([(eu // 1800000000) * 1800000000 - i * 1800000000
                       for i in range(4)]) AS ws
        FROM e
      )
    )
    SELECT event_type,
           make_timestamp(ws) AS window_start,
           make_timestamp(ws + 7200000000) AS window_end,
           CAST(count(*) AS BIGINT) AS n_distinct
    FROM w GROUP BY 1, 2, 3
    ORDER BY event_type, window_start
    """,
)
def q_events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.sliding_distinct(
        ev,
        entity_col="user_id",
        key_cols=("event_type",),
        window_seconds=7200,
        slide_seconds=1800,
    ).orderBy("event_type", "window_start")


# ---------------------------------------------------------------------------
# per-source distinctive terms (exact integer tf-idf top-k)
# ---------------------------------------------------------------------------
@query(
    "corpus_distinctive_terms",
    f"""
    WITH toks0 AS (
      SELECT source, doc_id,
             {SQL_TOKENS.format(col="lower(coalesce(text, ''))")} AS w
      FROM documents WHERE doc_id IS NOT NULL
    ), toks AS (
      SELECT source, doc_id, t AS term
      FROM (SELECT source, doc_id, unnest(w) AS t FROM toks0)
    ), nd AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
      FROM documents WHERE doc_id IS NOT NULL
    ), dfq AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
      FROM toks GROUP BY term
    ), idf AS (
      SELECT term, doc_freq,
             CAST(CAST(n AS HUGEINT) * 1000000 // doc_freq AS BIGINT)
               AS idf_micro
      FROM dfq, nd
    ), tf AS (
      SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ), s AS (
      SELECT tf.source, tf.term, tf.tf, idf.doc_freq, idf.idf_micro,
             CAST(CAST(tf.tf AS HUGEINT) * idf.idf_micro AS BIGINT)
               AS score
      FROM tf JOIN idf USING (term)
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, term) AS rn
      FROM s
    )
    SELECT source, term, tf, doc_freq, idf_micro, score
    FROM r WHERE rn <= 5 ORDER BY source, score DESC, term
    """,
)
def q_corpus_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.distinctive_terms(docs, top_k=5).orderBy(
        "source", F.col("score").desc(), "term"
    )


# ---------------------------------------------------------------------------
# lexical diversity (type/token ratio + hapax share, scan-side)
# ---------------------------------------------------------------------------
@query(
    "text_lexical_diversity",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_sort(list_transform(
               {SQL_TOKENS.format(col="coalesce(text, '')")},
               x -> lower(x))) AS s
      FROM documents
    ), f AS (
      SELECT doc_id, len(s) AS n_tokens, len(list_distinct(s)) AS n_types,
             CASE WHEN len(s) = 0 THEN 0 ELSE
               len([i for i in range(1, len(s)+1)
                    if (i = 1 OR s[i] <> s[i-1])
                       AND (i = len(s) OR s[i] <> s[i+1])])
             END AS n_hapax
      FROM toks
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(CASE WHEN n_tokens = 0 THEN 0
                ELSE n_types * 1000000 // n_tokens END AS BIGINT) AS ttr_micro,
           CAST(n_hapax AS BIGINT) AS n_hapax,
           CAST(CASE WHEN n_types = 0 THEN 0
                ELSE n_hapax * 1000000 // n_types END AS BIGINT)
             AS hapax_ratio_micro
    FROM f ORDER BY doc_id
    """,
)
def q_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.lexical_diversity(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS local sampling; every 7th doc keeps the
# fixture row count bounded at sf0.01 — the operator itself is scan-side)
# ---------------------------------------------------------------------------
_WINNOW_K, _WINNOW_W = 8, 10


@query(
    "text_winnow_fingerprints",
    f"""
    WITH g AS (
      SELECT doc_id, coalesce(text, '') AS t,
             greatest(length(coalesce(text, '')) - {_WINNOW_K} + 1, 0) AS ng
      FROM documents WHERE doc_id % 7 = 0
    ), hp AS (
      SELECT doc_id, ng,
             CASE WHEN ng = 0 THEN CAST([] AS STRUCT(fp VARCHAR, pos BIGINT)[])
             ELSE [ {{'fp': md5(substr(t, i, {_WINNOW_K})),
                      'pos': CAST(i AS BIGINT)}}
                    for i in range(1, ng+1) ]
             END AS hp
      FROM g
    ), sel AS (
      SELECT doc_id,
             CASE WHEN ng = 0 THEN CAST([] AS STRUCT(fp VARCHAR, pos BIGINT)[])
             ELSE [ list_aggregate(hp[s : least(s + {_WINNOW_W} - 1, ng)], 'min')
                    for s in range(1, greatest(ng - {_WINNOW_W} + 1,
                                               least(ng, 1)) + 1) ]
             END AS sels
      FROM hp
    )
    SELECT DISTINCT doc_id, u.pos AS pos, u.fp AS fp
    FROM (SELECT doc_id, unnest(sels) AS u FROM sel)
    ORDER BY doc_id, pos
    """,
)
def q_text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    return textstats.winnow_fingerprints(
        docs, k=_WINNOW_K, w=_WINNOW_W
    ).orderBy("doc_id", "pos")


# ---------------------------------------------------------------------------
# bigram collocations by exact integer PMI-lift
# ---------------------------------------------------------------------------
@query(
    "corpus_collocations",
    f"""
    WITH toks AS (
      SELECT {SQL_TOKENS.format(col="lower(coalesce(text, ''))")} AS w
      FROM documents
    ), bi AS (
      SELECT w[i+1] AS w1, w[i+2] AS w2
      FROM (SELECT w, unnest(range(len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2)
    ), pc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_count
      FROM bi GROUP BY 1, 2 HAVING count(*) >= 5
    ), uni AS (
      SELECT t AS term, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(w) AS t FROM toks) GROUP BY 1
    ), nbi AS (SELECT CAST(count(*) AS BIGINT) AS nbi FROM bi)
    SELECT pc.w1, pc.w2, pc.pair_count, u1.c AS c1, u2.c AS c2,
           CAST(CAST(nbi.nbi AS HUGEINT) * pc.pair_count * 1000000
                // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS lift_micro
    FROM pc JOIN uni u1 ON pc.w1 = u1.term
            JOIN uni u2 ON pc.w2 = u2.term, nbi
    ORDER BY lift_micro DESC, w1, w2 LIMIT 40
    """,
)
def q_corpus_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.collocations(docs, min_count=5, top_k=40)


# ---------------------------------------------------------------------------
# cross-source duplication matrix: overlap is INJECTED on both engines
# (every 4th doc mirrored verbatim into a mirror_{id%3} source) — the
# natural fixture has none, and the query must provably count
# ---------------------------------------------------------------------------
@query(
    "corpus_cross_source_dups",
    """
    WITH t AS (
      SELECT text, source FROM documents
      UNION ALL
      SELECT text, 'mirror_' || CAST(doc_id % 3 AS VARCHAR)
      FROM documents WHERE doc_id % 4 = 0
    ), d AS (
      SELECT DISTINCT md5(coalesce(text, '')) AS dg, source
      FROM t WHERE source IS NOT NULL
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM d a JOIN d b ON a.dg = b.dg AND a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_corpus_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    inj = docs.unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text",
            "lang",
            F.concat(
                F.lit("mirror_"), (F.col("doc_id") % 3).cast("string")
            ).alias("source"),
            "n_chars",
        )
    )
    return corpus.cross_source_dups(inj).orderBy("source_a", "source_b")


# ---------------------------------------------------------------------------
# per-tool response-latency percentiles: response_latency_turns (the
# per-turn form of conv_response_latency, same window core) composed
# into grouped_quantiles; the assistant turn's tool is synthesized
# deterministically on both engines (tool_{turn_idx%3})
# ---------------------------------------------------------------------------
@query(
    "conv_latency_quantiles",
    f"""
    WITH f AS (
      SELECT conv_id, turn_idx, role, epoch_us(ts) AS us,
             last_value(CASE WHEN role = 'user' THEN epoch_us(ts) END
                        IGNORE NULLS)
               OVER (PARTITION BY conv_id ORDER BY turn_idx, ts, role
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pu
      FROM (SELECT user_id AS conv_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY event_id) - 1 AS turn_idx,
                   {_ROLE_CASE} AS role, ts
            FROM events)
    ), l AS (
      SELECT 'tool_' || CAST(turn_idx % 3 AS VARCHAR) AS tool,
             CAST(us - pu AS BIGINT) AS latency_us
      FROM f WHERE role = 'assistant' AND pu IS NOT NULL
             AND us IS NOT NULL
    ), r AS (
      SELECT tool, latency_us,
             row_number() OVER (PARTITION BY tool ORDER BY latency_us) AS rn,
             count(*) OVER (PARTITION BY tool) AS n
      FROM l
    ), qs AS (SELECT unnest([500000, 950000, 990000]) AS q_micro)
    SELECT r.tool, CAST(q.q_micro AS BIGINT) AS q_micro, r.n,
           r.latency_us AS q_value
    FROM r CROSS JOIN qs q
    WHERE r.rn = greatest(1, (q.q_micro * r.n + 999999) // 1000000)
    ORDER BY tool, q_micro
    """,
)
def q_conv_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False, with_ts=True)
    with_tool = t.withColumn(
        "tool",
        F.when(
            F.col("role") == "assistant",
            F.concat(F.lit("tool_"), (F.col("turn_idx") % 3).cast("string")),
        ),
    )
    lat = conversations.response_latency_turns(with_tool, keep_cols=("tool",))
    return analytics.grouped_quantiles(
        lat, "tool", "latency_us", (500_000, 950_000, 990_000)
    ).orderBy("tool", "q_micro")


# ---------------------------------------------------------------------------
# shared-prefix report: partial clones are INJECTED on both engines
# (every 5th conversation re-ingested under conv_id + 10^6 with every
# turn from idx 2 on rewritten) so shared-prefix detection provably
# fires at depth 2; natural first-turn sharing counts too
# ---------------------------------------------------------------------------
@query(
    "conv_prefix_report",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT * FROM t0
      UNION ALL
      SELECT conv_id + 1000000, turn_idx, role,
             CASE WHEN turn_idx >= 2 THEN text || '::VARIANT' ELSE text END
      FROM t0 WHERE conv_id % 5 = 0
    ), seq AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
             list(role || ':' || coalesce(md5(text), '')
                  ORDER BY turn_idx, role, coalesce(md5(text), '')) AS items
      FROM t GROUP BY conv_id
    ), pref AS (
      SELECT conv_id, u.depth, u.sig
      FROM (SELECT conv_id,
                   unnest([{{'depth': CAST(i AS BIGINT),
                            'sig': md5(array_to_string(items[1:i], '|'))}}
                           for i in range(1, least(n_turns, 64) + 1)]) AS u
            FROM seq)
    ), cnt AS (
      SELECT depth, sig, CAST(count(*) AS BIGINT) AS cnt
      FROM pref GROUP BY 1, 2 HAVING count(*) >= 2
    ), best AS (
      SELECT p.conv_id, max(p.depth) AS shared_depth,
             max_by(c.cnt, p.depth) AS share_count
      FROM pref p JOIN cnt c USING (depth, sig) GROUP BY 1
    )
    SELECT s.conv_id, s.n_turns,
           CAST(coalesce(b.shared_depth, 0) AS BIGINT) AS shared_depth,
           CAST(coalesce(b.share_count, 0) AS BIGINT) AS share_count
    FROM seq s LEFT JOIN best b USING (conv_id) ORDER BY conv_id
    """,
)
def q_conv_prefix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    c = (
        t.filter(F.col("conv_id") % 5 == 0)
        .withColumn("conv_id", F.col("conv_id") + F.lit(1_000_000))
        .withColumn(
            "text",
            F.when(
                F.col("turn_idx") >= 2,
                F.concat(F.col("text"), F.lit("::VARIANT")),
            ).otherwise(F.col("text")),
        )
    )
    return conversations.prefix_report(t.unionByName(c)).orderBy("conv_id")


# ---------------------------------------------------------------------------
# DPO preference-pair mining: every 4th conversation is cloned under
# conv_id + 10^6 with turns >= 3 rewritten — the clone shares the
# depth-3 prefix with its original and diverges at position 4; the
# pair is emitted only where that divergent turn is an assistant turn
# on both sides (same role layout by construction)
# ---------------------------------------------------------------------------
@query(
    "conv_preference_pairs",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT * FROM t0
      UNION ALL
      SELECT conv_id + 1000000, turn_idx, role,
             CASE WHEN turn_idx >= 3 THEN text || '::ALT' ELSE text END
      FROM t0 WHERE conv_id % 4 = 0
    ), s0 AS (
      SELECT conv_id, coalesce(turn_idx, -1) AS i,
             coalesce(role, '') AS r,
             coalesce(md5(text), '') AS d
      FROM t
    ), seq AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
             list(r || ':' || d ORDER BY i, r, d) AS items,
             list({{'i': i, 'r': r, 'd': d}} ORDER BY i, r, d) AS sq
      FROM s0 GROUP BY conv_id
    ), pref AS (
      SELECT conv_id,
             u.depth AS depth, u.sig AS sig,
             sq[u.depth + 1].i AS nidx,
             sq[u.depth + 1].r AS nrole,
             sq[u.depth + 1].d AS nd
      FROM (SELECT conv_id, sq,
                   unnest([{{'depth': CAST(i AS BIGINT),
                            'sig': md5(array_to_string(items[1:i], '|'))}}
                           for i in range(1, least(n_turns - 1, 64) + 1)])
                     AS u
            FROM seq)
    ), ok AS (
      SELECT depth, sig FROM pref GROUP BY 1, 2
      HAVING count(*) >= 2 AND count(*) <= 50
    ), capped AS (
      SELECT p.* FROM pref p JOIN ok USING (depth, sig)
    ), pairs AS (
      SELECT l.conv_id AS conv_a, r.conv_id AS conv_b,
             l.depth AS depth,
             l.nidx AS a_idx, l.nrole AS a_role, l.nd AS a_d,
             r.nidx AS b_idx, r.nrole AS b_role, r.nd AS b_d
      FROM capped l JOIN capped r
        ON l.depth = r.depth AND l.sig = r.sig
       AND l.conv_id < r.conv_id
    ), best AS (
      SELECT conv_a, conv_b,
             max(depth) AS prefix_depth,
             max_by(a_idx, depth) AS a_turn_idx,
             max_by(b_idx, depth) AS b_turn_idx,
             max_by(a_role, depth) AS a_role,
             max_by(b_role, depth) AS b_role,
             max_by(a_d, depth) AS a_d,
             max_by(b_d, depth) AS b_d
      FROM pairs GROUP BY 1, 2
    )
    SELECT conv_a, conv_b, prefix_depth, a_turn_idx, b_turn_idx
    FROM best
    WHERE a_role = 'assistant' AND b_role = 'assistant' AND a_d <> b_d
    ORDER BY conv_a, conv_b
    """,
)
def q_conv_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    c = (
        t.filter(F.col("conv_id") % 4 == 0)
        .withColumn("conv_id", F.col("conv_id") + F.lit(1_000_000))
        .withColumn(
            "text",
            F.when(
                F.col("turn_idx") >= 3,
                F.concat(F.col("text"), F.lit("::ALT")),
            ).otherwise(F.col("text")),
        )
    )
    return conversations.preference_pairs(t.unionByName(c)).orderBy(
        "conv_a", "conv_b"
    )


# ---------------------------------------------------------------------------
# encoding-anomaly flags: the anomalies are INJECTED on both engines
# (mojibake on doc_id%9, U+FFFD on %14, a C0 bell on %23 — the
# natural fixture text is clean and the gate must provably fire)
# ---------------------------------------------------------------------------
@query(
    "text_encoding_flags",
    # the control class and mojibake bank interpolate from the SAME
    # textstats constants the operator compiles (the _TRANSCRIPT_SQL
    # convention) — tuning the bank can never desync the oracle
    f"""
    WITH t AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 9 = 0 THEN ' bad Ã© quoteâ€™'
                ELSE '' END
             || CASE WHEN doc_id % 14 = 0
                THEN ' lost' || chr(65533) || 'char' ELSE '' END
             || CASE WHEN doc_id % 23 = 0 THEN ' bell' || chr(7)
                ELSE '' END AS text
      FROM documents
    ), f AS (
      SELECT doc_id, coalesce(text, '') AS t FROM t
    ), c AS (
      SELECT doc_id,
             CAST(length(t) - length(replace(t, chr(65533), ''))
                  AS BIGINT) AS n_replacement,
             CAST(len(regexp_extract_all(
               t, '{textstats._CONTROL_CLASS}')) AS BIGINT)
               AS n_control,
             CAST(len(regexp_extract_all(t,
               '{"|".join(textstats.MOJIBAKE_SEQS)}'))
               AS BIGINT) AS n_mojibake
      FROM f
    )
    SELECT doc_id, n_replacement, n_control, n_mojibake,
           CAST(CASE WHEN n_replacement = 0 AND n_control = 0
                     AND n_mojibake = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS keep
    FROM c ORDER BY doc_id
    """,
)
def q_text_encoding_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    suffix = F.concat(
        F.when(F.col("doc_id") % 9 == 0, F.lit(" bad Ã© quoteâ€™")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 14 == 0, F.lit(" lost�char")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 23 == 0, F.concat(F.lit(" bell"), F.lit("\x07"))
        ).otherwise(F.lit("")),
    )
    inj = docs.withColumn("text", F.concat(F.col("text"), suffix))
    return textstats.encoding_flags(inj).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Flesch reading-ease readability (exact fixed-point micros)
# ---------------------------------------------------------------------------
@query(
    "text_readability",
    r"""
    WITH f AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    ), c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(t, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(t), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM f
    )
    SELECT doc_id, n_words,
           CAST(CASE WHEN n_words = 0 THEN 0 ELSE n_sentences END
                AS BIGINT) AS n_sentences,
           n_syllables,
           CAST(CASE WHEN n_words = 0 THEN 0 ELSE
                206835000 - (1015000 * n_words) // n_sentences
                          - (84600000 * n_syllables) // n_words END
                AS BIGINT) AS flesch_micro
    FROM c ORDER BY doc_id
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return textstats.readability(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# data-card column profiler over the events table
# ---------------------------------------------------------------------------
_PROFILE_COLS = ("event_id", "event_type", "props", "user_id")


@query(
    "events_column_profile",
    " UNION ALL ".join(
        f"""
    SELECT '{c}' AS "column",
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(CAST({c} AS VARCHAR)) AS BIGINT) AS n_null,
           CAST(count(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT)
             AS n_distinct,
           min(CAST({c} AS VARCHAR)) AS min_value,
           max(CAST({c} AS VARCHAR)) AS max_value
    FROM events"""
        for c in _PROFILE_COLS
    )
    + ' ORDER BY "column"',
)
def q_events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.column_profile(ev, list(_PROFILE_COLS)).orderBy("column")


# ---------------------------------------------------------------------------
# profile drift between two event snapshots: drift INJECTED on both
# engines (%3 rows dropped, event_type mutated on %11, user_id nulled
# on %13) so every delta/flag column provably fires
# ---------------------------------------------------------------------------
def _profile_diff_oracle() -> str:
    new_sql = """SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN 'drifted'
                  ELSE event_type END AS event_type,
             props,
             CASE WHEN event_id % 13 = 0 THEN NULL
                  ELSE user_id END AS user_id
      FROM events WHERE event_id % 3 <> 0"""

    def side(tbl: str) -> str:
        return " UNION ALL ".join(
            f"""SELECT '{c}' AS col,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(CAST({c} AS VARCHAR)) AS BIGINT)
               AS n_null,
             CAST(count(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT)
               AS n_distinct,
             min(CAST({c} AS VARCHAR)) AS mn,
             max(CAST({c} AS VARCHAR)) AS mx
      FROM {tbl}"""
            for c in _PROFILE_COLS
        )

    return f"""
    WITH new_snap AS ({new_sql}),
    po AS ({side("events")}), pn AS ({side("new_snap")})
    SELECT po.col AS "column",
           po.n_rows AS n_rows_old, pn.n_rows AS n_rows_new,
           po.n_null AS n_null_old, pn.n_null AS n_null_new,
           pn.n_null - po.n_null AS null_delta,
           po.n_distinct AS n_distinct_old,
           pn.n_distinct AS n_distinct_new,
           pn.n_distinct - po.n_distinct AS distinct_delta,
           po.mn IS DISTINCT FROM pn.mn AS min_changed,
           po.mx IS DISTINCT FROM pn.mx AS max_changed
    FROM po JOIN pn ON po.col = pn.col
    ORDER BY "column"
    """


@query("events_profile_diff", _profile_diff_oracle())
def q_events_profile_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    old = ev.select(*_PROFILE_COLS)
    new = ev.filter(F.col("event_id") % 3 != 0).select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.lit("drifted"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        "props",
        F.when(F.col("event_id") % 13 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
    )
    return analytics.profile_diff(old, new, list(_PROFILE_COLS)).orderBy(
        "column"
    )


# ---------------------------------------------------------------------------
# duplicate-cluster size histogram: clones INJECTED on both engines
# (every 6th doc re-ingested) so dup_count >= 2 rows provably appear
# ---------------------------------------------------------------------------
@query(
    "dedup_cluster_histogram",
    """
    WITH t AS (
      SELECT text FROM documents
      UNION ALL
      SELECT text FROM documents WHERE doc_id % 6 = 0
    ), c AS (
      SELECT md5(text) AS d,
             CAST(count(*) AS BIGINT) AS dup_count
      FROM t GROUP BY 1
    )
    SELECT dup_count, CAST(count(*) AS BIGINT) AS n_groups,
           CAST(dup_count * count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY 1 ORDER BY dup_count
    """,
)
def q_dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    inj = docs.unionByName(
        docs.filter(F.col("doc_id") % 6 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000)
        )
    )
    return dedup.cluster_size_histogram(inj).orderBy("dup_count")


# ---------------------------------------------------------------------------
# per-source power-of-2 length histogram
# ---------------------------------------------------------------------------
@query(
    "corpus_length_histogram",
    """
    WITH f AS (
      SELECT source, length(coalesce(text, '')) AS n
      FROM documents
    ), b AS (
      SELECT source,
             CASE WHEN n = 0 THEN 0 ELSE length(bin(n)) END AS bucket
      FROM f
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(CASE WHEN bucket = 0 THEN 0
                ELSE 1 << (bucket - 1) END AS BIGINT) AS lo_chars,
           CAST(CASE WHEN bucket = 0 THEN 0
                ELSE (1 << bucket) - 1 END AS BIGINT) AS hi_chars,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM b GROUP BY source, bucket ORDER BY source, bucket
    """,
)
def q_corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.length_histogram(docs).orderBy("source", "bucket")


# ---------------------------------------------------------------------------
# stuck-agent tool-loop report: a tool column is synthesized on the
# transcript's tool turns (idx%7<4 -> 'search', else 'fetch') so
# consecutive tool turns in the same 7-block provably form runs; the
# run/loop machinery is the repeated-turns lag-flag-sum core on tool
# ---------------------------------------------------------------------------
@query(
    "conv_tool_loops",
    f"""
    WITH t AS (
      SELECT conv_id, coalesce(turn_idx, -1) AS i,
             CASE WHEN role = 'tool' THEN
               CASE WHEN turn_idx % 7 < 4 THEN 'search' ELSE 'fetch' END
             END AS tool
      FROM ({_TRANSCRIPT_SQL})
    ), s AS (
      SELECT conv_id, i, tool FROM t
      WHERE tool IS NOT NULL AND tool <> ''
    ), f AS (
      SELECT conv_id, i, tool,
             coalesce(tool = lag(tool) OVER w, FALSE) AS same
      FROM s WINDOW w AS (PARTITION BY conv_id ORDER BY i, tool)
    ), g AS (
      SELECT conv_id, tool,
             sum(CASE WHEN same THEN 0 ELSE 1 END)
               OVER (PARTITION BY conv_id ORDER BY i, tool
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
      FROM f
    ), runs AS (
      SELECT conv_id, run, count(*) AS len, min(tool) AS tool
      FROM g GROUP BY 1, 2
    )
    SELECT conv_id,
           CAST(sum(len) AS BIGINT) AS n_tool_turns,
           CAST(count(DISTINCT tool) AS BIGINT) AS n_distinct_tools,
           CAST(max(len) AS BIGINT) AS max_tool_run,
           CAST(sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_loop_runs,
           max(len) >= 3 AS has_loop
    FROM runs GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_tool_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    with_tool = t.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.when(F.col("turn_idx") % 7 < 4, "search").otherwise("fetch"),
        ),
    )
    return conversations.tool_loops(with_tool, loop_min=3).orderBy("conv_id")


# ---------------------------------------------------------------------------
# conversation-completion (abandonment) report: role synthesis gives
# natural variety in the final turn's role, so both branches of the
# abandoned flag and nonzero trailing-dangling counts occur
# ---------------------------------------------------------------------------
@query(
    "conv_abandoned",
    f"""
    WITH t AS (
      SELECT conv_id, coalesce(turn_idx, -1) AS i,
             coalesce(role, '') AS r
      FROM ({_TRANSCRIPT_SQL})
    ), s AS (
      SELECT conv_id, i, r,
             sum(CASE WHEN r = 'assistant' THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY i DESC, r DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS seen_asst,
             first_value(i) OVER (PARTITION BY conv_id
                                  ORDER BY i DESC, r DESC) AS last_i,
             first_value(r) OVER (PARTITION BY conv_id
                                  ORDER BY i DESC, r DESC) AS last_r
      FROM t
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           min(last_i) AS last_turn_idx,
           min(last_r) AS last_role,
           min(last_r) = 'assistant' AS ends_assistant,
           CAST(sum(CASE WHEN seen_asst = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS trailing_dangling,
           min(last_r) <> 'assistant' AS abandoned
    FROM s GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_abandoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.completion_stats(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# silence-gap (outage) report over events: per event_type, every
# inter-event gap >= 2h (45 rows at sf0.01 — nonzero but bounded)
# ---------------------------------------------------------------------------
@query(
    "events_outage_windows",
    """
    WITH s AS (
      SELECT CAST(event_type AS VARCHAR) AS key, ts,
             lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
    )
    SELECT key, prev AS gap_start, ts AS gap_end,
           CAST(date_diff('second', prev, ts) AS BIGINT) AS gap_sec
    FROM s
    WHERE date_diff('second', prev, ts) >= 7200
    ORDER BY key, gap_start, gap_end
    """,
)
def q_events_outage_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.outage_windows(
        ev, "event_type", "ts", min_gap_seconds=7200
    ).orderBy("key", "gap_start", "gap_end")


# ---------------------------------------------------------------------------
# canary-string contamination scan: two sentinels are INJECTED on
# deterministic docs on BOTH engines (every 7th doc gets canary A —
# every 21st twice, so n_hits > n_docs is exercised; every 13th gets
# canary B); a third canary is scanned for and provably absent
# ---------------------------------------------------------------------------
_CANARY_A = "CANARY-GUID-77f3a9"
_CANARY_B = "BENCH-SENTINEL-2b41"
_CANARY_INJECT_SQL = f"""coalesce(text, '')
          || CASE WHEN doc_id % 7 = 0 THEN ' {_CANARY_A}' ELSE '' END
          || CASE WHEN doc_id % 21 = 0 THEN ' {_CANARY_A}' ELSE '' END
          || CASE WHEN doc_id % 13 = 0 THEN ' {_CANARY_B}' ELSE '' END"""


@query(
    "corpus_canary_scan",
    f"""
    WITH t AS (
      SELECT doc_id, {_CANARY_INJECT_SQL} AS text FROM documents
    ), h AS (
      SELECT doc_id, c.canary,
             CAST((length(text) - length(replace(text, c.canary, '')))
                  // length(c.canary) AS BIGINT) AS hits
      FROM t CROSS JOIN (VALUES ('{_CANARY_A}'), ('{_CANARY_B}'),
                                ('ABSENT-CANARY-000')) AS c(canary)
    )
    SELECT canary,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(hits) AS BIGINT) AS n_hits,
           min(doc_id) AS first_doc
    FROM h WHERE hits > 0
    GROUP BY canary ORDER BY canary
    """,
)
def q_corpus_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, " " + _CANARY_A).otherwise(""),
            F.when(F.col("doc_id") % 21 == 0, " " + _CANARY_A).otherwise(""),
            F.when(F.col("doc_id") % 13 == 0, " " + _CANARY_B).otherwise(""),
        ),
    )
    return corpus.canary_scan(
        injected, [_CANARY_A, _CANARY_B, "ABSENT-CANARY-000"],
        id_col="doc_id",
    ).orderBy("canary")


# ---------------------------------------------------------------------------
# prompt-echo (parroting) report: texts are synthesized per-role on
# BOTH engines so echoing pairs provably exist — conv_id%3==0
# assistants repeat the user's topic tokens (echo 714285), others
# answer with disjoint vocabulary (echo 0); every 11th user turn is
# emptied to exercise the zero-token guard
# ---------------------------------------------------------------------------
_ECHO_CASE = """CASE
      WHEN role = 'user' AND turn_idx % 11 = 5 THEN ''
      WHEN role = 'user' THEN concat('please explain topic ',
           CAST(conv_id % 7 AS VARCHAR), ' alpha beta gamma')
      WHEN role = 'assistant' AND conv_id % 3 = 0 THEN concat('topic ',
           CAST(conv_id % 7 AS VARCHAR), ' alpha beta gamma explained')
      WHEN role = 'assistant' THEN 'unrelated reply delta epsilon'
      ELSE text END"""


def _inject_echo(t: DataFrame) -> DataFrame:
    """DataFrame twin of _ECHO_CASE."""
    return t.withColumn(
        "text",
        F.when(
            (F.col("role") == "user") & (F.col("turn_idx") % 11 == 5),
            F.lit(""),
        )
        .when(
            F.col("role") == "user",
            F.concat(
                F.lit("please explain topic "),
                (F.col("conv_id") % 7).cast("string"),
                F.lit(" alpha beta gamma"),
            ),
        )
        .when(
            (F.col("role") == "assistant") & (F.col("conv_id") % 3 == 0),
            F.concat(
                F.lit("topic "),
                (F.col("conv_id") % 7).cast("string"),
                F.lit(" alpha beta gamma explained"),
            ),
        )
        .when(F.col("role") == "assistant", F.lit("unrelated reply delta epsilon"))
        .otherwise(F.col("text")),
    )


@query(
    "conv_echo_stats",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, turn_idx AS i, role, {_ECHO_CASE} AS text FROM t0
    ), a AS (
      SELECT conv_id, i, role,
             list_sort(list_distinct(list_filter(
               string_split_regex(lower(coalesce(text, '')), '\\s+'),
               x -> x <> ''))) AS toks
      FROM t
    ), p AS (
      SELECT conv_id, i, role, toks,
             lead(i) OVER w AS ni, lead(role) OVER w AS nrole,
             lead(toks) OVER w AS ntoks
      FROM a WINDOW w AS (PARTITION BY conv_id ORDER BY i, role)
    ), e AS (
      SELECT conv_id,
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE len(list_intersect(toks, ntoks)) * 1000000
                       // len(toks) END AS echo
      FROM p WHERE role = 'user' AND nrole = 'assistant' AND ni = i + 1
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(max(echo) AS BIGINT) AS max_echo_micro,
           CAST(sum(echo) // count(*) AS BIGINT) AS avg_echo_micro,
           CAST(sum(CASE WHEN echo >= 600000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_echoed,
           sum(CASE WHEN echo >= 600000 THEN 1 ELSE 0 END) > 0 AS has_echo
    FROM e GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_echo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _inject_echo(_as_transcript(spark, sf_dir, inject=False))
    return conversations.echo_stats(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# cut-off response detector: assistant texts are synthesized per
# turn_idx%5 on BOTH engines so every flag fires — 0 clean, 1 mid-
# sentence cut, 2 unclosed code fence (also no terminal), 3 trailing
# ellipsis, 4 unterminated quotation
# ---------------------------------------------------------------------------
_TRUNC_CASE = """CASE WHEN role = 'assistant' THEN
      CASE turn_idx % 5
        WHEN 0 THEN 'All done.'
        WHEN 1 THEN 'It stops abruptly'
        WHEN 2 THEN concat('Here is code: ``', '`py x = 1')
        WHEN 3 THEN 'And then...'
        ELSE 'He said "it works.'
      END
    ELSE text END"""


def _inject_truncation(t: DataFrame) -> DataFrame:
    """DataFrame twin of _TRUNC_CASE."""
    m = F.col("turn_idx") % 5
    return t.withColumn(
        "text",
        F.when(
            F.col("role") == "assistant",
            F.when(m == 0, F.lit("All done."))
            .when(m == 1, F.lit("It stops abruptly"))
            .when(m == 2, F.lit("Here is code: ```py x = 1"))
            .when(m == 3, F.lit("And then..."))
            .otherwise(F.lit('He said "it works.')),
        ).otherwise(F.col("text")),
    )


@query(
    "conv_truncated",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, role, {_TRUNC_CASE} AS text FROM t0
    ), f AS (
      SELECT conv_id,
             CASE WHEN regexp_replace(text, '\\s+$', '') <> ''
                  AND right(regexp_replace(text, '\\s+$', ''), 1) NOT IN
                      ('.', '!', '?', '"', '''', ')', ']', '}}', '`')
                  THEN 1 ELSE 0 END AS no_term,
             CASE WHEN ((length(text)
                         - length(replace(text, '``' || '`', ''))) // 3)
                        % 2 = 1
                  THEN 1 ELSE 0 END AS fence,
             CASE WHEN ends_with(regexp_replace(text, '\\s+$', ''), '...') THEN 1 ELSE 0 END
               AS ell,
             CASE WHEN (length(text)
                        - length(replace(text, '"', ''))) % 2 = 1
                  THEN 1 ELSE 0 END AS quo
      FROM t WHERE role = 'assistant'
    ), g AS (
      SELECT conv_id, no_term, fence, ell, quo,
             CASE WHEN no_term + fence + ell + quo > 0 THEN 1 ELSE 0 END
               AS suspect
      FROM f
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_assistant,
           CAST(sum(no_term) AS BIGINT) AS n_no_terminal,
           CAST(sum(fence) AS BIGINT) AS n_odd_fence,
           CAST(sum(ell) AS BIGINT) AS n_ellipsis,
           CAST(sum(quo) AS BIGINT) AS n_odd_quote,
           CAST(sum(suspect) AS BIGINT) AS n_suspect,
           CAST(sum(suspect) * 1000000 // count(*) AS BIGINT)
             AS suspect_ratio_micro,
           sum(suspect) > 0 AS has_suspect
    FROM g GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _inject_truncation(_as_transcript(spark, sf_dir, inject=False))
    return conversations.truncation_stats(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# FAQ mining: user-turn texts are synthesized on BOTH engines so
# cross-conversation heavy hitters exist — two trivial variants of
# the password question (collapsed by normalization), one weather
# question, and the natural long-tail props for the rest
# ---------------------------------------------------------------------------
_FAQ_CASE = """CASE
      WHEN role = 'user' AND (conv_id + turn_idx) % 4 = 0
        THEN 'How do I reset my password?'
      WHEN role = 'user' AND (conv_id + turn_idx) % 4 = 1
        THEN 'how do i reset my password!!'
      WHEN role = 'user' AND (conv_id + turn_idx) % 4 = 2
        THEN 'What is the weather'
      ELSE text END"""


def _inject_faq(t: DataFrame) -> DataFrame:
    """DataFrame twin of _FAQ_CASE."""
    m = (F.col("conv_id") + F.col("turn_idx")) % 4
    is_user = F.col("role") == "user"
    return t.withColumn(
        "text",
        F.when(is_user & (m == 0), F.lit("How do I reset my password?"))
        .when(is_user & (m == 1), F.lit("how do i reset my password!!"))
        .when(is_user & (m == 2), F.lit("What is the weather"))
        .otherwise(F.col("text")),
    )


@query(
    "conv_faq_topk",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, {_FAQ_CASE} AS text FROM t0 WHERE role = 'user'
    ), n AS (
      SELECT conv_id,
             md5(trim(regexp_replace(lower(text), '[^\\p{{L}}\\p{{N}}]+',
                                     ' ', 'g'))) AS prompt_md5,
             CAST(length(text) AS BIGINT) AS ch
      FROM t WHERE text IS NOT NULL
    )
    SELECT prompt_md5,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           min(ch) AS min_chars, max(ch) AS max_chars,
           min(conv_id) AS first_conv
    FROM n GROUP BY prompt_md5
    ORDER BY n_turns DESC, prompt_md5 ASC LIMIT 5
    """,
)
def q_conv_faq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _inject_faq(_as_transcript(spark, sf_dir, inject=False))
    return conversations.top_user_prompts(t, k=5)


# ---------------------------------------------------------------------------
# key-concentration card over events: the natural user_id skew of the
# events table is the fixture (no injection needed)
# ---------------------------------------------------------------------------
@query(
    "events_concentration",
    """
    WITH c AS (
      SELECT event_type AS gtype, CAST(user_id AS VARCHAR) AS k,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT gtype, n,
             row_number() OVER w AS rnk,
             sum(n) OVER (PARTITION BY gtype ORDER BY n DESC, k ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum,
             sum(n) OVER (PARTITION BY gtype) AS tot
      FROM c WINDOW w AS (PARTITION BY gtype ORDER BY n DESC, k ASC)
    )
    SELECT gtype AS event_type,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(CASE WHEN rnk = 1 THEN n END) * 1000000 // sum(n)
                AS BIGINT) AS top1_share_micro,
           CAST(sum(CASE WHEN rnk <= 3 THEN n ELSE 0 END) * 1000000
                // sum(n) AS BIGINT) AS top3_share_micro,
           CAST(min(CASE WHEN cum * 2 >= tot THEN rnk END) AS BIGINT)
             AS n_keys_half
    FROM r GROUP BY gtype ORDER BY event_type
    """,
)
def q_events_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.concentration_report(
        ev, key_col="user_id", type_col="event_type", top_k=3
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# SLO error-budget burn: natural fixture — the events table's hourly
# error ratio oscillates around 190k micro, so slo=200k with a
# 6-bucket window yields both burning and healthy hours
# ---------------------------------------------------------------------------
@query(
    "events_slo_burn",
    """
    WITH b AS (
      SELECT date_trunc('hour', ts) AS bucket_ts,
             CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ), w AS (
      SELECT bucket_ts, n_total, n_errors,
             CAST(n_errors * 1000000 // n_total AS BIGINT) AS err_micro,
             CAST(sum(n_total) OVER tw AS BIGINT) AS win_total,
             CAST(sum(n_errors) OVER tw AS BIGINT) AS win_errors
      FROM b WINDOW tw AS (ORDER BY bucket_ts
                           ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, n_total, n_errors, err_micro, win_total, win_errors,
           CAST(win_errors * 1000000 // win_total AS BIGINT)
             AS win_err_micro,
           CAST((win_errors * 1000000 // win_total) * 1000000 // 200000
                AS BIGINT) AS burn_micro,
           (win_errors * 1000000 // win_total) * 1000000 // 200000
             >= 1000000 AS is_burning
    FROM w ORDER BY bucket_ts
    """,
)
def q_events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.slo_burn(
        ev, slo_error_micro=200_000, window_buckets=6
    ).orderBy("bucket_ts")


# ---------------------------------------------------------------------------
# system-prompt census: system-turn texts synthesized per conv_id%3 on
# BOTH engines so three persona templates with distinct shares exist
# ---------------------------------------------------------------------------
_SYSPROMPT_CASE = """CASE WHEN role = 'system' THEN
      CASE conv_id % 4
        WHEN 1 THEN 'You are a coding assistant.'
        WHEN 2 THEN 'You are a terse assistant.'
        ELSE 'You are a helpful assistant.'
      END
    ELSE text END"""


def _inject_sysprompt(t: DataFrame) -> DataFrame:
    """DataFrame twin of _SYSPROMPT_CASE."""
    m = F.col("conv_id") % 4
    return t.withColumn(
        "text",
        F.when(
            F.col("role") == "system",
            F.when(m == 1, F.lit("You are a coding assistant."))
            .when(m == 2, F.lit("You are a terse assistant."))
            .otherwise(F.lit("You are a helpful assistant.")),
        ).otherwise(F.col("text")),
    )


@query(
    "conv_system_prompts",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, turn_idx, role, {_SYSPROMPT_CASE} AS text FROM t0
    ), s AS (
      SELECT conv_id, md5(text) AS d,
             CAST(length(text) AS BIGINT) AS ch,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY turn_idx, md5(text)) AS rn
      FROM t WHERE role = 'system'
    ), f AS (
      SELECT conv_id, d, ch FROM s WHERE rn = 1
    ), c AS (
      SELECT d AS prompt_md5,
             CAST(count(*) AS BIGINT) AS n_convs,
             min(ch) AS n_chars,
             min(conv_id) AS first_conv
      FROM f GROUP BY d
    )
    SELECT prompt_md5, n_convs, n_chars,
           CAST(n_convs * 1000000 // sum(n_convs) OVER () AS BIGINT)
             AS share_micro,
           first_conv
    FROM c ORDER BY n_convs DESC, prompt_md5
    """,
)
def q_conv_system_prompts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _inject_sysprompt(_as_transcript(spark, sf_dir, inject=False))
    return conversations.system_prompt_census(t)


# ---------------------------------------------------------------------------
# seasonality heatmap / first-seen curve / co-occurrence / burstiness:
# the capacity-planning + triage + growth cards over the events table
# ---------------------------------------------------------------------------
@query(
    "events_seasonal_profile",
    """
    WITH c AS (
      SELECT CAST((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   + 4) % 7 AS INT) AS dow,
             CAST(extract(hour FROM ts) AS INT) AS hour,
             CAST(ts AS DATE) AS d, count(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
    ), g AS (
      SELECT dow, hour, CAST(sum(n) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_days
      FROM c GROUP BY 1, 2
    )
    SELECT dow, hour, n_events, n_days,
           CAST(n_events * 1000000 // n_days AS BIGINT) AS per_day_micro,
           CAST(n_events * 1000000 // sum(n_events) OVER () AS BIGINT)
             AS share_micro
    FROM g ORDER BY dow, hour
    """,
)
def q_events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.seasonal_profile(ev).orderBy("dow", "hour")


@query(
    "events_first_seen",
    """
    WITH p AS (
      SELECT DISTINCT user_id AS k, date_trunc('day', ts) AS bucket_ts
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), a AS (
      SELECT bucket_ts, CAST(count(*) AS BIGINT) AS n_active
      FROM p GROUP BY 1
    ), f AS (
      SELECT k, min(bucket_ts) AS bucket_ts FROM p GROUP BY 1
    ), n AS (
      SELECT bucket_ts, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1
    ), c AS (
      SELECT a.bucket_ts, a.n_active,
             CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new
      FROM a LEFT JOIN n USING (bucket_ts)
    )
    SELECT bucket_ts, n_active, n_new,
           CAST(n_active - n_new AS BIGINT) AS n_returning,
           CAST(sum(n_new) OVER (ORDER BY bucket_ts
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_keys
    FROM c ORDER BY bucket_ts
    """,
)
def q_events_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.first_seen_curve(ev).orderBy("bucket_ts")


@query(
    "events_cooccurrence",
    """
    WITH cells AS (
      SELECT DISTINCT user_id AS k, date_trunc('hour', ts) AS b,
             event_type AS t
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ), bo AS (
      SELECT l.t AS type_a, r.t AS type_b, CAST(count(*) AS BIGINT) AS n_both
      FROM cells l JOIN cells r ON l.k = r.k AND l.b = r.b AND l.t < r.t
      GROUP BY 1, 2
    ), pt AS (
      SELECT t, CAST(count(*) AS BIGINT) AS n FROM cells GROUP BY 1
    )
    SELECT type_a, type_b, n_both, a.n AS n_a, b.n AS n_b,
           CAST(n_both * 1000000 // (a.n + b.n - n_both) AS BIGINT)
             AS jaccard_micro
    FROM bo JOIN pt a ON a.t = type_a JOIN pt b ON b.t = type_b
    ORDER BY n_both DESC, type_a, type_b
    """,
)
def q_events_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.cooccurrence_report(ev)


@query(
    "events_burstiness",
    """
    WITH g AS (
      SELECT user_id AS k, epoch_ms(ts) AS ms,
             epoch_ms(ts) - lag(epoch_ms(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS gap
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), a AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(ms) - min(ms) AS BIGINT) AS span_ms,
             CAST(sum(gap) AS HUGEINT) AS s,
             sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS s2,
             CAST(count(gap) AS HUGEINT) AS ng
      FROM g GROUP BY 1
    )
    SELECT k AS user_id, n_events, span_ms,
           CAST(s // ng AS BIGINT) AS mean_gap_ms,
           CASE WHEN s = 0 THEN NULL
                ELSE CAST((ng * s2 - s * s) * 1000000 // (s * s) AS BIGINT)
           END AS cv2_micro
    FROM a WHERE n_events >= 3 ORDER BY user_id
    """,
)
def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.burstiness_report(ev).orderBy("user_id")


# ---------------------------------------------------------------------------
# script-mix card: oracle class-count SQL interpolated at import time
# from textstats.SCRIPT_CLASSES so the two engines can never drift
# (control chars in the whitespace class are escaped for the SQL
# literal via DuckDB's E'...' escape-string syntax)
# ---------------------------------------------------------------------------
def _sql_pat(pat: str) -> str:
    esc = (
        pat.replace("\\", "\\\\").replace("'", "''")
        .replace("\t", "\\t").replace("\n", "\\n")
        .replace("\r", "\\r").replace("\f", "\\f")
    )
    return f"E'{esc}'"


_SCRIPT_CNT_SQL = ",\n             ".join(
    f"CAST(length(t) - length(regexp_replace(t, {_sql_pat(p)}, '', 'g'))"
    f" AS BIGINT) AS __{n}__"
    for n, p in textstats.SCRIPT_CLASSES
)
_SCRIPT_MICRO_SQL = ",\n           ".join(
    f"CAST(CASE WHEN n_chars > 0 THEN __{n}__ * 1000000 // n_chars END"
    f" AS BIGINT) AS {n}_micro"
    for n, _ in textstats.SCRIPT_CLASSES
)
_SCRIPT_OTHER_SQL = " - ".join(
    ["n_chars"] + [f"__{n}__" for n, _ in textstats.SCRIPT_CLASSES]
)


@query(
    "text_script_mix",
    f"""
    WITH s AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    ), c AS (
      SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
             {_SCRIPT_CNT_SQL}
      FROM s
    )
    SELECT doc_id, n_chars,
           {_SCRIPT_MICRO_SQL},
           CAST(CASE WHEN n_chars > 0 THEN ({_SCRIPT_OTHER_SQL})
                * 1000000 // n_chars END AS BIGINT) AS other_micro
    FROM c ORDER BY doc_id
    """,
)
def q_text_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.script_mix(_t(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# context-replay cost card over the transcript fixture
# ---------------------------------------------------------------------------
@query(
    "conv_cost_report",
    f"""
    WITH t AS (
      {{transcript}}
    ), s AS (
      SELECT conv_id,
             coalesce(CAST(turn_idx AS BIGINT), -1) AS idx,
             coalesce(role, '') AS role,
             coalesce(md5(text), '') AS d,
             CAST(len(list_filter(string_split_regex(coalesce(text, ''),
                  '\\s+'), x -> x <> '')) AS BIGINT) AS tok
      FROM t
    ), w AS (
      SELECT conv_id, role, tok,
             coalesce(sum(tok) OVER (PARTITION BY conv_id
                                     ORDER BY idx, role, d
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS bef
      FROM s
    ), a AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
             CAST(sum(CASE WHEN role <> 'assistant' THEN tok ELSE 0 END)
                  AS BIGINT) AS prompt_tokens,
             CAST(sum(CASE WHEN role = 'assistant' THEN tok ELSE 0 END)
                  AS BIGINT) AS completion_tokens,
             CAST(sum(CASE WHEN role = 'assistant' THEN bef ELSE 0 END)
                  AS BIGINT) AS replay_prompt_tokens
      FROM w GROUP BY 1
    )
    SELECT conv_id, n_turns, prompt_tokens, completion_tokens,
           replay_prompt_tokens,
           CAST(CAST(replay_prompt_tokens AS HUGEINT) * 3000 // 1000
                + CAST(completion_tokens AS HUGEINT) * 15000 // 1000
                AS BIGINT) AS cost_micro
    FROM a ORDER BY conv_id
    """.format(transcript=_TRANSCRIPT_SQL),
)
def q_conv_cost_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.cost_report(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# branching/regeneration card — the inject=True fixture's shifted idx
# rows create genuine duplicate (idx, role) slots
# ---------------------------------------------------------------------------
@query(
    "conv_branching",
    f"""
    WITH t AS (
      SELECT user_id AS conv_id,
             (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1)
               + CASE WHEN event_id % 19 = 0 THEN 1 ELSE 0 END AS turn_idx,
             {_ROLE_CASE} AS role,
             props AS text
      FROM events
    ), v AS (
      SELECT DISTINCT conv_id,
             coalesce(CAST(turn_idx AS BIGINT), -1) AS idx,
             coalesce(role, '') AS role,
             coalesce(md5(text), '') AS d
      FROM t
    ), slots AS (
      SELECT conv_id, idx, role, CAST(count(*) AS BIGINT) AS nv
      FROM v GROUP BY 1, 2, 3
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_slots,
           CAST(sum(nv) AS BIGINT) AS n_messages,
           CAST(sum(CASE WHEN nv >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_branch_points,
           CAST(max(nv) AS BIGINT) AS max_siblings,
           max(nv) >= 2 AS has_branches
    FROM slots GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=True)
    return conversations.branching_stats(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# shard-utilization report over the token-budget packing plan
# ---------------------------------------------------------------------------
@query(
    "corpus_packing_efficiency",
    """
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS c
      FROM toks
    ), packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor((c - n_tokens) / 4000.0) AS BIGINT) AS shard_id
      FROM cum
    ), shards AS (
      SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM packed GROUP BY 1
    )
    SELECT shard_id, n_docs, n_tokens,
           CAST(n_tokens * 1000000 // 4000 AS BIGINT) AS fill_micro,
           CAST(n_tokens - 4000 AS BIGINT) AS overflow_tokens,
           shard_id = max(shard_id) OVER () AS is_last
    FROM shards ORDER BY shard_id
    """,
)
def q_corpus_packing_efficiency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return corpus.packing_efficiency(
        _t(spark, sf_dir, "documents"), budget=4000
    )


# ---------------------------------------------------------------------------
# retry-storm (duplicate-delivery) card — injected bursts: every
# event_id % 211 == 0 row is re-delivered at +30 s and +70 s, so
# guaranteed >= 3-row chains sit on top of the natural tight gaps
# ---------------------------------------------------------------------------
@query(
    "events_retry_storms",
    """
    WITH base AS (
      SELECT user_id, event_type, ts FROM events
      UNION ALL
      SELECT user_id, event_type, ts + INTERVAL 30 SECOND
      FROM events WHERE event_id % 211 = 0
      UNION ALL
      SELECT user_id, event_type, ts + INTERVAL 70 SECOND
      FROM events WHERE event_id % 211 = 0
    ), s AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM base
      WHERE ts IS NOT NULL
    ), f AS (
      SELECT user_id, event_type, us,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id, event_type
                                          ORDER BY us) <= 600000000
                  THEN 0 ELSE 1 END AS head
      FROM s
    ), r AS (
      SELECT user_id, event_type,
             sum(head) OVER (PARTITION BY user_id, event_type ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS run
      FROM f
    ), runs AS (
      SELECT user_id, event_type, run, count(*) AS len
      FROM r GROUP BY 1, 2, 3
    ), a AS (
      SELECT user_id, event_type,
             CAST(sum(len) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_runs,
             CAST(sum(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_storms,
             CAST(max(len) AS BIGINT) AS max_run
      FROM runs GROUP BY 1, 2
    )
    SELECT user_id, event_type, n_rows, n_runs,
           CAST(n_rows - n_runs AS BIGINT) AS n_retries, n_storms, max_run,
           CAST((n_rows - n_runs) * 1000000 // n_rows AS BIGINT)
             AS retry_share_micro
    FROM a WHERE n_rows > n_runs ORDER BY user_id, event_type
    """,
)
def q_events_retry_storms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    burst = ev.filter(F.col("event_id") % 211 == 0)
    replayed = ev.select("user_id", "event_type", "ts")
    for shift in (30, 70):
        replayed = replayed.unionByName(
            burst.select(
                "user_id",
                "event_type",
                F.expr(f"ts + INTERVAL {shift} SECONDS").alias("ts"),
            )
        )
    return analytics.retry_storms(
        replayed,
        identity_cols=["user_id", "event_type"],
        window_sec=600,
        min_run=3,
    ).orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# JSON key census — injected payload drift: %13 rows swap to a
# session-only payload, %5 rows grow a trace key, %7 rows a retry key
# (ordered CASE so the shapes are disjoint and deterministic)
# ---------------------------------------------------------------------------
_PROPS_DRIFT_SQL = """CASE
        WHEN event_id % 13 = 0 THEN '{"session": "s"}'
        WHEN event_id % 5 = 0
          THEN replace(props, '}', ', "trace": "abc"}')
        WHEN event_id % 7 = 0
          THEN replace(props, '}', ', "retry": 1}')
        ELSE props END"""


@query(
    "events_key_census",
    f"""
    WITH drift AS (
      SELECT event_type, {_PROPS_DRIFT_SQL} AS props FROM events
    ), keys AS (
      SELECT event_type, unnest(list_distinct(regexp_extract_all(
               coalesce(props, ''), '"([^"]+)"\\s*:', 1))) AS key
      FROM drift
    ), census AS (
      SELECT event_type, key, CAST(count(*) AS BIGINT) AS n_rows
      FROM keys GROUP BY 1, 2
    ), totals AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_type_rows
      FROM drift GROUP BY 1
    )
    SELECT c.event_type, c.key, c.n_rows, t.n_type_rows,
           CAST(c.n_rows * 1000000 // t.n_type_rows AS BIGINT)
             AS presence_micro
    FROM census c JOIN totals t USING (event_type)
    ORDER BY event_type, key
    """,
)
def q_events_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr(_PROPS_DRIFT_SQL).alias("props"),
    )
    return analytics.json_key_census(ev).orderBy("event_type", "key")


# ---------------------------------------------------------------------------
# user-rephrase (near-retry) report — natural fixture: consecutive
# user-turn payloads differ by a couple of digits, so the normalized
# Levenshtein similarity lands both sides of the 0.6 threshold
# ---------------------------------------------------------------------------
@query(
    "conv_rephrase",
    f"""
    WITH t AS (
      {_TRANSCRIPT_SQL}
    ), u AS (
      SELECT conv_id, coalesce(CAST(turn_idx AS BIGINT), -1) AS idx,
             coalesce(md5(text), '') AS d,
             substr(coalesce(text, ''), 1, 200) AS s
      FROM t WHERE role = 'user'
    ), p AS (
      SELECT conv_id, s,
             lag(s) OVER (PARTITION BY conv_id ORDER BY idx, d) AS ps
      FROM u
    ), m AS (
      SELECT conv_id,
             CASE WHEN ps IS NULL THEN NULL
                  ELSE CAST(levenshtein(s, ps) AS BIGINT) END AS dist,
             CAST(greatest(length(s), length(ps)) AS BIGINT) AS ml
      FROM p
    ), sc AS (
      SELECT conv_id, dist,
             CASE WHEN dist IS NULL THEN NULL
                  WHEN ml = 0 THEN 1000000
                  ELSE (ml - dist) * 1000000 // ml END AS sim
      FROM m
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_role_turns,
           CAST(count(sim) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN sim >= 600000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rephrases,
           CAST(sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_repeats,
           CAST(max(sim) AS BIGINT) AS max_sim_micro
    FROM sc GROUP BY conv_id HAVING count(sim) > 0 ORDER BY conv_id
    """,
)
def q_conv_rephrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.rephrase_report(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# loss-mask span table — the offsets file next to the packed SFT
# sample: per turn, its char span in the concatenated conversation
# and whether it is a loss (assistant) span
# ---------------------------------------------------------------------------
@query(
    "conv_loss_mask",
    f"""
    WITH t AS (
      {_TRANSCRIPT_SQL}
    ), s AS (
      SELECT conv_id, coalesce(CAST(turn_idx AS BIGINT), -1) AS idx,
             coalesce(role, '') AS role,
             coalesce(md5(text), '') AS text_md5,
             CAST(coalesce(length(text), 0) AS BIGINT) AS len
      FROM t
    ), o AS (
      SELECT conv_id, idx, role, text_md5, len,
             CAST(coalesce(sum(len + 1) OVER (
                    PARTITION BY conv_id ORDER BY idx, role, text_md5
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS start_off
      FROM s
    )
    SELECT conv_id, idx AS turn_idx, role, start_off,
           CAST(start_off + len AS BIGINT) AS end_off,
           role = 'assistant' AS masked, text_md5
    FROM o ORDER BY conv_id, turn_idx, role, text_md5
    """,
)
def q_conv_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.loss_mask_spans(t).orderBy(
        "conv_id", "turn_idx", "role", "text_md5"
    )


# ---------------------------------------------------------------------------
# conversation-outcome (resolution) card — marker injection on
# (conv_id + turn_idx) % 7: pos / neg / pos-and-neg (neg must win)
# ---------------------------------------------------------------------------
_RESOLUTION_CASE = """CASE
      WHEN role = 'user' AND (conv_id + turn_idx) % 7 = 0
        THEN 'thanks, that works now!'
      WHEN role = 'user' AND (conv_id + turn_idx) % 7 = 1
        THEN 'still not working, same error'
      WHEN role = 'user' AND (conv_id + turn_idx) % 7 = 2
        THEN 'Thanks, but still not working'
      ELSE text END"""


def _inject_resolution(t: DataFrame) -> DataFrame:
    """DataFrame twin of _RESOLUTION_CASE."""
    m = (F.col("conv_id") + F.col("turn_idx")) % 7
    is_user = F.col("role") == "user"
    return t.withColumn(
        "text",
        F.when(is_user & (m == 0), F.lit("thanks, that works now!"))
        .when(is_user & (m == 1), F.lit("still not working, same error"))
        .when(is_user & (m == 2), F.lit("Thanks, but still not working"))
        .otherwise(F.col("text")),
    )


def _sql_pat(p: str) -> str:
    return p.replace("'", "''")


@query(
    "conv_resolution",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, turn_idx, role, {_RESOLUTION_CASE} AS text FROM t0
    ), u AS (
      SELECT conv_id, coalesce(CAST(turn_idx AS BIGINT), -1) AS idx,
             coalesce(md5(text), '') AS d,
             regexp_matches(coalesce(text, ''),
                            '{_sql_pat(conversations.RESOLUTION_POS_RE)}')
               AS pos,
             regexp_matches(coalesce(text, ''),
                            '{_sql_pat(conversations.RESOLUTION_NEG_RE)}')
               AS neg
      FROM t WHERE role = 'user'
    ), r AS (
      SELECT conv_id, pos, neg,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY idx DESC, d DESC) AS rn
      FROM u
    )
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_user_turns,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos_turns,
           CAST(sum(CASE WHEN neg THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg_turns,
           max(CASE WHEN rn = 1 THEN
                 CASE WHEN neg THEN 'unresolved'
                      WHEN pos THEN 'resolved'
                      ELSE 'unknown' END END) AS outcome
    FROM r GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _inject_resolution(_as_transcript(spark, sf_dir, inject=False))
    return conversations.resolution_stats(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# corpus novelty curve — per-doc first-owned shingle share (natural
# fixture: the documents table's repeated boilerplate spans make
# later docs markedly less novel)
# ---------------------------------------------------------------------------
@query(
    "corpus_novelty",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS.format(col="coalesce(text, '')")} AS w
      FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_distinct(list_transform(range(len(w) - 2),
                       i -> md5(w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])))
                  ELSE [] END AS s
      FROM toks
    ), d AS (
      SELECT doc_id, unnest(s) AS sg FROM sh
    ), own AS (
      SELECT sg, min(doc_id) AS owner FROM d GROUP BY sg
    ), per AS (
      SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN o.owner = d.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM d JOIN own o USING (sg) GROUP BY d.doc_id
    )
    SELECT doc_id, n_shingles, n_novel,
           CAST(n_shingles - n_novel AS BIGINT) AS n_seen_before,
           CAST(n_novel * 1000000 // n_shingles AS BIGINT) AS novelty_micro
    FROM per ORDER BY doc_id
    """,
)
def q_corpus_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.novelty_curve(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# named top-N keys per group — natural user_id skew fixture
# ---------------------------------------------------------------------------
@query(
    "events_top_users",
    """
    WITH c AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS key,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT event_type, key, n_rows,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n_rows DESC, key ASC) AS rank,
             sum(n_rows) OVER (PARTITION BY event_type) AS tot
      FROM c
    )
    SELECT event_type, CAST(rank AS BIGINT) AS rank, key, n_rows,
           CAST(n_rows * 1000000 // tot AS BIGINT) AS share_micro
    FROM r WHERE rank <= 3 ORDER BY event_type, rank
    """,
)
def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.top_per_group(
        ev, group_col="event_type", key_col="user_id", n=3
    ).orderBy("event_type", "rank")


# ---------------------------------------------------------------------------
# per-type daily-volume trend — exact least-squares slope; the 30-day
# fixture's noise yields rising AND falling slopes, pinning the
# negative-quotient parity (both engines' integer division truncates
# toward zero — see trend_report's docstring)
# ---------------------------------------------------------------------------
@query(
    "events_trend",
    """
    WITH b AS (
      SELECT event_type AS key, epoch_us(ts) // 86400000000 AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), m AS (
      SELECT key,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sxx
      FROM b GROUP BY 1
    )
    SELECT key AS event_type,
           CAST(n AS BIGINT) AS n_buckets,
           CAST(sy AS BIGINT) AS n_rows,
           CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
                AS BIGINT) AS slope_micro_per_bucket
    FROM m WHERE n >= 2 ORDER BY event_type
    """,
)
def q_events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.trend_report(
        ev, key_col="event_type", bucket_seconds=86_400
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# streaming retry-storm twin — same +30 s/+70 s replay injection as
# events_retry_storms; one row per CLOSED storm chain, the trailing
# open chain per identity is withheld pending state (oracle excludes
# each identity's last run)
# ---------------------------------------------------------------------------
@query(
    "streaming_retry_storms",
    """
    WITH base AS (
      SELECT user_id, event_type, ts FROM events
      UNION ALL
      SELECT user_id, event_type, ts + INTERVAL 30 SECOND
      FROM events WHERE event_id % 211 = 0
      UNION ALL
      SELECT user_id, event_type, ts + INTERVAL 70 SECOND
      FROM events WHERE event_id % 211 = 0
    ), s AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM base
      WHERE ts IS NOT NULL
    ), f AS (
      SELECT user_id, event_type, us,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id, event_type
                                          ORDER BY us) <= 600000000
                  THEN 0 ELSE 1 END AS head
      FROM s
    ), r AS (
      SELECT user_id, event_type, us,
             sum(head) OVER (PARTITION BY user_id, event_type ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS run
      FROM f
    ), runs AS (
      SELECT user_id, event_type, run,
             min(us) AS run_started_us, max(us) AS run_ended_us,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM r GROUP BY 1, 2, 3
    ), mx AS (
      SELECT user_id, event_type, max(run) AS mr
      FROM runs GROUP BY 1, 2
    )
    SELECT r.user_id, r.event_type, r.run_started_us, r.run_ended_us,
           r.n_rows
    FROM runs r JOIN mx USING (user_id, event_type)
    WHERE r.run < mx.mr AND r.n_rows >= 3
    ORDER BY user_id, event_type, run_started_us
    """,
)
def q_streaming_retry_storms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import streaming_retry_storms

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    burst = ev.filter(F.col("event_id") % 211 == 0)
    replayed = ev.select("user_id", "event_type", "ts")
    for shift in (30, 70):
        replayed = replayed.unionByName(
            burst.select(
                "user_id",
                "event_type",
                F.expr(f"ts + INTERVAL {shift} SECONDS").alias("ts"),
            )
        )
    out = _drain_two_batch_stream(
        spark,
        replayed,
        "user_id long, event_type string, ts timestamp",
        lambda s: streaming_retry_storms(
            s, ["user_id", "event_type"], window_sec=600, min_run=3
        ),
    )
    return out.select(
        "user_id", "event_type", "run_started_us", "run_ended_us", "n_rows"
    ).orderBy("user_id", "event_type", "run_started_us")


# ---------------------------------------------------------------------------
# enrich-miss (referential) audit — injected id-space drift: %31
# rows shift out of the dimension domain, %97 rows carry a NULL key
# ---------------------------------------------------------------------------
@query(
    "events_enrich_miss",
    """
    WITH drift AS (
      SELECT event_type,
             CASE WHEN event_id % 31 = 0 THEN user_id + 1000000
                  WHEN event_id % 97 = 0 THEN NULL
                  ELSE user_id END AS user_id
      FROM events
    ), keys AS (
      SELECT DISTINCT c_custkey AS pk FROM customer
    ), j AS (
      SELECT e.event_type, e.user_id AS fk, k.pk
      FROM drift e LEFT JOIN keys k ON e.user_id = k.pk
    ), a AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orphans,
             CAST(count(DISTINCT CASE WHEN pk IS NULL THEN fk END)
                  AS BIGINT) AS n_orphan_keys
      FROM j GROUP BY 1
    )
    SELECT event_type, n_rows, n_orphans,
           CAST(n_orphans * 1000000 // n_rows AS BIGINT) AS orphan_micro,
           n_orphan_keys
    FROM a ORDER BY event_type
    """,
)
def q_events_enrich_miss(spark: SparkSession, sf_dir: str) -> DataFrame:
    # id-space drift injection: %31 rows shift out of the dimension
    # domain, %97 rows lose their key entirely (NULL-orphan branch)
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("event_id") % 31 == 0, F.col("user_id") + 1_000_000)
        .when(F.col("event_id") % 97 == 0, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
    )
    cust = _t(spark, sf_dir, "customer")
    return analytics.referential_audit(
        ev, cust, fk_col="user_id", pk_col="c_custkey"
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# k-anonymity release card — QI = (user_id, event_type); the natural
# fixture's group-size spread puts rows on both sides of k=5
# ---------------------------------------------------------------------------
@query(
    "events_k_anonymity",
    """
    WITH g AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS n_small_rows,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 1000000
                // sum(n) AS BIGINT) AS small_rows_micro,
           CAST(min(n) AS BIGINT) AS min_group,
           CAST(max(n) AS BIGINT) AS max_group
    FROM g
    """,
)
def q_events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.k_anonymity_report(
        ev, qi_cols=["user_id", "event_type"], k=5
    )


# ---------------------------------------------------------------------------
# license-marker census — injected rights language on doc_id mod
# (ordered CASE: one marker class appended per doc)
# ---------------------------------------------------------------------------
_LICENSE_CASE = """CASE
      WHEN doc_id % 13 = 0 THEN coalesce(text, '')
        || ' © 2024 Example Corp. All rights reserved.'
      WHEN doc_id % 17 = 0 THEN coalesce(text, '')
        || ' Licensed under CC-BY 4.0 (Creative Commons).'
      WHEN doc_id % 19 = 0 THEN coalesce(text, '')
        || ' This document is confidential; do not distribute.'
      WHEN doc_id % 23 = 0 THEN coalesce(text, '')
        || ' Distributed under the GNU General Public License.'
      ELSE text END"""


def _inject_license(docs: DataFrame) -> DataFrame:
    """DataFrame twin of _LICENSE_CASE."""
    t = F.coalesce(F.col("text"), F.lit(""))
    return docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(t, F.lit(" © 2024 Example Corp. All rights reserved.")),
        )
        .when(
            F.col("doc_id") % 17 == 0,
            F.concat(
                t, F.lit(" Licensed under CC-BY 4.0 (Creative Commons).")
            ),
        )
        .when(
            F.col("doc_id") % 19 == 0,
            F.concat(
                t, F.lit(" This document is confidential; do not distribute.")
            ),
        )
        .when(
            F.col("doc_id") % 23 == 0,
            F.concat(
                t, F.lit(" Distributed under the GNU General Public License.")
            ),
        )
        .otherwise(F.col("text")),
    )


_LICENSE_FLAG_SQL = ",\n             ".join(
    "regexp_matches(coalesce(text, ''), '{pat}') AS f_{name}".format(
        pat=pat.replace("'", "''"), name=name
    )
    for name, pat in corpus.LICENSE_CLASSES
)
_LICENSE_AGG_SQL = ",\n           ".join(
    "CAST(sum(CASE WHEN f_{name} THEN 1 ELSE 0 END) AS BIGINT)"
    " AS {name}_docs".format(name=name)
    for name, _ in corpus.LICENSE_CLASSES
)
_LICENSE_ANY_SQL = " OR ".join(
    f"f_{name}" for name, _ in corpus.LICENSE_CLASSES
)


@query(
    "corpus_license_scan",
    f"""
    WITH d AS (
      SELECT source, {_LICENSE_CASE} AS text FROM documents
    ), f AS (
      SELECT source,
             {_LICENSE_FLAG_SQL}
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {_LICENSE_AGG_SQL},
           CAST(sum(CASE WHEN {_LICENSE_ANY_SQL} THEN 1 ELSE 0 END)
                AS BIGINT) AS flagged_docs,
           CAST(sum(CASE WHEN {_LICENSE_ANY_SQL} THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS flagged_micro
    FROM f GROUP BY source ORDER BY source
    """,
)
def q_corpus_license_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _inject_license(_t(spark, sf_dir, "documents"))
    return corpus.license_scan(docs).orderBy("source")


# ---------------------------------------------------------------------------
# incident-recovery (MTTR) card: natural fixture — the events table
# interleaves 'error' rows with other types per user, so incidents
# open, recover, and (for users whose LAST events are errors) stay
# open; exact epoch-micro TTR, event_id breaks ts ties on both engines
# ---------------------------------------------------------------------------
@query(
    "events_mttr",
    """
    WITH s AS (
      SELECT user_id AS key, epoch_us(ts) AS us, event_id AS ord,
             (event_type = 'error') AS is_err
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), m AS (
      SELECT key, us, is_err,
             lag(is_err) OVER (PARTITION BY key ORDER BY us, ord)
               AS prev_err,
             min(CASE WHEN NOT is_err THEN us END)
               OVER (PARTITION BY key ORDER BY us DESC, ord DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS rec_us
      FROM s
    ), inc AS (
      SELECT key, us AS open_us, rec_us FROM m
      WHERE is_err AND (prev_err IS NULL OR NOT prev_err)
    )
    SELECT key,
           CAST(count(*) AS BIGINT) AS n_incidents,
           CAST(count(rec_us) AS BIGINT) AS n_recovered,
           CAST(count(*) - count(rec_us) AS BIGINT) AS n_open,
           CAST(CASE WHEN count(rec_us) > 0
                     THEN sum(rec_us - open_us) // count(rec_us)
                END AS BIGINT) AS mean_ttr_us,
           CAST(max(rec_us - open_us) AS BIGINT) AS max_ttr_us
    FROM inc GROUP BY key ORDER BY key
    """,
)
def q_events_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.mttr_report(ev).orderBy("key")


# ---------------------------------------------------------------------------
# markdown/code formatting census: markers are INJECTED on assistant
# turns by (conv_id + turn_idx) % 5 on BOTH engines — a fenced block,
# bullets + a link, a heading, and a DANGLING fence (must floor to 0
# blocks); plain props JSON carries none of the four markers
# ---------------------------------------------------------------------------
_MD_CASE = """CASE
      WHEN role = 'assistant' AND (conv_id + turn_idx) % 5 = 0
        THEN text || chr(10) || '```python' || chr(10) || 'print(1)'
             || chr(10) || '```'
      WHEN role = 'assistant' AND (conv_id + turn_idx) % 5 = 1
        THEN '- first' || chr(10) || '- second' || chr(10)
             || 'see [doc](https://example.com)'
      WHEN role = 'assistant' AND (conv_id + turn_idx) % 5 = 2
        THEN '# Summary' || chr(10) || text
      WHEN role = 'assistant' AND (conv_id + turn_idx) % 5 = 3
        THEN 'prose with ``` one dangling fence'
      ELSE text END"""


def _inject_markdown(t: DataFrame) -> DataFrame:
    """DataFrame twin of _MD_CASE."""
    m = (F.col("conv_id") + F.col("turn_idx")) % 5
    is_a = F.col("role") == "assistant"
    return t.withColumn(
        "text",
        F.when(
            is_a & (m == 0),
            F.concat(F.col("text"), F.lit("\n```python\nprint(1)\n```")),
        )
        .when(is_a & (m == 1),
              F.lit("- first\n- second\nsee [doc](https://example.com)"))
        .when(is_a & (m == 2), F.concat(F.lit("# Summary\n"), F.col("text")))
        .when(is_a & (m == 3), F.lit("prose with ``` one dangling fence"))
        .otherwise(F.col("text")),
    )


@query(
    "conv_markdown_census",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), t AS (
      SELECT conv_id, {_MD_CASE} AS text
      FROM t0 WHERE role = 'assistant'
    ), a AS (
      SELECT conv_id,
             CAST((length(x) - length(replace(x, '```', ''))) // 3
                  AS BIGINT) // 2 AS blocks,
             CAST(len(list_filter(string_split(x, chr(10)),
                                  l -> l LIKE '- %')) AS BIGINT) AS bullets,
             CAST(len(list_filter(string_split(x, chr(10)),
                                  l -> l LIKE '#%')) AS BIGINT) AS headings,
             CAST((length(x) - length(replace(x, '](', ''))) // 2
                  AS BIGINT) AS links
      FROM (SELECT conv_id, coalesce(text, '') AS x FROM t)
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN blocks > 0 OR bullets > 0 OR headings > 0
                              OR links > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_md_turns,
           CAST(sum(blocks) AS BIGINT) AS n_code_blocks,
           CAST(sum(bullets) AS BIGINT) AS n_bullet_lines,
           CAST(sum(headings) AS BIGINT) AS n_heading_lines,
           CAST(sum(links) AS BIGINT) AS n_links
    FROM a GROUP BY conv_id ORDER BY conv_id
    """,
)
def q_conv_markdown_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _inject_markdown(_as_transcript(spark, sf_dir, inject=False))
    return conversations.markdown_census(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# change-point (level-shift) card: natural fixture — hourly bucket
# counts per event_type; every split point scored in DECIMAL/HUGEINT
# floor-micro means, argmax on (shift DESC, bucket ASC)
# ---------------------------------------------------------------------------
@query(
    "events_changepoints",
    """
    WITH b AS (
      SELECT event_type AS key, epoch_us(ts) // 3600000000 AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ), w AS (
      SELECT key, x, y,
             row_number() OVER (PARTITION BY key ORDER BY x) AS rn,
             sum(y) OVER (PARTITION BY key ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             count(*) OVER (PARTITION BY key) AS nb,
             sum(y) OVER (PARTITION BY key) AS st
      FROM b
    ), sc AS (
      SELECT key, x, nb, st,
             (CAST(cum - y AS HUGEINT) * 1000000)
               // CAST(rn - 1 AS HUGEINT) AS before_m,
             ((CAST(st AS HUGEINT) - CAST(cum - y AS HUGEINT)) * 1000000)
               // CAST(nb - rn + 1 AS HUGEINT) AS after_m
      FROM w WHERE rn >= 2 AND nb >= 2
    ), p AS (
      SELECT key, x, nb, st, before_m, after_m,
             row_number() OVER (PARTITION BY key
                                ORDER BY abs(before_m - after_m) DESC, x ASC)
               AS pick
      FROM sc
    )
    SELECT key, CAST(nb AS BIGINT) AS n_buckets,
           CAST(st AS BIGINT) AS n_rows,
           make_timestamp(x * 3600000000) AS split_ts,
           CAST(before_m AS BIGINT) AS rate_before_micro,
           CAST(after_m AS BIGINT) AS rate_after_micro,
           CAST(abs(before_m - after_m) AS BIGINT) AS shift_micro
    FROM p WHERE pick = 1 ORDER BY key
    """,
)
def q_events_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.changepoint_report(
        ev, key_col="event_type", bucket_seconds=3600
    ).orderBy("key")


# ---------------------------------------------------------------------------
# Gini-Simpson diversity / effective-keys card: natural user_id
# distribution per event_type; all-polynomial DECIMAL/HUGEINT math
# (no entropy logs — cross-engine ulp drift would break floor parity)
# ---------------------------------------------------------------------------
@query(
    "events_diversity",
    """
    WITH c AS (
      SELECT event_type AS gtype, user_id AS k,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT gtype, CAST(sum(n) AS HUGEINT) AS nn,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS HUGEINT)
               AS sum2
      FROM c GROUP BY 1
    )
    SELECT gtype, CAST(nn AS BIGINT) AS n_rows, n_keys,
           CAST((nn * nn - sum2) * 1000000 // (nn * nn) AS BIGINT)
             AS simpson_micro,
           CAST(nn * nn * 1000000 // sum2 AS BIGINT)
             AS effective_keys_micro
    FROM m ORDER BY gtype
    """,
)
def q_events_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.diversity_report(ev).orderBy("gtype")


# ---------------------------------------------------------------------------
# NDCG@k: same probe/qrels construction as retrieval_eval_at_k; the
# 1/log2(r+1) discount table is computed ONCE in Python
# (retrieval.dcg_weights) and embedded as integer literals in BOTH
# engines, so no logarithm ever runs inside either engine
# ---------------------------------------------------------------------------
def _ndcg_oracle(k: int = 5, qmod: int = 97, qrem: int = 5) -> str:
    w, p = retrieval.dcg_weights(k)
    wl = "[" + ", ".join(map(str, w)) + "]"
    pl = "[" + ", ".join(map(str, p)) + "]"
    toks = SQL_TOKENS.format(col="lower(text)")
    return f"""
    WITH results AS ({_bm25_oracle(k)}), probes AS (
      SELECT doc_id AS query_id,
             array_to_string(({toks})[1:8], ' ') AS qtext
      FROM documents WHERE doc_id % {qmod} = {qrem}
    ), qrels AS (
      SELECT DISTINCT p.query_id, d.doc_id
      FROM documents d CROSS JOIN probes p
      WHERE position(p.qtext IN lower(d.text)) > 0
    ), marked AS (
      SELECT r.query_id, r.rank,
             CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM results r LEFT JOIN qrels q
        ON q.query_id = r.query_id AND q.doc_id = r.doc_id
      WHERE r.rank <= {k}
    ), per_q AS (
      SELECT query_id,
             CAST(sum(rel * ({wl})[rank]) AS BIGINT) AS dcg
      FROM marked GROUP BY query_id
    ), totals AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
      FROM qrels GROUP BY query_id
    )
    SELECT query_id,
           coalesce(n_rel, 0) AS n_rel,
           coalesce(dcg, 0) AS dcg_micro,
           CASE WHEN coalesce(n_rel, 0) > 0
                THEN CAST(({pl})[least(n_rel, {k})] AS BIGINT) END
             AS idcg_micro,
           CASE WHEN coalesce(n_rel, 0) > 0
                THEN CAST((1000000 * coalesce(dcg, 0))
                          // ({pl})[least(n_rel, {k})] AS BIGINT) END
             AS ndcg_micro
    FROM per_q FULL OUTER JOIN totals USING (query_id)
    ORDER BY query_id
    """


@query("retrieval_ndcg", _ndcg_oracle())
def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    probes = _bm25_probes(docs)
    results = retrieval.bm25_topk(docs, probes, k=5)
    qrels = (
        docs.crossJoin(F.broadcast(probes))
        .filter(F.instr(F.lower(F.col("text")), F.col("qtext")) > 0)
        .select("query_id", "doc_id")
    )
    return retrieval.ndcg_at_k(results, qrels, k=5).orderBy("query_id")


# ---------------------------------------------------------------------------
# l-diversity release card: QI = (user_id, event_type), sensitive =
# floor(value) % 5 derived deterministically on BOTH engines; natural
# group sizes put singleton groups below l and busy groups above
# ---------------------------------------------------------------------------
@query(
    "events_l_diversity",
    """
    WITH pairs AS (
      SELECT user_id, event_type,
             CAST(floor(value) AS BIGINT) % 5 AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    ), groups AS (
      SELECT user_id, event_type,
             CAST(sum(n) AS BIGINT) AS rows_,
             CAST(count(CASE WHEN s IS NOT NULL THEN 1 END) AS BIGINT)
               AS l
      FROM pairs GROUP BY 1, 2
    )
    SELECT CAST(sum(rows_) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weak_groups,
           CAST(sum(CASE WHEN l < 2 THEN rows_ ELSE 0 END) AS BIGINT)
             AS n_weak_rows,
           CAST((sum(CASE WHEN l < 2 THEN rows_ ELSE 0 END) * 1000000)
                // sum(rows_) AS BIGINT) AS weak_rows_micro,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(max(l) AS BIGINT) AS max_l
    FROM groups
    """,
)
def q_events_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "sens", F.floor(F.col("value")).cast("bigint") % 5
    )
    return analytics.l_diversity_report(
        ev, ["user_id", "event_type"], "sens", l=2
    )


# ---------------------------------------------------------------------------
# streaming outage twin — a gap emits when its CLOSING event arrives,
# so a full two-batch drain equals the batch card row-for-row (no
# withheld-trailing exclusion, unlike sessionize/retry-storm twins);
# the midpoint cut exercises a gap SPANNING the batch boundary
# ---------------------------------------------------------------------------
@query(
    "streaming_outage_windows",
    """
    WITH s AS (
      SELECT CAST(event_type AS VARCHAR) AS key, ts,
             lag(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
    )
    SELECT key, epoch_us(prev) AS gap_start_us, epoch_us(ts) AS gap_end_us,
           CAST(epoch_us(ts) // 1000000 - epoch_us(prev) // 1000000
                AS BIGINT) AS gap_sec
    FROM s
    WHERE epoch_us(ts) // 1000000 - epoch_us(prev) // 1000000 >= 7200
    ORDER BY key, gap_start_us, gap_end_us
    """,
)
def q_streaming_outage_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import streaming_outage_windows

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    out = _drain_two_batch_stream(
        spark,
        ev,
        "event_type string, ts timestamp",
        lambda s: streaming_outage_windows(
            s, "event_type", "ts", min_gap_seconds=7200
        ),
    )
    return out.orderBy("key", "gap_start_us", "gap_end_us")


# ---------------------------------------------------------------------------
# Apdex card: T = 10.0 over the natural value spread (0.01..490) —
# all three bands fire per event_type; exact (2*sat + tol) * 500 div n
# ---------------------------------------------------------------------------
@query(
    "events_apdex",
    """
    WITH a AS (
      SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value <= 10.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_satisfied,
             CAST(sum(CASE WHEN value > 10.0 AND value <= 40.0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT key, n, n_satisfied, n_tolerating,
           CAST(n - n_satisfied - n_tolerating AS BIGINT) AS n_frustrated,
           CAST((2 * n_satisfied + n_tolerating) * 500 // n AS BIGINT)
             AS apdex_milli
    FROM a ORDER BY key
    """,
)
def q_events_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.apdex_report(ev, threshold=10.0).orderBy("key")


# ---------------------------------------------------------------------------
# exponential (power-of-two) histogram: micro-scaled values bucketed
# by integer bit length — bin()-string length on BOTH engines, no
# libm log anywhere, so bucket edges cannot drift
# ---------------------------------------------------------------------------
@query(
    "events_exp_histogram",
    """
    WITH s AS (
      SELECT event_type AS key,
             CAST(floor(value * 1000000) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ), b AS (
      SELECT key,
             CAST(CASE WHEN v < 0 THEN -1 WHEN v = 0 THEN 0
                  ELSE length(bin(v)) END AS INT) AS bucket, v
      FROM s
    ), g AS (
      SELECT key, bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(min(v) AS BIGINT) AS min_scaled,
             CAST(max(v) AS BIGINT) AS max_scaled
      FROM b GROUP BY 1, 2
    )
    SELECT key, bucket,
           CAST(CASE WHEN bucket > 0 THEN (1::BIGINT << (bucket - 1))
                WHEN bucket = 0 THEN 0 END AS BIGINT) AS lo_scaled,
           n, min_scaled, max_scaled
    FROM g ORDER BY key, bucket
    """,
)
def q_events_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.exp_histogram(ev).orderBy("key", "bucket")


# ---------------------------------------------------------------------------
# MAD (median/MAD robust) outlier buckets: spike buckets are INJECTED
# on both engines — every row whose hour-bucket lands on % 500 == 123
# is replicated x19, so those buckets stand 20x over the median and
# only they flag at k = 5
# ---------------------------------------------------------------------------
@query(
    "events_mad_outliers",
    """
    WITH base AS (
      SELECT event_type, ts FROM events
      UNION ALL
      SELECT event_type, ts FROM events
      CROSS JOIN range(19)
      WHERE (epoch_us(ts) // 3600000000) % 500 = 123
    ), b AS (
      SELECT event_type AS key, epoch_us(ts) // 3600000000 AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM base WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ), w1 AS (
      SELECT key, x, y,
             count(*) OVER (PARTITION BY key) AS nb,
             row_number() OVER (PARTITION BY key ORDER BY y, x) AS ry
      FROM b
    ), w2 AS (
      SELECT key, x, y, nb,
             max(CASE WHEN ry = CAST(ceil(nb / 2.0) AS BIGINT) THEN y END)
               OVER (PARTITION BY key) AS med
      FROM w1
    ), w3 AS (
      SELECT key, x, y, nb, med, abs(y - med) AS dev,
             row_number() OVER (PARTITION BY key
                                ORDER BY abs(y - med), x) AS rd
      FROM w2
    ), w4 AS (
      SELECT key, x, y, med, dev,
             max(CASE WHEN rd = CAST(ceil(nb / 2.0) AS BIGINT) THEN dev END)
               OVER (PARTITION BY key) AS mad
      FROM w3
    )
    SELECT key, make_timestamp(x * 3600000000) AS bucket_ts,
           y AS n_events, med AS median, mad
    FROM w4 WHERE dev > 5 * greatest(mad, 1)
    ORDER BY key, bucket_ts
    """,
)
def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    bucket = F.expr("unix_micros(cast(ts as timestamp_ltz)) div 3600000000")
    spiked = ev.unionByName(
        ev.filter(bucket % 500 == 123)
        .withColumn("__r__", F.explode(F.array_repeat(F.lit(1), 19)))
        .drop("__r__")
    )
    return analytics.mad_outliers(
        spiked, key_col="event_type", bucket_seconds=3600, k=5
    ).orderBy("key", "bucket_ts")


# ---------------------------------------------------------------------------
# per-conversation structural balance card: natural transcript
# reshaping (no injection) — char shares and alternation both spread
# across the fixture's role mix
# ---------------------------------------------------------------------------
@query(
    "conv_turn_balance",
    f"""
    WITH t0 AS (
      {_TRANSCRIPT_SQL}
    ), s AS (
      SELECT conv_id,
             coalesce(CAST(turn_idx AS BIGINT), -1) AS idx,
             coalesce(role, '') AS role,
             CAST(length(coalesce(text, '')) AS BIGINT) AS ch,
             md5(coalesce(text, '')) AS d
      FROM t0
    ), l AS (
      SELECT conv_id, role, ch,
             lag(role) OVER (PARTITION BY conv_id ORDER BY idx, role, d)
               AS prev
      FROM s
    ), a AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
             CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_user_turns,
             CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_assistant_turns,
             CAST(sum(CASE WHEN role = 'user' THEN ch ELSE 0 END)
                  AS BIGINT) AS user_chars,
             CAST(sum(CASE WHEN role = 'assistant' THEN ch ELSE 0 END)
                  AS BIGINT) AS assistant_chars,
             CAST(sum(CASE WHEN prev IS NOT NULL AND role <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS alt
      FROM l GROUP BY conv_id
    )
    SELECT conv_id, n_turns, n_user_turns, n_assistant_turns,
           user_chars, assistant_chars,
           CASE WHEN user_chars + assistant_chars > 0
                THEN CAST(assistant_chars * 1000000
                          // (user_chars + assistant_chars) AS BIGINT) END
             AS assistant_char_share_micro,
           CASE WHEN n_turns > 1
                THEN CAST(alt * 1000000 // (n_turns - 1) AS BIGINT) END
             AS alternation_micro
    FROM a ORDER BY conv_id
    """,
)
def q_conv_turn_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _as_transcript(spark, sf_dir, inject=False)
    return conversations.turn_balance(t).orderBy("conv_id")


# ---------------------------------------------------------------------------
# Bloom-prefilter capacity audit: snapshot A = even doc_ids, B = odd;
# m deliberately TINY (512 bits, k=2) so measured false positives
# actually occur at bench scale; the hash family (salted md5-prefix
# ints) is shared verbatim between engines
# ---------------------------------------------------------------------------
def _bloom_audit_oracle(m: int = 512, k: int = 2) -> str:
    return f"""
    WITH a AS (
      SELECT DISTINCT md5(text) AS d FROM documents
      WHERE doc_id % 2 = 0 AND text IS NOT NULL
    ), b AS (
      SELECT DISTINCT md5(text) AS d FROM documents
      WHERE doc_id % 2 = 1 AND text IS NOT NULL
    ), salts AS (
      SELECT unnest(range({k})) AS i
    ), apos AS (
      SELECT DISTINCT
        ('0x' || substr(md5(i || ':' || d), 1, 15))::BIGINT % {m} AS pos
      FROM a CROSS JOIN salts
    ), bpos AS (
      SELECT d,
        ('0x' || substr(md5(i || ':' || d), 1, 15))::BIGINT % {m} AS pos
      FROM b CROSS JOIN salts
    ), probe AS (
      SELECT bpos.d,
             CAST(count(*) AS BIGINT) AS kk,
             CAST(sum(CASE WHEN apos.pos IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits
      FROM bpos LEFT JOIN apos USING (pos) GROUP BY 1
    ), audited AS (
      SELECT probe.d, (hits = kk) AS pos_,
             (a.d IS NOT NULL) AS in_a
      FROM probe LEFT JOIN a USING (d)
    ), c AS (
      SELECT CAST(count(*) AS BIGINT) AS n_b_digests,
             CAST(sum(CASE WHEN pos_ THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_positive,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_dups,
             CAST(sum(CASE WHEN pos_ AND NOT in_a THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_false_positives
      FROM audited
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a_digests,
           n_b_digests,
           (SELECT CAST(count(*) AS BIGINT) FROM apos) AS n_bits_set,
           CAST((SELECT count(*) FROM apos) * 1000000 // {m} AS BIGINT)
             AS fill_micro,
           n_bloom_positive, n_true_dups, n_false_positives,
           CASE WHEN n_b_digests > n_true_dups
                THEN CAST(n_false_positives * 1000000
                          // (n_b_digests - n_true_dups) AS BIGINT) END
             AS fp_micro
    FROM c
    """


@query("dedup_bloom_audit", _bloom_audit_oracle())
def q_dedup_bloom_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    snap_a = docs.filter(F.col("doc_id") % 2 == 0)
    snap_b = docs.filter(F.col("doc_id") % 2 == 1)
    return dedup.bloom_audit(snap_a, snap_b, m_bits=512, k_hashes=2)


# ---------------------------------------------------------------------------
# funnel step-latency card: same strict-sequence levels as
# events_funnel (view -> click -> purchase), exact epoch-micro gaps,
# nearest-rank medians; natural fixture — both steps convert
# ---------------------------------------------------------------------------
@query(
    "events_funnel_latency",
    """
    WITH l1 AS (
      SELECT user_id AS u, min(epoch_us(ts)) AS r FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), l2 AS (
      SELECT e.user_id AS u, min(epoch_us(e.ts)) AS r
      FROM events e JOIN l1 ON e.user_id = l1.u
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > l1.r
      GROUP BY 1
    ), l3 AS (
      SELECT e.user_id AS u, min(epoch_us(e.ts)) AS r
      FROM events e JOIN l2 ON e.user_id = l2.u
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > l2.r
      GROUP BY 1
    ), gaps AS (
      SELECT 2 AS step_idx, l2.u, l2.r - l1.r AS gap
      FROM l2 JOIN l1 USING (u)
      UNION ALL
      SELECT 3 AS step_idx, l3.u, l3.r - l2.r AS gap
      FROM l3 JOIN l2 USING (u)
    ), ranked AS (
      SELECT step_idx, gap,
             count(*) OVER (PARTITION BY step_idx) AS n,
             row_number() OVER (PARTITION BY step_idx ORDER BY gap, u)
               AS rn
      FROM gaps
    ), agg AS (
      SELECT step_idx, CAST(count(*) AS BIGINT) AS n_users,
             CAST(max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT)
                           THEN gap END) AS BIGINT) AS median_gap_us,
             CAST(max(gap) AS BIGINT) AS max_gap_us
      FROM ranked GROUP BY 1
    )
    SELECT s.step_idx, s.step,
           CAST(coalesce(a.n_users, 0) AS BIGINT) AS n_users,
           a.median_gap_us, a.max_gap_us
    FROM (VALUES (2, 'click'), (3, 'purchase')) AS s(step_idx, step)
    LEFT JOIN agg a USING (step_idx)
    ORDER BY s.step_idx
    """,
)
def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.funnel_latency(ev, _FUNNEL_STEPS)


# ---------------------------------------------------------------------------
# pairwise source vocabulary overlap: natural fixture (5 sources,
# shared corpus language => every pair has a nonzero Jaccard);
# min_df = 2 exercises the hapax cut on both engines
# ---------------------------------------------------------------------------
@query(
    "corpus_source_overlap",
    f"""
    WITH vt AS (
      SELECT source AS src,
             unnest(list_distinct({SQL_TOKENS.format(col="lower(text)")}))
               AS tok
      FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
    ), vocab AS (
      SELECT src, tok FROM vt GROUP BY src, tok HAVING count(*) >= 2
    ), sizes AS (
      SELECT src, CAST(count(*) AS BIGINT) AS vocab FROM vocab GROUP BY 1
    ), shared AS (
      SELECT l.src AS a, r.src AS b, CAST(count(*) AS BIGINT) AS n_shared
      FROM vocab l JOIN vocab r ON l.tok = r.tok AND l.src < r.src
      GROUP BY 1, 2
    )
    SELECT a AS source_a, b AS source_b,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b, n_shared,
           CAST(n_shared * 1000000
                // (sa.vocab + sb.vocab - n_shared) AS BIGINT)
             AS jaccard_micro
    FROM shared
    JOIN sizes sa ON sa.src = a
    JOIN sizes sb ON sb.src = b
    ORDER BY source_a, source_b
    """,
)
def q_corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.source_overlap(docs, min_df=2).orderBy(
        "source_a", "source_b"
    )


# ---------------------------------------------------------------------------
# Z-order layout audit: natural (time-sorted) layout vs Morton order
# over (event_id, user_id) on an 8-bit grid, 32 file-sized groups;
# the Morton bit-interleave formula is generated once and shared
# structurally with plans/zorder.morton_interleave
# ---------------------------------------------------------------------------
def _morton_sql(xb: str, yb: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def _zorder_oracle(bits: int = 8, n_files: int = 32) -> str:
    top = (1 << bits) - 1
    grid = 1 << bits
    return f"""
    WITH slim AS (
      SELECT CAST(event_id AS BIGINT) AS x, CAST(user_id AS BIGINT) AS y
      FROM events WHERE event_id IS NOT NULL AND user_id IS NOT NULL
    ), mm AS (
      SELECT min(x) AS lx, max(x) AS hx, min(y) AS ly, max(y) AS hy
      FROM slim
    ), b AS (
      SELECT
        CASE WHEN hx > lx THEN (x - lx) * {top} // (hx - lx)
             ELSE 0 END AS xb,
        CASE WHEN hy > ly THEN (y - ly) * {top} // (hy - ly)
             ELSE 0 END AS yb
      FROM slim CROSS JOIN mm
    ), zt AS (
      SELECT xb, yb, {_morton_sql("xb", "yb", bits)} AS zv FROM b
    ), nat AS (
      SELECT xb, yb, ntile({n_files}) OVER (ORDER BY xb, yb) AS f FROM zt
    ), zo AS (
      SELECT xb, yb, ntile({n_files}) OVER (ORDER BY zv, xb, yb) AS f
      FROM zt
    ), nsp AS (
      SELECT f, max(xb) - min(xb) + 1 AS sx, max(yb) - min(yb) + 1 AS sy
      FROM nat GROUP BY f
    ), zsp AS (
      SELECT f, max(xb) - min(xb) + 1 AS sx, max(yb) - min(yb) + 1 AS sy
      FROM zo GROUP BY f
    )
    SELECT layout, dim, n_files, avg_span_micro FROM (
      SELECT 'natural' AS layout, 'event_id' AS dim,
             CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(sx) * 1000000 // (count(*) * {grid}) AS BIGINT)
               AS avg_span_micro
      FROM nsp
      UNION ALL
      SELECT 'natural', 'user_id', CAST(count(*) AS BIGINT),
             CAST(sum(sy) * 1000000 // (count(*) * {grid}) AS BIGINT)
      FROM nsp
      UNION ALL
      SELECT 'zorder', 'event_id', CAST(count(*) AS BIGINT),
             CAST(sum(sx) * 1000000 // (count(*) * {grid}) AS BIGINT)
      FROM zsp
      UNION ALL
      SELECT 'zorder', 'user_id', CAST(count(*) AS BIGINT),
             CAST(sum(sy) * 1000000 // (count(*) * {grid}) AS BIGINT)
      FROM zsp
    ) ORDER BY layout, dim
    """


@query("plans_zorder_audit", _zorder_oracle())
def q_plans_zorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans.zorder import zorder_audit

    ev = _t(spark, sf_dir, "events")
    return zorder_audit(
        ev, "event_id", "user_id", n_files=32, bits=8
    ).orderBy("layout", "dim")


# ---------------------------------------------------------------------------
# last-touch attribution: natural fixture (clicks/views interleave
# purchases per user; 1-day lookback leaves some purchases 'direct');
# the running last-touch key is a fixed-width sortable string on BOTH
# engines — string max is a portable contract, struct max is not
# ---------------------------------------------------------------------------
@query(
    "events_attribution",
    """
    WITH slim AS (
      SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us,
             CAST(event_id AS BIGINT) AS ord
      FROM events
      WHERE event_type IN ('purchase', 'click', 'view')
        AND ts IS NOT NULL AND user_id IS NOT NULL
    ), keyed AS (
      SELECT u, t, us, ord,
             max(CASE WHEN t <> 'purchase'
                      THEN printf('%020d|%020d|%s',
                                  us + (1::BIGINT << 62),
                                  ord + (1::BIGINT << 62), t) END)
               OVER (PARTITION BY u ORDER BY us, ord
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lastk
      FROM slim
    ), conv AS (
      SELECT u, us,
             CASE WHEN lastk IS NOT NULL
                       AND us - (CAST(substr(lastk, 1, 20) AS BIGINT)
                                 - (1::BIGINT << 62)) <= 86400000000
                  THEN substr(lastk, 43) ELSE 'direct' END AS channel,
             CASE WHEN lastk IS NOT NULL
                       AND us - (CAST(substr(lastk, 1, 20) AS BIGINT)
                                 - (1::BIGINT << 62)) <= 86400000000
                  THEN us - (CAST(substr(lastk, 1, 20) AS BIGINT)
                             - (1::BIGINT << 62)) END AS gap
      FROM keyed WHERE t = 'purchase'
    ), ranked AS (
      SELECT channel, gap, u, us,
             count(gap) OVER (PARTITION BY channel) AS n,
             row_number() OVER (PARTITION BY channel
                                ORDER BY gap, u, us) AS rn
      FROM conv
    ), agg AS (
      SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
             CAST(max(CASE WHEN gap IS NOT NULL
                            AND rn = CAST(ceil(n / 2.0) AS BIGINT)
                           THEN gap END) AS BIGINT) AS median_gap_us,
             CAST(max(gap) AS BIGINT) AS max_gap_us
      FROM ranked GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS tt FROM conv
    )
    SELECT channel, n_conversions,
           CAST(n_conversions * 1000000 // tt AS BIGINT) AS share_micro,
           CAST(coalesce(median_gap_us, -1) AS BIGINT) AS median_gap_us,
           CAST(coalesce(max_gap_us, -1) AS BIGINT) AS max_gap_us
    FROM agg CROSS JOIN tot ORDER BY channel
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = analytics.attribution_report(ev, lookback_sec=86_400)
    # -1 sentinel for the 'direct' channel's undefined gaps (the
    # pandas nullable-int stringification caveat, as eval_at_k)
    return out.select(
        "channel",
        "n_conversions",
        "share_micro",
        F.coalesce("median_gap_us", F.lit(-1))
        .cast("bigint")
        .alias("median_gap_us"),
        F.coalesce("max_gap_us", F.lit(-1))
        .cast("bigint")
        .alias("max_gap_us"),
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# inter-arrival gap histogram (pow2 microsecond bands) — the card
# that should SET sessionize/outage/retry window thresholds; same
# bit-length band rule as events_exp_histogram
# ---------------------------------------------------------------------------
@query(
    "events_gap_histogram",
    """
    WITH s AS (
      SELECT event_type AS key, epoch_us(ts) AS us, event_id AS ord
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    ), g AS (
      SELECT key,
             us - lag(us) OVER (PARTITION BY key ORDER BY us, ord) AS gap
      FROM s
    ), b AS (
      SELECT key,
             CAST(CASE WHEN gap = 0 THEN 0
                  ELSE length(bin(gap)) END AS INT) AS bucket, gap
      FROM g WHERE gap IS NOT NULL
    ), a AS (
      SELECT key, bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(min(gap) AS BIGINT) AS min_gap_us,
             CAST(max(gap) AS BIGINT) AS max_gap_us
      FROM b GROUP BY 1, 2
    )
    SELECT key, bucket,
           CAST(CASE WHEN bucket > 0 THEN (1::BIGINT << (bucket - 1))
                WHEN bucket = 0 THEN 0 END AS BIGINT) AS lo_us,
           n, min_gap_us, max_gap_us
    FROM a ORDER BY key, bucket
    """,
)
def q_events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.gap_histogram(ev).orderBy("key", "bucket")


# ---------------------------------------------------------------------------
# vocabulary-growth (Heaps) curve: 10 checkpoints over doc_id rank;
# token first-seen rank maps to its checkpoint by pure integer math
# ---------------------------------------------------------------------------
@query(
    "corpus_vocab_growth",
    f"""
    WITH docs AS (
      SELECT doc_id, text,
             row_number() OVER (ORDER BY doc_id) AS rnk
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS nd FROM docs
    ), fs AS (
      SELECT tok, min(rnk) AS fsr FROM (
        SELECT rnk,
               unnest(list_distinct({SQL_TOKENS.format(col="lower(text)")}))
                 AS tok
        FROM docs
      ) GROUP BY tok
    ), per_step AS (
      SELECT CAST((CAST(fsr AS BIGINT) - 1) * 10 // nd + 1 AS INT) AS step,
             CAST(count(*) AS BIGINT) AS new_tokens
      FROM fs CROSS JOIN n GROUP BY 1
    ), grid AS (
      SELECT unnest(range(1, 11)) AS step
    )
    SELECT CAST(g.step AS INT) AS step,
           CAST((g.step * nd + 9) // 10 AS BIGINT) AS n_docs_prefix,
           CAST(coalesce(p.new_tokens, 0) AS BIGINT) AS new_tokens,
           CAST(sum(coalesce(p.new_tokens, 0))
                OVER (ORDER BY g.step
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS vocab_size
    FROM grid g CROSS JOIN n LEFT JOIN per_step p ON p.step = g.step
    ORDER BY step
    """,
)
def q_corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.vocab_growth(docs, n_steps=10).orderBy("step")


# ---------------------------------------------------------------------------
# keep-BEST cluster representatives: shared CC closure (_cc_cte) +
# shared quality formula (_QUALITY_FEAT_COLS_SQL/_QUALITY_Q_SQL) —
# neither construction can drift from its sibling oracles
# ---------------------------------------------------------------------------
def _cluster_reps_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_cte()}, qtoks AS (
      SELECT doc_id, text, {SQL_TOKENS.format(col="text")} AS w
      FROM documents
    ), qfeat AS (
      SELECT doc_id, {_QUALITY_FEAT_COLS_SQL}
      FROM qtoks
    ), scored AS (
      SELECT doc_id, CAST({_QUALITY_Q_SQL} AS BIGINT) AS q FROM qfeat
    ), members AS (
      SELECT c.id AS member_id, c.comp, s.q
      FROM ccomp c JOIN scored s ON s.doc_id = c.id
    ), ranked AS (
      SELECT comp, member_id, q,
             row_number() OVER (PARTITION BY comp
                                ORDER BY q DESC, member_id) AS rn
      FROM members
    )
    SELECT comp AS cluster_id,
           CAST(max(CASE WHEN rn = 1 THEN member_id END) AS BIGINT)
             AS keep_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(CASE WHEN rn = 1 THEN q END) AS BIGINT)
             AS best_quality_micro
    FROM ranked GROUP BY comp ORDER BY cluster_id
    """


@query("dedup_cluster_reps", _cluster_reps_oracle())
def q_dedup_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = dedup.minhash_candidate_pairs(docs)
    return dedup.cluster_representatives(docs, pairs).orderBy("cluster_id")


# ---------------------------------------------------------------------------
# per-user lifecycle card: natural fixture; floor-second lifetime,
# UTC active days, exact events-per-day micro
# ---------------------------------------------------------------------------
@query(
    "events_user_lifetime",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
           CAST(max(epoch_us(ts)) // 1000000
                - min(epoch_us(ts)) // 1000000 AS BIGINT) AS lifetime_sec,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
           CAST(count(*) * 1000000
                // count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
             AS events_per_day_micro
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def q_events_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return analytics.user_lifetime(ev).orderBy("user_id")
