"""URL hygiene for web-scale corpus builds: canonicalization,
URL-level dedup, and domain blocklist filtering — the steps a
CCNet / RefinedWeb-style pipeline runs before any content dedup
(a third of raw web crawl rows are re-fetches of the same URL with
different tracking params / casing / fragments).

Everything is a pure Column expression chain (regexp extract /
replace, array filter+sort) — scan-side, codegen'd, zero Python, no
shuffle except the keep-min-id window of ``drop_url_duplicates``
which carries only (id, url_hash) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# query params that never change content identity
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|ref_src|mc_cid|mc_eid)(=.*)?$"

# cc-style second-level suffixes where the registered domain is the
# LAST THREE labels (approximation of the public-suffix list; swap in
# the full PSL as a broadcast table for production crawls)
CC_SLD_SUFFIXES = [
    "co.uk", "ac.uk", "org.uk", "gov.uk", "co.jp", "com.au", "net.au",
    "com.br", "co.in", "com.cn", "com.mx", "co.kr", "com.tw", "co.za",
]


def _norm_path(pathq: Column) -> Column:
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    trimmed = F.regexp_replace(path, r"/$", "")
    return F.when(path == "", F.lit("/")).otherwise(
        F.when((F.length(path) > 1) & path.endswith("/"), trimmed).otherwise(path)
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL form:

    * strip surrounding whitespace and the ``#fragment``
    * lowercase scheme and host; default scheme ``http`` when absent
    * drop a leading ``www.`` label and the scheme-default port
      (``:80`` for http, ``:443`` for https)
    * drop tracking query params (``TRACKING_PARAM_RE``), sort the
      surviving params byte-wise, drop a now-empty ``?``
    * strip a trailing ``/`` from a non-root path; empty path -> ``/``
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme_raw = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    scheme = F.when(scheme_raw == "", F.lit("http")).otherwise(F.lower(scheme_raw))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = _norm_path(pathq)
    qs = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, query)


def registered_domain(url: Column) -> Column:
    """eTLD+1 approximation from a URL or bare host: the last two
    host labels, or the last three when the last two are a known
    cc-second-level suffix (``CC_SLD_SUFFIXES``)."""
    u = F.regexp_replace(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(u, r"^([^/:?#]*)", 1))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, n - 1), F.try_element_at(labels, n)
    )
    last3 = F.concat_ws(
        ".", F.try_element_at(labels, n - 2), F.try_element_at(labels, n - 1),
        F.try_element_at(labels, n),
    )
    cc = last2.isin(*CC_SLD_SUFFIXES)
    return F.when(n <= 2, host).otherwise(F.when(cc, last3).otherwise(last2))


def drop_url_duplicates(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per CANONICAL url. One full-row shuffle,
    hash-partitioned by the 16-byte url digest (rows move exactly once,
    same shape as dedup.drop_exact_duplicates); the keep decision
    compares only digests and ids. Rows with a NULL url are all kept —
    a missing url is not evidence of duplication."""
    key = F.when(
        F.col(url_col).isNotNull(), F.md5(normalize_url(F.col(url_col)))
    ).otherwise(F.concat(F.lit("\x00null\x00"), F.col(id_col).cast("string")))
    w = Window.partitionBy(key).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocklist``
    (a one-column table of domains, any column name). Broadcast LEFT
    ANTI join — the blocklist is small (curated), the corpus side
    never shuffles. The join key lives in a private ``__domain__``
    column so a caller's own ``domain`` column is untouched."""
    bl = blocklist.select(F.col(blocklist.columns[0]).alias("__domain__"))
    tagged = df.withColumn("__domain__", registered_domain(F.col(url_col)))
    return tagged.join(F.broadcast(bl), "__domain__", "left_anti").drop(
        "__domain__"
    )
