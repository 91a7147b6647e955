"""Semantic tests for URL canonicalization, URL-level dedup, and
domain blocklist filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from ilogtail_spark.dataops import urlops


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"] for r in df.select(urlops.normalize_url(F.col("url")).alias("n")).collect()
    ]


class TestNormalizeUrl:
    def test_case_port_www_fragment(self, spark):
        out = _norm(
            spark,
            [
                "HTTPS://WWW.Example.COM:443/Path/To/Page#frag",
                "https://example.com/Path/To/Page",
            ],
        )
        assert out[0] == out[1] == "https://example.com/Path/To/Page"

    def test_path_case_preserved_host_lowered(self, spark):
        (out,) = _norm(spark, ["http://HOST.com/CaseSensitive"])
        assert out == "http://host.com/CaseSensitive"

    def test_non_default_port_kept(self, spark):
        a, b = _norm(spark, ["http://x.com:8080/a", "https://x.com:80/a"])
        assert a == "http://x.com:8080/a"
        assert b == "https://x.com:80/a"  # :80 is NOT the https default

    def test_tracking_params_dropped_rest_sorted(self, spark):
        (out,) = _norm(
            spark, ["http://a.com/p?utm_source=x&b=2&a=1&fbclid=zz&ref=tw"]
        )
        assert out == "http://a.com/p?a=1&b=2"

    def test_empty_query_and_trailing_slash(self, spark):
        out = _norm(
            spark,
            ["http://a.com/p/?utm_source=x", "http://a.com/p", "http://a.com"],
        )
        assert out[0] == out[1] == "http://a.com/p"
        assert out[2] == "http://a.com/"

    def test_missing_scheme_defaults_http(self, spark):
        (out,) = _norm(spark, ["www.a.com/x"])
        assert out == "http://a.com/x"

    def test_root_slash_not_stripped(self, spark):
        (out,) = _norm(spark, ["http://a.com/"])
        assert out == "http://a.com/"


class TestRegisteredDomain:
    def test_etld_plus_one(self, spark):
        df = spark.createDataFrame(
            [
                ("https://news.bbc.co.uk/story",),
                ("http://www.example.com/a",),
                ("http://deep.sub.domain.example.org",),
                ("localhost",),
            ],
            "url string",
        )
        out = [
            r["d"]
            for r in df.select(
                urlops.registered_domain(F.col("url")).alias("d")
            ).collect()
        ]
        assert out == ["bbc.co.uk", "example.com", "example.org", "localhost"]


class TestDedupAndBlocklist:
    def test_keep_min_id_per_canonical_url(self, spark):
        df = spark.createDataFrame(
            [
                (1, "HTTP://A.com/x?utm_source=1"),
                (2, "http://a.com/x"),
                (3, "http://a.com/y"),
            ],
            "doc_id long, url string",
        )
        kept = sorted(
            r["doc_id"] for r in urlops.drop_url_duplicates(df).collect()
        )
        assert kept == [1, 3]

    def test_blocklist_drops_whole_domain(self, spark):
        df = spark.createDataFrame(
            [
                (1, "http://spam.bad.com/x"),
                (2, "http://ok.com/x"),
                (3, "https://www.bad.com/y"),
            ],
            "doc_id long, url string",
        )
        bl = spark.createDataFrame([("bad.com",)], "domain string")
        kept = [
            r["doc_id"]
            for r in urlops.domain_blocklist_filter(df, bl).collect()
        ]
        assert kept == [2]
        # original columns survive, domain col does not leak
        assert set(urlops.domain_blocklist_filter(df, bl).columns) == {
            "doc_id",
            "url",
        }


class TestReviewRegressions:
    def test_null_urls_are_all_kept(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "http://a.com/x"), (4, "http://A.com/x/")],
            "doc_id long, url string",
        )
        kept = sorted(r["doc_id"] for r in urlops.drop_url_duplicates(df).collect())
        assert kept == [1, 2, 3]

    def test_blocklist_preserves_existing_domain_column(self, spark):
        df = spark.createDataFrame(
            [(1, "http://bad.com/x", "precomputed"), (2, "http://ok.com/x", "precomputed")],
            "doc_id long, url string, domain string",
        )
        bl = spark.createDataFrame([("bad.com",)], "blocked string")
        out = urlops.domain_blocklist_filter(df, bl).collect()
        assert len(out) == 1
        assert out[0]["doc_id"] == 2 and out[0]["domain"] == "precomputed"
