"""URL normalization / domain operators: literal expectations."""

from pyspark.sql import functions as F

from opentopodata_spark.operators.urlops import (
    blocklist_filter,
    domain_stats,
    normalize_url,
    registrable_domain,
    url_parts,
)


def _norm(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.n for r in df.select(normalize_url(F.col("url"), **kw).alias("n")).collect()]


def test_normalize_case_port_fragment(spark):
    got = _norm(spark, [
        "HTTPS://Example.COM:443/Path/To/Page#frag",
        "http://example.com:80/",
        "http://example.com:8080/x",
        "https://user:pw@example.com/x",
    ])
    assert got == [
        "https://example.com/Path/To/Page",   # scheme+host lowered, :443 dropped, path case kept
        "http://example.com/",
        "http://example.com:8080/x",          # non-default port kept
        "https://example.com/x",              # userinfo dropped
    ]


def test_normalize_query_and_www(spark):
    got = _norm(spark, [
        "http://www.example.com/a?utm_source=tw&z=1&a=2&fbclid=abc",
        "http://example.com/a?a=2&z=1",
        "http://example.com/a?utm_campaign=x",
        "http://example.com/a/",
        "http://example.com",
    ])
    assert got == [
        "http://example.com/a?a=2&z=1",   # trackers dropped, params sorted
        "http://example.com/a?a=2&z=1",   # same page, same canonical form
        "http://example.com/a",           # all-tracker query vanishes
        "http://example.com/a",           # trailing slash trimmed
        "http://example.com/",            # empty path -> /
    ]
    kept_www = _norm(spark, ["http://www.example.com/a"], strip_www=False)
    assert kept_www == ["http://www.example.com/a"]


def test_url_parts_ipv6_untouched(spark):
    df = spark.createDataFrame([("http://[::1]:8080/x",)], "url string")
    p = df.select(url_parts(F.col("url")).alias("p")).collect()[0].p
    assert p.host == "[::1]:8080"  # bracket literals not split (documented scope)
    assert p.path == "/x"


def test_registrable_domain(spark):
    rows = [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("shop.example.com.au", "example.com.au"),
        ("co.uk", "co.uk"),  # bare suffix: nothing above it to keep
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "host string")
    got = [r.d for r in df.select(registrable_domain(F.col("host")).alias("d")).collect()]
    assert got == [want for _, want in rows]


def test_domain_stats_counts_normalized_urls(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://www.example.com/a?utm_source=x", "aaaa"),
            (2, "http://example.com/a", "bb"),             # same page as 1
            (3, "http://example.com/b", "c"),
            (4, "http://news.bbc.co.uk/x", "dd"),
        ],
        "doc_id long, url string, text string",
    )
    got = {r.domain: (r.n_docs, r.n_urls, r.total_chars)
           for r in domain_stats(docs).collect()}
    assert got == {"example.com": (3, 2, 7), "bbc.co.uk": (1, 1, 2)}


def test_blocklist_filter(spark):
    docs = spark.createDataFrame(
        [
            (1, "http://spam.bad-site.net/x"),
            (2, "http://example.com/ok"),
            (3, "http://sub.bad-site.net:8080/y?q=1"),
        ],
        "doc_id long, url string",
    )
    kept = {r.doc_id for r in blocklist_filter(docs, ["bad-site.net"]).collect()}
    assert kept == {2}
    # DataFrame blocklist form
    bl = spark.createDataFrame([("bad-site.net",)], "domain string")
    kept2 = {r.doc_id for r in blocklist_filter(docs, bl).collect()}
    assert kept2 == {2}
    # schema preserved (no helper column leaks)
    assert blocklist_filter(docs, ["x.com"]).columns == ["doc_id", "url"]


def test_no_python_udfs(spark):
    docs = spark.createDataFrame([(1, "http://a.com/x", "t")],
                                 "doc_id long, url string, text string")
    plan = domain_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_normalize_idempotent_on_adversarial_corpus(spark):
    """normalize(normalize(u)) == normalize(u): canonical forms are fixed
    points, over a generated corpus of scheme/case/port/userinfo/param/
    fragment/suffix combinations."""
    import itertools

    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["Example.COM", "www.news.co.uk", "a.b.c.example.com.au",
             "localhost", "[::1]", "www.x"]
    ports = ["", ":80", ":443", ":8080"]
    userinfos = ["", "user@", "u:p@"]
    paths = ["", "/", "/a//b/", "/A/b"]
    queries = ["", "?utm_source=x", "?z=1&a=2&utm_b=c", "?a", "?=v", "?a&&b=1"]
    frags = ["", "#f"]
    urls = [
        f"{s}://{u}{h}{po}{pa}{q}{fr}"
        for s, u, h, po, pa, q, fr in itertools.islice(
            itertools.product(schemes, userinfos, hosts, ports, paths,
                              queries, frags),
            0, None, 7,  # stride to ~900 combos
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = (
        df.select("url", normalize_url(F.col("url")).alias("n1"))
        .select("url", "n1", normalize_url(F.col("n1")).alias("n2"))
        .collect()
    )
    bad = [(r.url, r.n1, r.n2) for r in rows if r.n1 != r.n2]
    assert not bad, bad[:5]
