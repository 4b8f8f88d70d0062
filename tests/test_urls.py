"""Hand-case tests for the URL/domain operator family
(operators/urls.py — VERDICT r11 #3)."""

from bht_etl_app_spark.operators.urls import (
    domain_blocklist_filter,
    url_canonical_dedup,
    url_parse,
)


def _parse(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {r["doc_id"]: r.asDict() for r in url_parse(df).collect()}


def test_canonicalization_rules(spark):
    got = _parse(spark, [
        "HTTPS://Example.COM:443/p/1?utm_source=feed&id=2#frag",
        "http://www.Example.com:80/",
        "https://example.com/p/1?id=2&utm_campaign=x&ref=tw",
        "http://example.com:8080/a?fbclid=z&x=1&gclid=q",
        "https://user:pw@Example.com/a",
        "not a url",
        "https://example.com/?utm_source=a",
        "https://example.com/p?debug",
    ])
    # scheme+host lowercased, default port stripped, tracking param
    # dropped (survivor order preserved), fragment dropped
    assert got[0]["canonical_url"] == "https://example.com/p/1?id=2"
    assert got[0]["scheme"] == "https" and got[0]["host"] == "example.com"
    # bare root path drops; :80 default for http strips; www stays in
    # host but not in registered_domain
    assert got[1]["canonical_url"] == "http://www.example.com"
    assert got[1]["registered_domain"] == "example.com"
    # trailing tracking params strip cleanly (no dangling & or ?)
    assert got[2]["canonical_url"] == "https://example.com/p/1?id=2"
    # NON-default port survives; mid-query tracking removal keeps x=1
    assert got[3]["canonical_url"] == "http://example.com:8080/a?x=1"
    # userinfo dropped
    assert got[4]["canonical_url"] == "https://example.com/a"
    assert got[4]["host"] == "example.com"
    # unparseable -> NULL canonical, '' host
    assert got[5]["canonical_url"] is None and got[5]["host"] == ""
    # all-tracking query -> no '?' at all (root path also drops)
    assert got[6]["canonical_url"] == "https://example.com"
    # valueless params are not tracking-matched (needs '=')
    assert got[7]["canonical_url"] == "https://example.com/p?debug"


def test_registered_domain_psl_lite(spark):
    got = _parse(spark, [
        "https://a.b.news.example.co.uk/x",
        "https://shop.example.com.au/",
        "https://www.example.com/",
        "https://localhost/x",
        "https://sub.deep.example.org/",
    ])
    assert got[0]["registered_domain"] == "example.co.uk"
    assert got[1]["registered_domain"] == "example.com.au"
    assert got[2]["registered_domain"] == "example.com"
    # dotless host returns itself
    assert got[3]["registered_domain"] == "localhost"
    assert got[4]["registered_domain"] == "example.org"


def test_url_canonical_dedup_groups(spark):
    rows = [
        (1, "https://Example.com:443/p?utm_source=a"),
        (2, "https://example.com/p"),          # same canonical as 1
        (3, "https://example.com/p?id=1"),     # distinct
        (4, "garbage"),                        # own group (raw key)
        (5, "also garbage"),                   # own group, NOT merged
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r.asDict() for r in url_canonical_dedup(df).collect()}
    assert set(got) == {1, 3, 4, 5}
    assert got[1]["group_size"] == 2
    assert got[1]["canonical_url"] == "https://example.com/p"
    assert got[3]["group_size"] == 1
    assert got[4]["group_size"] == 1 and got[5]["group_size"] == 1


def test_curate_corpus_url_pre_stage(spark):
    """The URL stage composes FIRST in curate_corpus: a blocklisted
    doc drops as url_blocked (even though its text would also fail
    quality), a canonical-duplicate non-representative drops as
    url_dup BEFORE any text stage sees it, and URL survivors flow
    into the text chain unchanged."""
    from bht_etl_app_spark.operators.corpus import curate_corpus

    good = " ".join(f"w{i}" for i in range(25))
    rows = [
        (1, good, "https://example.com/a"),
        (2, good + " extra", "https://Example.com:443/a?utm_source=x"),
        (3, "short", "https://spam.net/x"),          # blocked first
        (4, "short", "https://example.com/b"),       # quality drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    bench = spark.createDataFrame(
        [(100, "completely unrelated benchmark words")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["verdict"]
        for r in curate_corpus(
            df, bench, url_col="url", url_blocklist=["spam.net"]
        ).collect()
    }
    # doc 2's canonical equals doc 1's -> keep-min keeps 1
    assert got[2] == "url_dup"
    assert got[3] == "url_blocked"
    assert got[4] == "quality"
    assert got[1] == "kept"
    assert len(got) == 4  # every input doc has exactly one verdict


def test_domain_blocklist_filter_list_and_frame(spark):
    rows = [
        (1, "https://a.b.spam.net/x"),
        (2, "https://www.example.com/x"),
        (3, "https://tracker.io/y"),
        (4, "broken"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r.asDict()
        for r in domain_blocklist_filter(
            df, ["Spam.net", "tracker.io"]
        ).collect()
    }
    # subdomain blocked via registered domain; case-insensitive list
    assert got[1]["blocked"] is True
    assert got[1]["registered_domain"] == "spam.net"
    assert got[2]["blocked"] is False
    assert got[3]["blocked"] is True
    assert got[4]["blocked"] is False and got[4]["registered_domain"] == ""
    # DataFrame blocklist (broadcast join path) agrees exactly
    bl = spark.createDataFrame(
        [("spam.net",), ("tracker.io",)], "domain string"
    )
    got_df = {
        r["doc_id"]: r["blocked"]
        for r in domain_blocklist_filter(df, bl).collect()
    }
    assert got_df == {k: v["blocked"] for k, v in got.items()}
    # empty list blocks nothing
    none = domain_blocklist_filter(df, [])
    assert all(not r["blocked"] for r in none.collect())
