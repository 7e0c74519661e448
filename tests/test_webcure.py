"""URL curation family (functions/webcure.py): normalization,
registered-domain heuristic, blocklists, per-domain caps, URL dedup.

No counterpart in the reference (no URL handling in /root/reference/src);
north-star extension per SURVEY §2.8.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark.functions.webcure import (
    domain_filter,
    normalize_url,
    per_domain_cap,
    registered_domain,
    url_dedup,
    url_host,
)


@pytest.fixture()
def urls(spark):
    cases = [
        # (raw, expected_norm, expected_domain)
        ("HTTPS://WWW.Example.COM:443/a//b/?utm_source=x&b=2&a=1#frag",
         "https://example.com/a/b?a=1&b=2", "example.com"),
        ("http://example.com:80/", "http://example.com/", "example.com"),
        ("http://example.com:8080/p/", "http://example.com:8080/p",
         "example.com"),
        ("https://news.BBC.co.uk/story/1?gclid=zz",
         "https://news.bbc.co.uk/story/1", "bbc.co.uk"),
        ("ftp://Host.Org/Path", "ftp://host.org/Path", "host.org"),
        ("no-scheme/relative", "no-scheme/relative", ""),
        ("https://example.com", "https://example.com/", "example.com"),
        ("http://www.a.com//x//y//?ref=h&z=1&y=2",
         "http://a.com/x/y?y=2&z=1", "a.com"),
        # https on :80 is NON-default: kept
        ("https://example.com:80/x", "https://example.com:80/x",
         "example.com"),
    ]
    df = spark.createDataFrame(
        [(i, r, n, d) for i, (r, n, d) in enumerate(cases)],
        "id int, url string, want_norm string, want_domain string",
    )
    return df


def test_normalize_and_domain(urls):
    rows = urls.select(
        "id", "want_norm", "want_domain",
        normalize_url("url").alias("norm"),
        registered_domain("url").alias("dom"),
    ).collect()
    for r in rows:
        assert r.norm == r.want_norm, f"case {r.id}"
        assert r.dom == r.want_domain, f"case {r.id}"


def test_url_host_keeps_port_stripped(spark):
    df = spark.createDataFrame(
        [("https://WWW.A.example.com:9999/x",)], "url string"
    )
    assert df.select(url_host("url").alias("h")).first().h == "a.example.com"


def test_domain_filter_literal_and_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "a.com"), (2, "b.com"), (3, "c.com")], "id int, dom string"
    )
    blocked = domain_filter(df, "dom", ["b.com"], mode="block")
    assert sorted(r.id for r in blocked.collect()) == [1, 3]
    allow_df = spark.createDataFrame([("b.com",), ("c.com",)], "d string")
    kept = domain_filter(df, "dom", allow_df, mode="allow")
    assert sorted(r.id for r in kept.collect()) == [2, 3]
    with pytest.raises(ValueError):
        domain_filter(df, "dom", ["x"], mode="bogus")


def test_per_domain_cap_deterministic(spark):
    rows = [(i, f"d{i % 3}", float(i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "id int, dom string, q double")
    capped = per_domain_cap(
        df, "dom", 4, [F.col("q").desc(), F.col("id").asc()]
    ).collect()
    by_dom: dict[str, list] = {}
    for r in capped:
        by_dom.setdefault(r.dom, []).append(r.id)
    assert all(len(v) == 4 for v in by_dom.values())
    # best-first: every kept row's (q desc, id asc) rank must be <= 4
    want = {}
    for i, dom, q in rows:
        want.setdefault(dom, []).append((-q, i))
    for dom, lst in want.items():
        top = {i for _, i in sorted(lst)[:4]}
        got = {r.id for r in capped if r.dom == dom}
        assert got == top, dom
    with pytest.raises(ValueError):
        per_domain_cap(df, "dom", 0, ["id"])


def test_url_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [
            (5, "http://A.com/x?utm_source=1"),
            (2, "http://a.com/x"),
            (9, "http://a.com/x/"),
            (1, "http://b.com/y"),
        ],
        "id int, url string",
    )
    out = url_dedup(df, "url", "id").collect()
    assert sorted(r.id for r in out) == [1, 2]


def test_url_curate_transformer(spark):
    from orientdb_etl_spark.context import PipelineContext
    from orientdb_etl_spark.operators import get_transformer

    ctx = PipelineContext(spark)
    df = spark.createDataFrame(
        [
            (1, "https://www.a.co.uk/1?utm_source=z", 10),
            (2, "https://a.co.uk/2", 20),
            (3, "https://bad.com/3", 30),
            (4, "https://sub.a.co.uk/4", 40),
            (5, "https://a.co.uk/5", 50),
        ],
        "doc_id int, url string, n_chars int",
    )
    out = get_transformer("urlCurate")(
        ctx,
        df,
        {
            "urlField": "url",
            "blockDomains": ["bad.com"],
            "maxPerDomain": 2,
            "orderBy": ["n_chars DESC", "doc_id"],
        },
    ).collect()
    assert sorted(r.doc_id for r in out) == [4, 5]
    assert all(r.domain == "a.co.uk" for r in out)
