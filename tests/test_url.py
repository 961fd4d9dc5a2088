"""URL canonicalization: rule-by-rule cases and a pure-Python parity
check over messy generated URLs."""

from __future__ import annotations

import re

from ocr_translation_spark.functions.url import url_canonicalize


def _py_canon(url: str) -> str:
    u = url.strip()
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"(?i)^(https?://[^/?]*)", u)
    if m:
        u = m.group(1).lower() + u[m.end():]
    u = re.sub(r"^https?://", "", u)
    u = re.sub(r"^www\.", "", u)
    u = re.sub(r"^([^/?]*):(80|443)(?=[/?]|$)", r"\1", u)
    if "?" in u:
        path, q = u.split("?", 1)
    else:
        path, q = u, ""
    params = [
        p
        for p in q.split("&")
        if p and not re.match(r"^(utm_[a-z]+|gclid|fbclid|ref)=", p)
    ]
    path = re.sub(r"/$", "", path)
    return path + ("?" + "&".join(sorted(params)) if params else "")


CASES = [
    # (input, expected canonical)
    ("HTTPS://WWW.Example.COM:443/a/1/?utm_source=x&b=2&a=1#frag",
     "example.com/a/1?a=1&b=2"),
    ("http://example.com:80/a?a=1", "example.com/a?a=1"),
    ("https://News.site.ORG/p/", "news.site.org/p"),
    ("www.news.site.org/p", "news.site.org/p"),
    ("http://Blog.Example.com/x?gclid=z&ref=home&z=9&y=8",
     "blog.example.com/x?y=8&z=9"),
    ("https://blog.example.com/x?y=8&z=9#top",
     "blog.example.com/x?y=8&z=9"),
    # port NOT default: kept; path case preserved
    ("https://Host.com:8080/A/B/", "host.com:8080/A/B"),
    # bare host, trailing slash only
    ("http://example.com/", "example.com"),
    # query-only param dropped entirely -> no '?'
    ("https://example.com/x?utm_campaign=a", "example.com/x"),
]


def test_url_canonical_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: (r["canonical_url"], r["host"])
        for r in url_canonicalize(df).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i][0] == want, (u, got[i][0], want)
        assert got[i][0] == _py_canon(u), (u,)
        assert got[i][1] == re.match(r"^([^/?]*)", want).group(1)


def test_url_canonical_dedups_variants(spark):
    # all spellings of the same page collapse to one hash
    variants = [
        "https://www.example.com/page/?b=2&a=1",
        "http://example.com/page?a=1&b=2#x",
        "HTTPS://EXAMPLE.com:443/page/?a=1&utm_medium=m&b=2",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(variants)], "doc_id long, url string"
    )
    hashes = {
        r["url_sha256"] for r in url_canonicalize(df).collect()
    }
    assert len(hashes) == 1


# ---------------------------------------------------------------------------
# frontier_schedule — politeness-aware crawl scheduling
# ---------------------------------------------------------------------------


def _frontier_df(spark, rows):
    return spark.createDataFrame(rows, "url string, host string")


def test_frontier_host_atomic_slots_and_wave_contract(spark):
    from ocr_translation_spark.functions.url import frontier_schedule

    rows = [(f"https://h{i % 5}/p/{i}", f"h{i % 5}") for i in range(40)]
    out = frontier_schedule(_frontier_df(spark, rows), n_slots=8).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        # host-atomic: one slot per host
        assert len({r["slot"] for r in rs}) == 1, host
        # wave contract: exactly one URL per (host, wave), waves 1..k
        waves = sorted(r["wave"] for r in rs)
        assert waves == list(range(1, len(rs) + 1)), host
        # share: host size / corpus size in exact micro-units
        assert all(
            r["host_share_micro"] == 1_000_000 * len(rs) // 40 for r in rs
        )


def test_frontier_is_deterministic_and_priority_ordered(spark):
    from ocr_translation_spark.functions.url import frontier_schedule

    rows = [(f"u{i}", "h") for i in range(10)]
    a = {
        r["url"]: r["wave"]
        for r in frontier_schedule(_frontier_df(spark, rows)).collect()
    }
    b = {
        r["url"]: r["wave"]
        for r in frontier_schedule(
            _frontier_df(spark, list(reversed(rows)))
        ).collect()
    }
    assert a == b  # input order does not change the schedule
