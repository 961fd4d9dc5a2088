"""URL canonicalization for crawl-scale dedup and domain accounting.

The same page arrives from a crawler under dozens of spellings —
scheme variants, WWW prefixes, default ports, tracking parameters,
fragments, trailing slashes, unsorted query strings. Canonicalizing
BEFORE hashing is what makes URL-keyed dedup, per-host caps, and
blocklist joins work; every web pipeline (CommonCrawl processing,
C4/RefinedWeb curation) runs a pass like this.

The whole transform is a chain of regexp/string expressions — pure
whole-stage codegen, zero shuffles, zero Python — and each rule is
individually reproducible in ANSI-ish SQL, so the DuckDB oracle pins
the exact output:

1. lowercase scheme + host (path/query stay case-sensitive);
2. drop the scheme and a leading ``www.``;
3. drop default ports (:80/:443) and the fragment;
4. remove tracking parameters (utm_*, gclid, fbclid, ref);
5. SORT the surviving query parameters (order-insensitive identity);
6. strip a trailing slash from the path.

Reference parity note: the reference service has no URL surface; this
is training-data-pipeline breadth beyond parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: tracking parameters dropped during canonicalization
TRACKING_RE = r"^(utm_[a-z]+|gclid|fbclid|ref)="


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` (see module docstring rules)."""
    u = F.trim(url)
    # fragment first (everything after # is client-side)
    u = F.regexp_replace(u, r"#.*$", "")
    # scheme://host[:port] — lowercase the authority only
    scheme_host = F.lower(F.regexp_extract(u, r"^(?i)(https?://[^/?]*)", 1))
    rest = F.regexp_replace(u, r"^(?i)https?://[^/?]*", "")
    u = F.concat(scheme_host, rest)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    # optional-group form, not lookahead: the DuckDB twin runs RE2,
    # which has no lookaround; Java substitutes "" for the unmatched
    # optional group exactly like RE2's \3
    u = F.regexp_replace(u, r"^([^/?]*):(80|443)([/?].*)?$", r"$1$3")
    # split off the query; filter + sort its parameters
    path = F.regexp_replace(u, r"\?.*$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    path = F.regexp_replace(path, r"/$", "")
    return F.when(sorted_q == "", path).otherwise(
        F.concat(path, F.lit("?"), sorted_q)
    )


def url_canonicalize(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id, url, canonical_url, host, url_sha256): canonical form,
    extracted host, and the dedup key hash."""
    canon = canonical_url(F.col(url_col))
    return df.select(
        F.col(id_col),
        F.col(url_col),
        canon.alias("canonical_url"),
        F.regexp_extract(canon, r"^([^/?]*)", 1).alias("host"),
        F.sha2(canon, 256).alias("url_sha256"),
    )


def frontier_schedule(
    df: DataFrame,
    n_slots: int = 64,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling (the Mercator /
    Heritrix frontier design, public): assign every URL a fetch
    ``slot`` and a per-host ``wave`` such that

    * all URLs of one host land in ONE slot (a fetcher owns the host's
      connection budget — politeness is enforceable locally), and
    * within a host, URLs are ordered into waves 1..k by a
      deterministic sha256 priority, so wave w fetches at most ONE URL
      per host (the crawl-delay contract).

    ``host_share_micro`` (host size / corpus size, exact micro-units)
    rides along: it is the number a frontier operator reads to spot a
    host that would serialize a slot (the skew_report of crawling).

    Scale shape: ONE host-keyed window shuffle (rank within host) —
    the slot is a pure hash, the wave a row_number; no global sort, no
    driver state. At 10^12 URLs the host key is the natural partition
    key and the hot-host hazard is bounded by the wave ordering being
    per-host (a 10^8-URL host costs its OWN slot time, not a shuffle
    straggler, because the window partitions by exactly that host).
    """
    h = F.col(host_col)
    slot = (
        F.conv(F.substring(F.sha2(h, 256), 1, 12), 16, 10).cast("long")
        % n_slots
    ).cast("int")
    prio = F.sha2(F.concat(h, F.lit("#"), F.col(url_col)), 256)
    wave = F.row_number().over(
        Window.partitionBy(host_col).orderBy(prio, url_col)
    )
    host_n = F.count(F.lit(1)).over(Window.partitionBy(host_col))
    counts = df.select(
        F.col(url_col).alias("url"),
        h.alias("host"),
        slot.alias("slot"),
        wave.cast("long").alias("wave"),
        host_n.cast("long").alias("host_n"),
    )
    tot = df.groupBy().agg(F.count(F.lit(1)).cast("long").alias("_total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "url",
        "host",
        "slot",
        "wave",
        F.call_function(
            "div",
            F.lit(1_000_000).cast("long") * F.col("host_n"),
            F.col("_total"),
        )
        .cast("long")
        .alias("host_share_micro"),
    )
