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

from pyspark.sql import Column, DataFrame, functions as F

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
