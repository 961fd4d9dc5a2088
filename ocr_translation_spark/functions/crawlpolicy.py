"""Robots-rules admission control: longest-match allow/disallow URL
filtering against a per-host rule table.

Every crawl pipeline sits behind a policy gate: before a URL may be
fetched (and its payload OCR'd / extracted downstream), the host's
robots rules decide admission. The match semantics implemented here
are the published core of the Robots Exclusion Protocol (RFC 9309
§2.2.2, and Google's reference parser): among all rules whose path
prefix matches the URL path, the MOST SPECIFIC (longest) rule wins,
and a length tie between an allow and a disallow resolves to ALLOW.
A URL matching no rule is allowed (the protocol default). Wildcards
and ``$`` anchors are out of scope — prefix rules are the protocol's
mandatory base and what the synthetic corpus plants.

Spark shape (100 TB frontier):
  * The rule table is host-keyed and SMALL relative to the frontier
    (rule lines per host are bounded — RFC 9309 requires parsers to
    honor at least 500 KiB of rules; real hosts carry dozens). One
    tiny groupBy collapses it to one array row per host, and the
    frontier-side application is a single BROADCAST equi-join on
    host — the corpus is never shuffled.
  * Per-URL matching is ROW-LOCAL whole-stage codegen: filter the
    host's rule array to matching prefixes, then ``array_max`` over
    ``struct(prefix_len, allow, prefix)`` — struct ordering compares
    fields left-to-right, so the longest prefix wins and a same-
    length tie picks allow (false < true), exactly the RFC tie-break.
    No Python, no explode, no per-URL aggregation.
  * Hot hosts cost nothing extra: the join key is the host, but the
    broadcast side is the small one, so host skew never concentrates
    a shuffle partition.

Determinism: string prefix matching + integer lengths + the total
struct order (len, allow, prefix) — a pure function of (urls, rules),
bit-identical on any engine; the trailing ``prefix`` field makes the
winner unique even if a host published duplicate-length same-verdict
rules.

Reference parity note: the reference ingests user uploads and has no
crawler, but its pipeline is exactly what sits DOWNSTREAM of this
gate in a web-scale deployment (fetch -> OCR -> translate); this is
the admission operator a frontier feeding `src/services/ocr.js`-style
workers requires, composing with functions/url.canonical_url
(canonicalize first, then match) and url.frontier_schedule (admit,
then schedule politely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    rule_host_col: str = "host",
    prefix_col: str = "prefix",
    allow_col: str = "allow",
    default_allow: bool = True,
) -> DataFrame:
    """Annotate ``urls`` with (matched_prefix, allowed) under RFC 9309
    longest-match semantics against ``rules`` (host, prefix, allow).

    ``matched_prefix`` is NULL when no rule matched; ``allowed`` is
    then ``default_allow`` (the protocol default True — pass False
    for a closed-world frontier). NULL-host or NULL-path URLs match
    nothing. Rules with a NULL host, prefix, OR verdict are dropped —
    a NULL-verdict rule that won longest-match would otherwise report
    its prefix as matched while silently falling back to the default,
    a self-contradictory row.
    """
    rule_sets = (
        rules.filter(
            F.col(rule_host_col).isNotNull()
            & F.col(prefix_col).isNotNull()
            & F.col(allow_col).isNotNull()
        )
        .groupBy(F.col(rule_host_col).alias("_rf_host"))
        .agg(
            F.collect_list(
                F.struct(
                    F.length(F.col(prefix_col)).alias("plen"),
                    F.col(allow_col).cast("boolean").alias("allow"),
                    F.col(prefix_col).alias("prefix"),
                )
            ).alias("_rf_rules")
        )
    )
    joined = urls.join(
        F.broadcast(rule_sets),
        urls[host_col] == F.col("_rf_host"),
        "left",
    )
    path = F.col(path_col)
    best = F.array_max(
        F.filter(
            F.coalesce("_rf_rules", F.array()),
            lambda r: path.startswith(r["prefix"]),
        )
    )
    return joined.select(
        *[urls[c] for c in urls.columns],
        best["prefix"].alias("matched_prefix"),
        F.coalesce(best["allow"], F.lit(default_allow)).alias(
            "allowed"
        ),
    )
