"""Stage B — boilerplate / markup strip, fully columnar (no Python).

Reference parity: the validation guards at ``src/utils/pdf.js:14-22``
(empty-text rejection) generalized to DOM/boilerplate heuristics:
markup spans (``tag_open``/``tag_close``) and ``boiler`` spans are
dropped, and ``text`` spans are scored by boilerplate-token density
(kin of tag-density / text-to-markup-ratio scoring) and dropped above
``semantics.BOILER_THRESHOLD``.

This stage is pure Catalyst expression work over the span array —
``F.filter`` with a lambda — so it stays inside whole-stage codegen,
costs zero shuffles, and never crosses the Python boundary. Exactly the
semantics of ``semantics.keep_span`` (the golden spec).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .. import semantics as S

_BOILER_TOKENS = list(S.BOILER_TOKEN_SET)
_DROP_KINDS = [S.KIND_BOILER, S.KIND_TAG_OPEN, S.KIND_TAG_CLOSE]

# Python str.strip()/str.split() whitespace, as a Java regex class.
# F.trim strips ONLY ASCII spaces and Java's \s is the ASCII subset
# [ \t\n\x0B\f\r] — a tab-only span would survive the Spark strip while
# the golden spec (semantics.keep_span: text.strip()) drops it, and a
# leading \t would inject an empty first token, diluting the boiler
# score (2/4 kept vs the golden 2/3 dropped). This class is the exact
# enumeration of Python's isspace() code points, so the columnar path
# matches the spec on ANY whitespace, not just spaces.
PY_WS = (
    "[ \\t\\n\\x0b\\f\\r\\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]"
)


def py_strip(text: Column) -> Column:
    """Columnar twin of Python ``str.strip()`` (Unicode whitespace)."""
    return F.regexp_replace(text, f"^{PY_WS}+|{PY_WS}+$", "")


def py_tokens(text: Column) -> Column:
    """Columnar twin of Python ``str.split()`` for non-blank stripped
    text: split the stripped string on whitespace runs (no empty
    tokens, since the ends are stripped first)."""
    return F.split(py_strip(text), f"{PY_WS}+")


def _boiler_score(text: Column) -> Column:
    toks = py_tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(_BOILER_TOKENS)))
    return hits / F.size(toks)


def keep_span_predicate(span: Column) -> Column:
    """Columnar twin of ``semantics.keep_span`` (span = struct column)."""
    kind, text = span["kind"], span["text"]
    is_dropped_kind = kind.isin(_DROP_KINDS)
    bad_text = (kind == S.KIND_TEXT) & (
        text.isNull()
        | (py_strip(text) == "")
        | (_boiler_score(text) > F.lit(S.BOILER_THRESHOLD))
    )
    return ~is_dropped_kind & ~bad_text


def strip_boilerplate(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Filter each row's span array down to content spans (stage B)."""
    return df.withColumn(
        spans_col, F.filter(F.col(spans_col), keep_span_predicate)
    )
