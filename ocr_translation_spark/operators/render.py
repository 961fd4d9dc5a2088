"""Document re-assembly / render (reference T3, ``src/utils/pdf.js:11-44``).

The reference's final stage lays the translated text back out into a
PDF (Roboto 14pt at (100,100)) and returns the bytes. The batch twin
keeps the structured span array as the primary artifact and offers:

* ``rendered_text`` — the document's extracted+translated text in span
  order (what the reference draws on the page), pure columnar.
* ``render_document_bytes`` — a deterministic plain-text document
  container (``SYNTHDOC/1``) standing in for the PDF bytes; real PDF
  generation would need a layout library not present here, and the
  reference's own correctness gate was only "starts with %PDF-1."
  (``test/singleImage.js:102-118``), i.e. container validity, which
  the magic header reproduces.

Empty documents: the reference REJECTS empty text (pdf.js:14-22,
HTTP 400); the batch job keeps them as empty-but-valid rows
(FIXTURES.md section 1) and flags them with ``render_ok = false``
instead of failing the partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DOC_MAGIC = "SYNTHDOC/1"


def rendered_text(spans_col: Column) -> Column:
    """Span texts joined in array order (nulls — unresolved media —
    are skipped, matching concat_ws semantics in SQL string_agg)."""
    return F.array_join(
        F.transform(spans_col, lambda s: s["text"]), " ", null_replacement=None
    )


def render_documents(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    txt = rendered_text(F.col(spans_col))
    body = F.concat_ws(
        "\n", F.lit(DOC_MAGIC), F.concat(F.lit("doc_id: "), F.col("doc_id")), txt
    )
    return (
        df.withColumn("rendered_text", txt)
        .withColumn("render_ok", F.length(F.trim(txt)) > 0)
        .withColumn("doc_bytes", F.encode(body, "UTF-8"))
    )
