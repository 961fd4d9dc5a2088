"""Render stage (T3) and binaryFile ingestion (S3) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translation_spark import datagen as G
from ocr_translation_spark.operators.render import DOC_MAGIC, render_documents
from ocr_translation_spark.pipeline import extract
from ocr_translation_spark.sources.binary_media import ingest_media_dir
from tests.conftest import load_fixture


def test_render_documents(spark, fixture_dir):
    docs = load_fixture(spark, fixture_dir, "documents")
    media = load_fixture(spark, fixture_dir, "media")
    out = extract(spark, docs, media).result
    rendered = render_documents(out)
    rows = {r["doc_id"]: r for r in rendered.collect()}

    # all-boiler doc: empty but valid, render_ok false (never an error)
    rb = rows[G.EDGE_ALL_BOILER]
    assert rb["rendered_text"] == "" and rb["render_ok"] is False
    assert rows[G.EDGE_EMPTY]["render_ok"] is False

    rt = rows[G.EDGE_TEXT_ONLY]
    assert rt["rendered_text"] == "cái nhanh tia_lửa vi_engine một nhỏ lô luồng"
    assert rt["render_ok"] is True
    body = bytes(rt["doc_bytes"]).decode()
    assert body.startswith(DOC_MAGIC)  # heir of the %PDF-1. check
    assert "doc_id: " + G.EDGE_TEXT_ONLY in body

    # media text participates in the rendered stream
    rm = rows[G.EDGE_MEDIA_ONLY]
    assert rm["render_ok"] is True and len(rm["rendered_text"]) > 0


def test_ingest_media_dir(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.png").write_bytes(b"PNGDATA-aaaa")
    (d / "b.tiff").write_bytes(b"TIFFDATA-bbb")
    (d / "c.unknownext").write_bytes(b"???")
    df = ingest_media_dir(spark, str(d))
    rows = {bytes(r["media_bytes"]): r for r in df.collect()}
    assert len(rows) == 3
    a = rows[b"PNGDATA-aaaa"]
    assert a["media_kind"] == "png"
    assert a["media_ref"].startswith("img_") and len(a["media_ref"]) == 12
    assert rows[b"???"]["media_kind"] == "bin"
    # content-addressing is deterministic
    df2 = ingest_media_dir(spark, str(d), glob="*.png")
    (only,) = df2.collect()
    assert only["media_ref"] == a["media_ref"]
