"""Deterministic synthetic fixtures (FIXTURES.md sections 1-3, 5).

Everything is a pure function of ``(seed, doc_id)`` — no RNG state —
so any scale is reproducible and any subset of docs can be regenerated
independently (the property a 10^12-doc generator needs: executors
generate their own partitions from doc_id alone).

Tables produced:

* ``documents(doc_id, spans)`` — interleaved text/markup/boiler/media
  span arrays (the authoritative input shape from BASELINE.json).
* ``media(media_ref, media_bytes, media_kind)`` — side table of
  synthetic SYNTHIMG/1 payloads (binary stays OUT of the span array,
  the scale-safe choice per SURVEY.md section 7 hard-part (a)).
* ``xlate_dict(src, dst, rule)`` — the fixed translation dictionary.

Skew (required by the north rule): docs where ``stable_int(doc_id) % 97
== 0`` are media-heavy (50-200 media spans vs the usual 0-5).
Edge-case docs with fixed ids are always present (empty / text-only /
media-only / all-boiler / duplicate-content pairs / repeated media_ref).
"""

from __future__ import annotations

import hashlib
import struct

from . import semantics as S

SEED = 42

# Content vocabulary for text spans (distinct from boiler vocabulary).
WORDS = (
    "the", "a", "fast", "slow", "small", "big", "key", "order", "sort",
    "table", "scan", "merge", "part", "window", "hash", "join", "batch",
    "stream", "spark", "dup", "row", "column", "filter", "customer",
    "vector", "line", "data", "agg", "value", "group", "query", "word",
    "image", "page", "text", "document", "engine", "plan", "node",
    "task", "stage", "shuffle", "cache", "river", "mountain", "garden",
)

BOILER_PHRASES = (
    "click here to subscribe to the newsletter",
    "accept cookie policy and privacy terms",
    "all rights reserved copyright",
    "home about contact sitemap",
    "advertisement sponsored content click here",
    "login signup register menu navigation",
)

TAGS = ("p", "div", "span", "h1", "li", "table")

MEDIA_KINDS = ("png", "jpg", "jpeg", "gif", "webp", "tiff")

# Fixed edge-case documents (FIXTURES.md section 1).
EDGE_EMPTY = "doc_edge_empty"
EDGE_TEXT_ONLY = "doc_edge_textonly"
EDGE_MEDIA_ONLY = "doc_edge_mediaonly"
EDGE_ALL_BOILER = "doc_edge_allboiler"
EDGE_DUP_A = "doc_edge_dup_a"
EDGE_DUP_B = "doc_edge_dup_b"
EDGE_REPEAT_MEDIA = "doc_edge_repeatmedia"
EDGE_DOC_IDS = (
    EDGE_EMPTY, EDGE_TEXT_ONLY, EDGE_MEDIA_ONLY, EDGE_ALL_BOILER,
    EDGE_DUP_A, EDGE_DUP_B, EDGE_REPEAT_MEDIA,
)


def stable_int(*keys: object) -> int:
    """64-bit stable hash of the key tuple (pure, platform-independent)."""
    h = hashlib.blake2b(repr(keys).encode(), digest_size=8, key=b"sg42")
    return struct.unpack(">Q", h.digest())[0]


def _pick(seq, *keys):
    return seq[stable_int(*keys) % len(seq)]


def _rand_below(n: int, *keys) -> int:
    return stable_int(*keys) % n


# --------------------------------------------------------------------------
# Media payloads
# --------------------------------------------------------------------------

def media_ref_for(key: object) -> str:
    """Content-address-shaped ref: 'img_<sha8>' (FIXTURES.md section 1)."""
    return "img_" + hashlib.sha256(repr(key).encode()).hexdigest()[:8]


def media_tokens_for(media_ref: str) -> list[tuple[str, int, int]]:
    """Token grid encoded in a media payload — pure function of the ref.

    Tokens get (y, x) coordinates emitted in SHUFFLED order so that the
    OCR stage's reading-order sort actually does work.
    """
    n = 3 + _rand_below(10, "ntok", media_ref)
    toks = []
    for i in range(n):
        tok = _pick(WORDS, "mtok", media_ref, i)
        y = _rand_below(5, "y", media_ref, i)
        x = _rand_below(40, "x", media_ref, i)
        toks.append((tok, y, x))
    # deterministic shuffle: sort by an unrelated stable hash
    toks.sort(key=lambda t: stable_int("shuf", media_ref, t))
    return toks


def media_bytes_for(media_ref: str) -> bytes:
    return S.encode_media(media_tokens_for(media_ref))


# --------------------------------------------------------------------------
# Documents
# --------------------------------------------------------------------------

def _text_span_content(doc_id: str, i: int) -> str:
    # ~5% of text spans carry boiler-dense content (exercises the
    # stage-B scoring path, not just the kind-based strip).
    if _rand_below(20, "isboilertext", doc_id, i) == 0:
        return _pick(BOILER_PHRASES, "btxt", doc_id, i)
    n = 3 + _rand_below(8, "ntxt", doc_id, i)
    return " ".join(_pick(WORDS, "w", doc_id, i, j) for j in range(n))


def gen_doc_spans(doc_id: str) -> list[dict]:
    """Span list for one doc_id — pure function of (SEED, doc_id)."""
    media_heavy = stable_int("heavy", SEED, doc_id) % 97 == 0
    if media_heavy:
        n_media = 50 + _rand_below(151, "nmedia", doc_id)
        n_other = 5 + _rand_below(20, "nother", doc_id)
    else:
        n_media = _rand_below(6, "nmedia", doc_id)
        n_other = 5 + _rand_below(196, "nother", doc_id)

    spans: list[dict] = []

    def add(kind, text=None, media_ref=None):
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref,
             "offset": len(spans)}
        )

    n_total = n_media + n_other
    media_left = n_media
    for i in range(n_total):
        # deterministic interleave: media slots spread through the doc
        if media_left > 0 and _rand_below(n_total - i, "slot", doc_id, i) < media_left:
            ref = media_ref_for(("m", SEED, doc_id, i))
            # ~10% reuse a globally shared ref (cache-hit / dedup path)
            if _rand_below(10, "shared", doc_id, i) == 0:
                ref = media_ref_for(("shared", SEED, _rand_below(25, "sidx", doc_id, i)))
            add(S.KIND_MEDIA, media_ref=ref)
            media_left -= 1
            continue
        r = _rand_below(10, "kind", doc_id, i)
        if r < 6:
            add(S.KIND_TEXT, text=_text_span_content(doc_id, i))
        elif r < 8:
            tag = _pick(TAGS, "tag", doc_id, i)
            kind = S.KIND_TAG_OPEN if _rand_below(2, "oc", doc_id, i) == 0 else S.KIND_TAG_CLOSE
            add(kind, text=f"<{tag}>" if kind == S.KIND_TAG_OPEN else f"</{tag}>")
        else:
            add(S.KIND_BOILER, text=_pick(BOILER_PHRASES, "bp", doc_id, i))
    return spans


def _edge_doc_spans(doc_id: str) -> list[dict]:
    def mk(kind, text=None, ref=None, off=0):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    if doc_id == EDGE_EMPTY:
        return []
    if doc_id == EDGE_TEXT_ONLY:
        return [mk(S.KIND_TEXT, text="the fast spark engine", off=0),
                mk(S.KIND_TEXT, text="a small batch stream", off=1)]
    if doc_id == EDGE_MEDIA_ONLY:
        return [mk(S.KIND_MEDIA, ref=media_ref_for(("edge", SEED, 0)), off=0),
                mk(S.KIND_MEDIA, ref=media_ref_for(("edge", SEED, 1)), off=1)]
    if doc_id == EDGE_ALL_BOILER:
        return [mk(S.KIND_BOILER, text=p, off=i)
                for i, p in enumerate(BOILER_PHRASES)]
    if doc_id in (EDGE_DUP_A, EDGE_DUP_B):  # identical content pair
        return [mk(S.KIND_TEXT, text="dup dup dup", off=0),
                mk(S.KIND_MEDIA, ref=media_ref_for(("edge", SEED, 2)), off=1)]
    if doc_id == EDGE_REPEAT_MEDIA:
        ref = media_ref_for(("edge", SEED, 3))
        return [mk(S.KIND_MEDIA, ref=ref, off=i) for i in range(4)]
    raise KeyError(doc_id)


def doc_ids(n_docs: int) -> list[str]:
    return [f"doc_{i:08d}" for i in range(n_docs)] + list(EDGE_DOC_IDS)


def spans_for(doc_id: str) -> list[dict]:
    if doc_id in EDGE_DOC_IDS:
        return _edge_doc_spans(doc_id)
    return gen_doc_spans(doc_id)


def gen_documents(n_docs: int) -> list[tuple[str, list[dict]]]:
    return [(d, spans_for(d)) for d in doc_ids(n_docs)]


def collect_media_refs(docs: list[tuple[str, list[dict]]]) -> set[str]:
    return {
        s["media_ref"]
        for _, spans in docs
        for s in spans
        if s["kind"] == S.KIND_MEDIA and s["media_ref"]
    }


def gen_media_table(refs: set[str]) -> list[tuple[str, bytes, str]]:
    return [
        (r, media_bytes_for(r), _pick(MEDIA_KINDS, "mkind", r))
        for r in sorted(refs)
    ]


def gen_xlate_dict_table() -> list[tuple[str, str, str]]:
    rows = []
    for src, dst in sorted(S.XLATE_DICT.items()):
        rule = "word" if src in S._CORE_DICT else "identity-fallback"
        rows.append((src, dst, rule))
    return rows


# --------------------------------------------------------------------------
# Golden outputs
# --------------------------------------------------------------------------

def golden_extracted(docs, media_rows) -> dict[str, list[dict]]:
    """doc_id -> expected extracted span list, via the golden function."""
    lookup = {r: b for r, b, _ in media_rows}
    return {d: S.extract_doc(spans, lookup) for d, spans in docs}


# --------------------------------------------------------------------------
# Parquet writers (used by tests and bench to materialize fixtures)
# --------------------------------------------------------------------------

def write_fixture_parquet(
    out_dir: str, n_docs: int, n_files: int = 16
) -> dict[str, str]:
    """Write documents/media/xlate_dict parquet under ``out_dir``.

    Uses pyarrow directly (no Spark needed) so unit tests and the bench
    can generate inputs cheaply. Returns {table_name: path}.

    Tables are written as DIRECTORIES of ``n_files`` part files —
    a single pyarrow file is one row group, i.e. ONE Spark input split,
    which serializes the scan stage and wrecks scaling measurements.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs = gen_documents(n_docs)

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )

    def _write_parts(name: str, rows: list, to_table) -> str:
        path = os.path.join(out_dir, f"{name}.parquet")
        os.makedirs(path, exist_ok=True)
        k = max(1, min(n_files, len(rows)))
        chunk = -(-len(rows) // k)
        for i in range(k):
            part = rows[i * chunk : (i + 1) * chunk]
            if not part:
                break
            pq.write_table(
                to_table(part), os.path.join(path, f"part-{i:05d}.parquet")
            )
        return path

    def _docs_table(part):
        return pa.table(
            {
                "doc_id": pa.array([d for d, _ in part], pa.string()),
                "spans": pa.array(
                    [
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in spans
                        ]
                        for _, spans in part
                    ],
                    span_type,
                ),
            }
        )

    paths = {}
    paths["documents"] = _write_parts("documents", docs, _docs_table)

    media_rows = gen_media_table(collect_media_refs(docs))

    def _media_table(part):
        return pa.table(
            {
                "media_ref": pa.array([r for r, _, _ in part], pa.string()),
                "media_bytes": pa.array([b for _, b, _ in part], pa.binary()),
                "media_kind": pa.array([k for _, _, k in part], pa.string()),
            }
        )

    paths["media"] = _write_parts("media", media_rows, _media_table)

    dict_rows = gen_xlate_dict_table()
    dict_tbl = pa.table(
        {
            "src": pa.array([r[0] for r in dict_rows], pa.string()),
            "dst": pa.array([r[1] for r in dict_rows], pa.string()),
            "rule": pa.array([r[2] for r in dict_rows], pa.string()),
        }
    )
    p = os.path.join(out_dir, "xlate_dict.parquet")
    pq.write_table(dict_tbl, p)
    paths["xlate_dict"] = p
    return paths


def write_fixture_parquet_spark(
    spark, out_dir: str, n_docs: int, n_files: int = 64
) -> dict[str, str]:
    """Spark-parallel fixture generator for bench-scale corpora.

    Same pure function of (SEED, doc_id) as the pyarrow writer — each
    partition generates its own doc_id range independently (exactly how
    a 10^12-doc corpus would be materialized on a cluster). Media
    payloads are emitted once per distinct ref via a distinct+generate
    pass.
    """
    import os

    from pyspark.sql import functions as F

    ids = [(d,) for d in doc_ids(n_docs)]
    id_df = spark.createDataFrame(ids, "doc_id string").repartition(n_files)

    span_schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )

    def gen_docs(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                rows.append(
                    (
                        d,
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in spans_for(d)
                        ],
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    docs_df = id_df.mapInPandas(gen_docs, schema=span_schema)
    doc_path = os.path.join(out_dir, "documents.parquet")
    docs_df.write.mode("overwrite").parquet(doc_path)

    refs = (
        spark.read.parquet(doc_path)
        .select(F.explode(F.col("spans.media_ref")).alias("media_ref"))
        .where(F.col("media_ref").isNotNull())
        .distinct()
    )

    def gen_media(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (r, media_bytes_for(r), _pick(MEDIA_KINDS, "mkind", r))
                for r in pdf["media_ref"]
            ]
            yield pd.DataFrame(
                rows, columns=["media_ref", "media_bytes", "media_kind"]
            )

    media_path = os.path.join(out_dir, "media.parquet")
    refs.repartition(max(8, n_files // 4)).mapInPandas(
        gen_media,
        schema="media_ref string, media_bytes binary, media_kind string",
    ).write.mode("overwrite").parquet(media_path)
    return {"documents": doc_path, "media": media_path}


# --------------------------------------------------------------------------
# Bucketed storage layout (the 100 TB deployment shape)
# --------------------------------------------------------------------------

SPAN_DDL = (
    "doc_id STRING, spans ARRAY<STRUCT<kind: STRING, text: STRING, "
    "media_ref: STRING, offset: INT>>"
)


def bucketed_documents_ddl(table: str, location: str, n_buckets: int) -> str:
    """DDL that re-registers an on-disk bucketed documents table in a
    FRESH session (bucket metadata lives in the catalog, not the files;
    with in-memory catalogs each session re-creates it — on a real
    cluster this is a one-time Iceberg/metastore entry)."""
    return (
        f"CREATE TABLE {table} ({SPAN_DDL}) USING parquet "
        f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO {n_buckets} BUCKETS "
        f"LOCATION '{location}'"
    )


def write_bucketed_documents(
    spark, base_dir: str, n_buckets: int = 128, table: str = "documents_bucketed"
) -> str:
    """One-time re-layout of ``{base_dir}/documents.parquet`` into a
    doc_id-bucketed, per-bucket-sorted parquet table (one file per
    bucket). A bucketed source makes the extraction pipeline
    shuffle-free on the big side: the entry repartition disappears
    (``extract(pre_partitioned=True)``) and the per-doc OCR-map join
    needs neither shuffle nor sort for the corpus — the layout an
    Iceberg ``bucket(N, doc_id)`` partitioning gives a 100 TB table.

    Returns the location; register in later sessions with
    ``bucketed_documents_ddl``.
    """
    import os

    from pyspark.sql import functions as F

    location = os.path.join(base_dir, f"{table}")
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        # pre-shuffle on the SAME hash the bucketing uses -> each task
        # holds exactly one bucket -> one file per bucket (SMJ can then
        # skip both shuffle and sort on read)
        docs.repartition(n_buckets, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
        .option("path", location)
        .format("parquet")
        .saveAsTable(table)
    )
    return location
