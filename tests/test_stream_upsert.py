"""Streaming CDC upsert materialization (streaming/upsert_stream):
stream-vs-batch parity, delete semantics, crash-replay idempotence,
merge-on-read compaction, and pruned point lookups."""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ocr_translation_spark.streaming import current_state, stream_upsert
from ocr_translation_spark.streaming.upsert_stream import _delta_dirs

SCHEMA = "doc_id string, seq long, op string, body string"


def _write_chunks(tmp_path, chunks, start=0):
    in_dir = tmp_path / "in"
    os.makedirs(in_dir, exist_ok=True)
    for i, rows in enumerate(chunks, start=start):
        p = str(in_dir / f"chunk{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                pd.DataFrame(
                    rows, columns=["doc_id", "seq", "op", "body"]
                ),
                preserve_index=False,
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(in_dir)


def _run(spark, tmp_path, in_dir, ck="ck", compact_every=8):
    q = stream_upsert(
        spark,
        in_dir,
        str(tmp_path / ck),
        str(tmp_path / "state"),
        schema=SCHEMA,
        compact_every=compact_every,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    return q


def _state(spark, tmp_path):
    return {
        r.doc_id: (r.seq, r.body)
        for r in current_state(spark, str(tmp_path / "state")).collect()
    }


def _python_apply(chunks):
    """Reference: last-writer-wins fold in plain Python."""
    cur: dict[str, tuple] = {}
    for rows in chunks:
        best: dict[str, tuple] = {}
        for doc, seq, op, body in rows:
            prev = best.get(doc)
            # within a batch: higher seq wins, delete wins ties
            if prev is None or (seq, op == "delete") > (
                prev[0], prev[1] == "delete"
            ):
                best[doc] = (seq, op, body)
        for doc, (seq, op, body) in best.items():
            prev = cur.get(doc)
            if prev is None or (seq, op == "delete") >= (
                prev[0], prev[1] == "delete"
            ):
                cur[doc] = (seq, op, body)
    return {
        d: (s, b) for d, (s, op, b) in cur.items() if op != "delete"
    }


def _chunks():
    return [
        [
            ("a", 1, "upsert", "a-v1"),
            ("b", 1, "upsert", "b-v1"),
            ("c", 1, "upsert", "c-v1"),
        ],
        [
            ("a", 2, "upsert", "a-v2"),
            ("b", 2, "delete", None),
            ("d", 1, "upsert", "d-v1"),
        ],
        [
            ("a", 1, "upsert", "a-stale"),   # stale: must NOT win
            ("c", 3, "delete", None),
            ("c", 3, "upsert", "c-zombie"),  # equal seq: delete wins
            ("e", 1, "upsert", "e-v1"),
        ],
    ]


def test_stream_matches_python_fold_with_deletes(spark, tmp_path):
    in_dir = _write_chunks(tmp_path, _chunks())
    _run(spark, tmp_path, in_dir)
    got = _state(spark, tmp_path)
    assert got == _python_apply(_chunks())
    assert got["a"] == (2, "a-v2")       # stale change lost
    assert "b" not in got and "c" not in got  # deletes + tie delete


def test_crash_replay_is_idempotent(spark, tmp_path):
    in_dir = _write_chunks(tmp_path, _chunks())
    _run(spark, tmp_path, in_dir)
    first = _state(spark, tmp_path)
    # fresh checkpoint == every batch replayed against surviving state
    _run(spark, tmp_path, in_dir, ck="ck2")
    assert _state(spark, tmp_path) == first


def test_incremental_continuation(spark, tmp_path):
    in_dir = _write_chunks(tmp_path, _chunks())
    _run(spark, tmp_path, in_dir)
    _write_chunks(
        tmp_path,
        [[("b", 3, "upsert", "b-back"), ("a", 3, "delete", None)]],
        start=3,
    )
    _run(spark, tmp_path, in_dir)
    got = _state(spark, tmp_path)
    assert got["b"] == (3, "b-back")  # re-created after delete
    assert "a" not in got


def test_compaction_bounds_delta_dirs_and_preserves_state(
    spark, tmp_path
):
    chunks = [
        [(f"k{j}", i, "upsert", f"v{i}.{j}") for j in range(6)]
        for i in range(7)
    ]
    chunks[3].append(("k0", 10, "delete", None))
    in_dir = _write_chunks(tmp_path, chunks)
    _run(spark, tmp_path, in_dir, compact_every=3)
    dirs = _delta_dirs(str(tmp_path / "state"))
    assert len(dirs) <= 4  # compacted: base + a few fresh deltas
    assert any(d.startswith("base=") for d in dirs)
    got = _state(spark, tmp_path)
    assert "k0" not in got  # tombstone survives compaction
    assert got["k1"] == (6, "v6.1")


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    in_dir = _write_chunks(tmp_path, _chunks())
    _run(spark, tmp_path, in_dir)
    bkt = hashlib.sha256(b"a").hexdigest()[:2]
    one = current_state(
        spark, str(tmp_path / "state"), buckets=[bkt]
    )
    rows = {r.doc_id: (r.seq, r.body) for r in one.collect()}
    assert rows["a"] == (2, "a-v2")
    # the pruned scan must only read files under p=<bkt> — capture
    # file lineage at SCAN level (input_file_name is empty after the
    # resolution window's shuffle)
    from pyspark.sql import functions as F

    from ocr_translation_spark.streaming.upsert_stream import (
        _read_deltas,
    )

    files = [
        r.f
        for r in _read_deltas(spark, str(tmp_path / "state"), [bkt])
        .withColumn("f", F.input_file_name())
        .select("f")
        .distinct()
        .collect()
    ]
    assert files and all(f"p={bkt}" in f for f in files)


def test_cross_batch_tie_break_is_numeric_not_lexicographic(
    spark, tmp_path
):
    # equal (key, seq, op) in batch 9 and batch 12: the LATER batch
    # must win, even though 'batch=9' > 'batch=12' as strings
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ocr_translation_spark.streaming.upsert_stream import (
        _prefix_part,
    )

    root = tmp_path / "state" / "upsert_state"
    for bid, body in [(9, "old"), (12, "new")]:
        df = spark.createDataFrame(
            [("x", 5, "upsert", body)], SCHEMA
        ).withColumn("p", _prefix_part(F.col("doc_id")))
        df.write.mode("overwrite").partitionBy("p").parquet(
            str(root / f"batch={bid}")
        )
    got = _state(spark, tmp_path)
    assert got["x"] == (5, "new")


def test_same_batch_duplicate_rows_resolve_deterministically(spark):
    from ocr_translation_spark.streaming.upsert_stream import _resolve
    from pyspark.sql import functions as F

    rows = [("x", 5, "upsert", f"payload-{i}") for i in range(8)]
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "_delta", F.lit(0).cast("long")
    )
    winners = {
        _resolve(df.repartition(n), "doc_id", "seq").collect()[0].body
        for n in (1, 3, 7)
    }
    assert len(winners) == 1  # partition-arrival order must not decide
