"""Streaming ingest dedup: batch==stream parity, registry stability
across restarts, and crash-replay idempotence of the output."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as E
from ocr_translation_spark.streaming import (
    read_dedup_output,
    stream_exact_dedup,
)

SF = "/root/testdata/sf0.001"


def _split_documents(tmp_path, n_chunks=3):
    """sf0.001 documents split into doc_id-ordered chunk files (ordered
    arrival makes the stream's first-seen-min == the batch global min)."""
    df = pd.read_parquet(os.path.join(SF, "documents.parquet"))
    df = df.sort_values("doc_id").reset_index(drop=True)
    in_dir = tmp_path / "in"
    os.makedirs(in_dir, exist_ok=True)
    k = -(-len(df) // n_chunks)
    paths = []
    for i in range(n_chunks):
        part = df.iloc[i * k : (i + 1) * k]
        p = str(in_dir / f"chunk{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False), p
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        paths.append(p)
    return str(in_dir), paths


def test_stream_dedup_parity_with_batch(spark, tmp_path):
    in_dir, _ = _split_documents(tmp_path)
    q = stream_exact_dedup(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        str(tmp_path / "reg"), max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        r["doc_id"]: (r["fp"], r["canonical_id"], r["is_dup"])
        for r in read_dedup_output(spark, str(tmp_path / "out")).collect()
    }
    batch = {
        r["h"]: (r["keep_id"], r["n_dups"])
        for r in E.queries()["exact_dedup"](spark, SF).collect()
    }
    # every doc annotated exactly once
    n_docs = sum(n for _, n in batch.values())
    assert len(got) == n_docs
    # doc_id-ordered arrival => canonical == the batch global-min
    # survivor, and is_dup flags match the batch dup counts
    from collections import Counter

    dups_per_fp = Counter()
    for doc_id, (fp, canonical, is_dup) in got.items():
        assert batch[fp][0] == canonical, (doc_id, fp)
        assert is_dup == (doc_id != canonical)
        dups_per_fp[fp] += 1
    assert {fp: n for fp, (k, n) in batch.items()} == dict(dups_per_fp)


def test_stream_dedup_registry_stable_across_restart(spark, tmp_path):
    """New chunks arriving after a full drain reuse the existing
    registry: previously-claimed canonicals never change, and a doc
    whose text was seen before is flagged as a duplicate."""
    in_dir, _ = _split_documents(tmp_path, n_chunks=2)
    out, ck, reg = (
        str(tmp_path / "out"), str(tmp_path / "ck"), str(tmp_path / "reg")
    )
    q = stream_exact_dedup(spark, in_dir, out, ck, reg)
    q.awaitTermination(300)
    first = {
        r["fp"]: r["canonical_id"]
        for r in read_dedup_output(spark, out).collect()
    }

    # a late file: re-sends an already-seen text under a NEW doc_id
    seen = pd.read_parquet(os.path.join(SF, "documents.parquet")).iloc[0]
    late = pd.DataFrame(
        [
            {
                "doc_id": 10_000_000,
                "text": seen["text"],
                "lang": seen["lang"],
                "source": "late",
                "n_chars": seen["n_chars"],
            }
        ]
    )
    p = os.path.join(in_dir, "late.parquet")
    pq.write_table(pa.Table.from_pandas(late, preserve_index=False), p)

    q2 = stream_exact_dedup(spark, in_dir, out, ck, reg)
    q2.awaitTermination(300)
    rows = {
        r["doc_id"]: r
        for r in read_dedup_output(spark, out).collect()
    }
    late_row = rows[10_000_000]
    assert late_row["is_dup"]  # recognized as a resend
    # its canonical is the ORIGINAL claim, unchanged from the first run
    assert late_row["canonical_id"] == first[late_row["fp"]]
    # and no other canonical moved
    for r in rows.values():
        if r["doc_id"] != 10_000_000:
            assert first[r["fp"]] == r["canonical_id"]


def test_stream_near_dup_flags_against_history(spark, tmp_path):
    """Streaming MinHash near-dup: flags are PRECISE (every flagged
    doc's estimate matches the brute-force signature estimate and
    clears the threshold against a genuinely earlier doc) and recall
    vs the brute-force estimate-pairs is at the banding design point."""
    from pyspark.sql import functions as F

    from ocr_translation_spark.functions.dedup import (
        minhash_signature,
        shingles,
    )
    from ocr_translation_spark.streaming import stream_near_dup
    from ocr_translation_spark.streaming.dedup_stream import (
        read_dedup_output,
    )

    in_dir, _ = _split_documents(tmp_path, n_chunks=3)
    q = stream_near_dup(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        str(tmp_path / "reg"), jaccard_threshold=0.5,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    got = {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    # brute-force ground truth on the SIGNATURE estimate (the stream's
    # declared measure): all pairs, est >= 0.5, survivor = smaller id
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    sigs = docs.select(
        F.col("doc_id").alias("_id"),
        minhash_signature(shingles(F.col("text"), 3), 32).alias("sig"),
    )
    a = sigs.select(F.col("_id").alias("id_a"), F.col("sig").alias("sa"))
    bb = sigs.select(F.col("_id").alias("id_b"), F.col("sig").alias("sb"))
    est = F.round(
        F.aggregate(
            F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(32.0),
        6,
    )
    brute = {}
    for r in (
        a.crossJoin(bb)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("est", est)
        .filter(F.col("est") >= 0.5)
        .collect()
    ):
        brute.setdefault(r["id_b"], {})[r["id_a"]] = r["est"]
    assert len(brute) > 3  # corpus plants real near-dups

    flagged = {
        d: r for d, r in got.items() if r["near_dup_of"] is not None
    }
    # precision: every flag is a true estimate-pair with exact values
    for d, r in flagged.items():
        assert d in brute, f"doc {d} flagged but no brute pair"
        assert r["near_dup_of"] in brute[d]
        assert r["est_jaccard"] == brute[d][r["near_dup_of"]]
        # and it picked the BEST earlier match
        assert r["est_jaccard"] == max(brute[d].values())
    # recall: banding finds nearly all estimate-pairs (16x2 at t=0.5
    # designs for >= 0.95 candidate recall)
    dup_docs = {d for d, r in got.items() if r["is_exact_dup"]}
    recall_pool = set(brute) - dup_docs  # exact dups report via canonical
    found = set(flagged)
    recall = len(found & recall_pool) / max(1, len(recall_pool))
    assert recall >= 0.9, f"stream near-dup recall {recall:.3f}"


def test_stream_near_dup_survives_empty_first_batch(spark, tmp_path):
    """An all-empty first batch writes a zero-row registry batch (no
    parquet footer -> load_cache returns None); the stream must degrade
    to the batch's own entries instead of dying with AttributeError,
    and the next real batch must still produce correct output."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_translation_spark.streaming import stream_near_dup

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    pq.write_table(
        pa.Table.from_pandas(empty, preserve_index=False),
        os.path.join(in_dir, "a_empty.parquet"),
    )
    q = stream_near_dup(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        str(tmp_path / "reg"), jaccard_threshold=0.5,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    real = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["same text here", "same text here"]}
    )
    pq.write_table(
        pa.Table.from_pandas(real, preserve_index=False),
        os.path.join(in_dir, "b_real.parquet"),
    )
    q2 = stream_near_dup(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        str(tmp_path / "reg"), jaccard_threshold=0.5,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(300)
    rows = {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert rows[1]["canonical_id"] == 1 and not rows[1]["is_exact_dup"]
    assert rows[2]["canonical_id"] == 1 and rows[2]["is_exact_dup"]


def test_stream_near_dup_registry_reads_are_pruned(spark, tmp_path):
    """VERDICT r3 item 3: per-batch registry I/O must scale with the
    batch's probed bucket set, not the history size. The registries are
    written partitioned by a 256-way key prefix; a pruned load must
    touch ONLY the probed partition dirs' files (observed via
    input_file_name(), which reports the files actually scanned AFTER
    partition pruning)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ocr_translation_spark.sources.catalog import Catalog
    from ocr_translation_spark.streaming import stream_near_dup
    from ocr_translation_spark.streaming.neardup_stream import (
        BAND_REGISTRY,
        SIG_REGISTRY,
    )

    in_dir, _ = _split_documents(tmp_path, n_chunks=2)
    q = stream_near_dup(
        spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        str(tmp_path / "reg"), jaccard_threshold=0.5,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    cat = Catalog(spark, str(tmp_path / "reg"))
    for table in (BAND_REGISTRY, SIG_REGISTRY):
        full = cat.load_cache(table, "k" if table == BAND_REGISTRY else "fp")
        all_ps = sorted(
            r["p"] for r in full.select("p").distinct().collect()
        )
        assert len(all_ps) > 20, "history spans many prefix partitions"
        probe = all_ps[:2]  # a batch probing 2 of the prefixes
        pruned = cat.load_cache(
            table, "k" if table == BAND_REGISTRY else "fp",
            where=F.col("p").isin(probe),
        )
        # file-level evidence at the scan layer (input_file_name is
        # evaluated at scan time, AFTER partition pruning; load_cache's
        # window clears it, so probe the same filtered scan directly)
        raw = spark.read.parquet(str(tmp_path / "reg" / table))
        files = {
            r[0]
            for r in raw.filter(F.col("p").isin(probe))
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        total_files = {
            r[0]
            for r in raw.select(F.input_file_name()).distinct().collect()
        }
        # only files under the probed partition dirs were scanned
        assert files, "pruned read returned no files"
        assert all(any(f"/p={p}/" in f for p in probe) for f in files), files
        assert len(files) < len(total_files) / 5, (
            len(files), len(total_files),
        )
        # and the pruned view is exactly the full view restricted to
        # the probed partitions (existing-wins unaffected by pruning)
        a = sorted(map(tuple, pruned.drop("p").collect()))
        bfull = sorted(
            map(tuple, full.filter(F.col("p").isin(probe)).drop("p").collect())
        )
        assert a == bfull


def test_stream_near_dup_registry_cap_logged_not_silent(spark, tmp_path):
    """max_registry_bucket: a hot REGISTRY band bucket (many distinct
    docs colliding in one band) is dropped from candidate generation
    with a logged count — the stream completes and stays precise."""
    import io
    import logging

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_translation_spark.streaming import stream_near_dup

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # batch 1: 30 distinct docs sharing a long common prefix -> their
    # signatures collide in at least one band (jaccard ~0.9 pairwise)
    base_txt = "alpha bravo charlie delta echo foxtrot golf hotel india"
    b1 = pd.DataFrame(
        {
            "doc_id": list(range(30)),
            "text": [f"{base_txt} tail{i}" for i in range(30)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(b1, preserve_index=False),
        os.path.join(in_dir, "a.parquet"),
    )
    # batch 2: one more member of the family
    b2 = pd.DataFrame({"doc_id": [100], "text": [f"{base_txt} tail100"]})
    pq.write_table(
        pa.Table.from_pandas(b2, preserve_index=False),
        os.path.join(in_dir, "b.parquet"),
    )

    log = logging.getLogger("ocr_translation_spark.lsh")
    buf = io.StringIO()
    h = logging.StreamHandler(buf)
    log.addHandler(h)
    try:
        q = stream_near_dup(
            spark, in_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
            str(tmp_path / "reg"), jaccard_threshold=0.5,
            max_files_per_trigger=1, max_registry_bucket=5,
        )
        q.awaitTermination(300)
    finally:
        log.removeHandler(h)
    assert "dropping" in buf.getvalue()  # cap hit, loudly
    rows = {
        r["doc_id"]: r
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert set(rows) == set(range(30)) | {100}
    # precision still holds for whatever WAS flagged
    for d, r in rows.items():
        if r["near_dup_of"] is not None:
            assert r["near_dup_of"] < d
            assert r["est_jaccard"] >= 0.5
