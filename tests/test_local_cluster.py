"""True multi-executor evidence: the full extraction pipeline under
``local-cluster[2,2,2048]`` — two REAL executor JVMs with netty
shuffle, executor-side Python workers, and full task serialization
(none of which local[N] threads exercise) — must produce span
sequences identical to the golden spec.

Runs in a subprocess because a JVM can host only one SparkContext
master; the pytest session fixture owns local[4]."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

_SCRIPT = textwrap.dedent(
    """
    import sys, tempfile
    sys.path.insert(0, {repo!r})
    from ocr_translation_spark.session import get_spark
    from ocr_translation_spark.datagen import (
        write_fixture_parquet, gen_documents, gen_media_table,
        collect_media_refs, golden_extracted,
    )
    from ocr_translation_spark.pipeline import extract

    tmpdir = tempfile.mkdtemp(prefix="lc_fixture_")
    write_fixture_parquet(tmpdir, n_docs=40)
    gdocs = gen_documents(40)
    exp = golden_extracted(
        gdocs, gen_media_table(collect_media_refs(gdocs))
    )

    spark = get_spark(
        "lc-e2e", master="local-cluster[2,2,2048]",
        shuffle_partitions=4,
        extra_conf={{"spark.executor.memory": "1g"}},
    )
    # Ship the package to the executors' Python workers — the same
    # mechanism as spark-submit --py-files ocr_translation_spark.zip
    # (jobs/run_extract.py documents the CLI form). local[N] masks
    # this because workers inherit the driver's sys.path; REAL
    # executors do not.
    import shutil
    _zip_dir = tempfile.mkdtemp(prefix="otspark_pkg_")
    zip_path = shutil.make_archive(
        _zip_dir + "/pkg", "zip",
        root_dir={repo!r}, base_dir="ocr_translation_spark",
    )
    spark.sparkContext.addPyFile(zip_path)
    # NOTE: executors fetch the zip LAZILY from the driver's file
    # server, which serves the ORIGINAL path — it must outlive the
    # session (cleanup happens after spark.stop() below)
    # force executor registration with a real distributed job, then
    # count executor JVMs (driver + 2 executors in the memory map)
    import time
    spark.range(10_000).repartition(4).count()
    n_exec = 0
    for _ in range(20):
        n_exec = (
            spark.sparkContext._jsc.sc()
            .getExecutorMemoryStatus().size()
        )
        if n_exec >= 3:
            break
        time.sleep(0.5)
    docs = spark.read.parquet(f"{{tmpdir}}/documents.parquet")
    media = spark.read.parquet(f"{{tmpdir}}/media.parquet")
    res = extract(spark, docs, media)
    got = {{
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"]) for s in r["spans"]
        ]
        for r in res.result.select("doc_id", "spans").collect()
    }}
    mism = sum(
        1
        for d, spans in exp.items()
        if got.get(d)
        != [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    )
    spark.stop()
    shutil.rmtree(_zip_dir, ignore_errors=True)
    print(
        f"RESULT n_exec={{n_exec}} docs={{len(got)}} "
        f"expected={{len(exp)}} mism={{mism}}"
    )
    """
)


def test_extract_golden_equality_on_real_executors():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=570,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    line = next(
        (ln for ln in out.splitlines() if ln.startswith("RESULT ")),
        None,
    )
    assert line is not None, out[-3000:]
    fields = dict(kv.split("=") for kv in line.split()[1:])
    # driver + 2 executor JVMs register in the memory status map
    assert int(fields["n_exec"]) >= 3, line
    # gen_documents(n) appends the EDGE_DOC_IDS fixtures past n — the
    # golden dict is the authoritative expected count
    assert int(fields["docs"]) == int(fields["expected"]), line
    assert int(fields["mism"]) == 0, line


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
