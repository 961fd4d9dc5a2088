from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ocr_translation_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Deterministic span-document fixtures at unit scale (100 docs)."""
    from ocr_translation_spark.datagen import write_fixture_parquet

    d = tmp_path_factory.mktemp("fixtures")
    write_fixture_parquet(str(d), n_docs=100)
    return str(d)


def load_fixture(spark, fixture_dir, name):
    return spark.read.parquet(f"{fixture_dir}/{name}.parquet")
