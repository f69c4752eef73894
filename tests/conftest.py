import os
import sys

sys.path.insert(0, os.path.dirname(__file__))  # for oracle_ref
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import pytest


@pytest.fixture(scope="session")
def spark():
    from sparkocr.session import build_session

    s = build_session("sparkocr-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(tmp_path_factory):
    """Deterministic tiny-profile transcripts parquet (FIXTURES.md §1)."""
    from sparkocr.datagen import write_transcripts

    path = str(tmp_path_factory.mktemp("data") / "transcripts_tiny.parquet")
    write_transcripts(path, "tiny")
    return path
