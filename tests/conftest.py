from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataingestionplayground_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


FIXTURE_DIR = Path(__file__).resolve().parent / "fixtures" / "markdown"


@pytest.fixture(scope="session")
def md_fixture_dir():
    return str(FIXTURE_DIR)
