from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Pin the TwoNN probe count to the oracle-proven default BEFORE any test
# module import can pull in bench.py (whose setdefault("...", "64") would
# otherwise leak into the registry import and flip the
# vector_intrinsic_dimension oracle text for the WHOLE pytest process —
# making the snapshot content-hash tests order-dependent).
os.environ.setdefault("SPARK_GRAFT_TWONN_PROBES", "256")

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
