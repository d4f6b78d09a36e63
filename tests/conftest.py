import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from productbert_intermediate_spark.session import get_spark
from productbert_intermediate_spark.synth.generator import write_fixtures


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixtures_dir(tmp_path_factory):
    """Small synthetic corpus (FIXTURES.md scale: unit/golden tier)."""
    d = tmp_path_factory.mktemp("fixtures_small")
    write_fixtures(str(d), n_pages=600, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def e2e_dir(tmp_path_factory):
    """E2E-tier corpus (~2,000 pages, FIXTURES.md)."""
    d = tmp_path_factory.mktemp("fixtures_e2e")
    write_fixtures(str(d), n_pages=2000, seed=42)
    return str(d)


# Driver-provided testdata scale used by oracle/contract tests — single
# definition so no module drifts onto a different corpus.
TESTDATA_SF_DIR = "/root/testdata/sf0.001"
