import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scraper_spark.session import get_spark  # noqa: E402
from scraper_spark.sources.fixtures import generate  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="scraper_spark_tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Small deterministic crawl corpus: ~170 pages, budgets sized so the
    crawl converges in ~30 rounds."""
    d = str(tmp_path_factory.mktemp("fixtures"))
    generate(d, n_hosts=8, n_urls=150, default_tokens=4, hot_tokens=2)
    return d


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
