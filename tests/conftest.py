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
    """Small deterministic crawl corpus: ~170 pages, budgets sized so
    the crawl converges in ~17 rounds (per-round Spark job latency is
    ~4 s at local[8], so round count dominates suite wall time; the
    hot-host budget still undercuts the default so politeness windows
    and multi-round drains stay exercised)."""
    d = str(tmp_path_factory.mktemp("fixtures"))
    generate(d, n_hosts=8, n_urls=150, default_tokens=8, hot_tokens=3)
    return d


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
