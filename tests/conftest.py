from __future__ import annotations

import pytest

from real_time_data_pipeline_spark.operators import cache
from real_time_data_pipeline_spark.session import get_spark


@pytest.fixture(autouse=True)
def _release_tracked_persists():
    """Unit tests that call tracked-persist operators directly (tfidf,
    bm25, oov_rate, BPE, ...) are not required to release; do it for
    them at teardown so cached blocks never leak across test files —
    test_cache_discipline asserts a session-wide zero."""
    yield
    try:
        cache.release_all()
    except Exception:
        pass


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
