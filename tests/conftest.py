from __future__ import annotations

import pytest

from memories_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="memories-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _module_cache_sweep(spark):
    """Free cache-manager entries a module's tests left behind (not
    every test calls release_caches — per-call cached intermediates
    otherwise pin driver-heap storage for the whole 45-minute session;
    the round-6 root-cause of the round-5 full-suite flake was driver
    heap exhaustion late in the suite). Engine serving snapshots are
    eager localCheckpoints OUTSIDE the cache manager, so a sweep never
    breaks another module's snapshot identity."""
    yield
    spark.catalog.clearCache()
