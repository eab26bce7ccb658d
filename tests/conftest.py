import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastie_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="fastie_spark_tests",
                  shuffle_partitions=8)
    yield s
    s.stop()


def count_jobs(spark, action):
    """Number of Spark jobs triggered by action() (via a throwaway job
    group). With AQE enabled each materialized shuffle query stage shows up
    as its own job, so callers pinning '1 action = 1 job' should disable
    AQE around the probe."""
    import uuid

    sc = spark.sparkContext
    g = f"jobcount-{uuid.uuid4().hex}"
    sc.setJobGroup(g, "job-count probe")
    try:
        action()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(g))


@pytest.fixture()
def no_aqe(spark):
    """Temporarily disable AQE so job counts map 1:1 to actions."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old)


@pytest.fixture(scope="session")
def vocab():
    from fastie_spark.fixtures import build_vocab

    return build_vocab(seed=42)


@pytest.fixture(scope="session")
def pages(vocab):
    from fastie_spark.fixtures import build_pages

    return build_pages(vocab, n_docs=80, seed=7)


@pytest.fixture(scope="session")
def pages_df(spark, pages):
    return spark.createDataFrame(
        pages, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
