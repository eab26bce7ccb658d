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
