import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="lucene_solr_spark-tests",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def tiny_corpus():
    from lucene_solr_spark import fixtures

    return fixtures.make_transcripts(n_convs=fixtures.SCALES["tiny"])


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus):
    from lucene_solr_spark.index.builder import build_index, transcripts_from_pandas

    df = transcripts_from_pandas(spark, tiny_corpus)
    return build_index(df, num_partitions=4)


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus):
    from lucene_solr_spark.search.oracle import build_oracle_index

    return build_oracle_index(tiny_corpus["text"].tolist())
