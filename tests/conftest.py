import pytest

from stats_spark.session import get_spark
from stats_spark.datagen import corpus


@pytest.fixture(scope="session")
def spark():
    s = get_spark("stats_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def t1(spark):
    """Smoke-tier corpus paths (60 convs), generated once and cached."""
    return corpus.ensure_corpus("t1")


@pytest.fixture(scope="session")
def t1_pandas():
    return corpus.generate_pandas(corpus.TIERS["t1"])
