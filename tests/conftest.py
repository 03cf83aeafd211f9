import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from invariantbitpacking_spark.session import get_spark

    s = get_spark("ibp-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tokens_df(spark):
    from invariantbitpacking_spark.sources.tokens import generate_tokens_df

    return generate_tokens_df(spark, 600, seed=42).cache()
