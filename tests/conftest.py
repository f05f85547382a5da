import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="session")
def spark():
    from wikiprep_spark.plans.session import build_session

    spark = build_session(
        app_name="wikiprep-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield spark
    spark.stop()
