import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from elasticsearch_spark.session import get_spark

    spark = get_spark(
        "pytest",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tmp_index_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("indices")
    yield str(root)
    shutil.rmtree(str(root), ignore_errors=True)
