import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from macocu_crawler_spark.session import get_spark

    spark = get_spark(app_name="macocu-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    from macocu_crawler_spark.fixtures import write_fixtures

    out = str(tmp_path_factory.mktemp("webfix"))
    write_fixtures(out)
    return out


@pytest.fixture(scope="session")
def fixture_web():
    from macocu_crawler_spark.fixtures import build_web, compute_oracle_columns

    web = build_web()
    compute_oracle_columns(web)
    return web


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
