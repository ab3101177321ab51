import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep unit tests light


@pytest.fixture(scope="session")
def spark():
    from osm_pbf_convert_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
