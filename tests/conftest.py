import os

import pytest

os.environ.setdefault("SPARK_GRAFT_TEST_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from wifi_location_data_pipeline_spark.session import build_session

    spark = build_session(
        app_name="engine-tests",
        master=f"local[{os.environ['SPARK_GRAFT_TEST_CPUS']}]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
