import pytest


@pytest.fixture(scope="session")
def spark():
    from address_parser_spark.session import get_spark

    spark = get_spark(
        "tests",
        master="local[4]",
        extra_confs={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def gaz():
    from address_parser_spark.gazetteer import synth_gazetteer

    return synth_gazetteer()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end jobs (spark-submit smoke)")
