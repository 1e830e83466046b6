import pytest

from eva_opentargets_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def terms(spark):
    from eva_opentargets_spark.sources.dictionary import demo_terms

    return demo_terms(spark).cache()


@pytest.fixture(scope="session")
def xrefs(spark):
    from eva_opentargets_spark.sources.dictionary import demo_xrefs

    return demo_xrefs(spark).cache()
