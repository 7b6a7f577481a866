import pytest


@pytest.fixture(scope="session")
def spark():
    from log_vector_spark.session import get_spark

    s = get_spark("pytest", cpus=8)
    yield s
