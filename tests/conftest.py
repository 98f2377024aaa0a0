import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from cianparser_spark.engine.session import get_spark

    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_run_dir():
    d = tempfile.mkdtemp(prefix="cianspark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
