from __future__ import annotations

import shutil
import tempfile

import pytest

from embulk_filter_copy_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="efc-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="efc-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
