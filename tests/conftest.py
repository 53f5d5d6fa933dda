from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from moisturizer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="moisturizer_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield session
    session.stop()


@pytest.fixture()
def warehouse():
    path = tempfile.mkdtemp(prefix="msw_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
