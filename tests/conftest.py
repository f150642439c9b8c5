import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pg_pb3_ld_spark.session import build_session

    s = build_session(
        app_name="pg_pb3_ld_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="pb3ld_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
