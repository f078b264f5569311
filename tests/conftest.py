import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")

from careers_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "careers_spark_tests",
        cpus=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture()
def work_dir():
    d = tempfile.mkdtemp(prefix="kgtest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
