import os
import sys

import pytest

# the Python Data Source workers (spawned by the JVM) must be able to
# import liq_stream_spark; the JVM inherits this env at session launch
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from liq_stream_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="liq_stream_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
