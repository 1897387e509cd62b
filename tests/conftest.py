import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from timedf_spark.session import get_spark

    s = get_spark(app_name="timedf_spark_tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(autouse=True)
def _isolate_bench_chunks_pin(monkeypatch, tmp_path):
    """bench._plan_chunks persists chunk layout to the committed
    BENCH_CHUNKS.json; tests must never rewrite the repo's pin."""
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_CHUNKS_PIN", str(tmp_path / "chunks_pin.json")
    )
