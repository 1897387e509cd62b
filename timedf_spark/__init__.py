"""timedf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of intel-ai/timedf, re-expressed Spark-first.

The reference (/root/reference) is a pandas-API benchmark harness; its
workloads define WHAT we compute (SURVEY.md §2's operator inventory), while
everything here is idiomatic PySpark: declarative DataFrame plans optimized
by Catalyst/Tungsten/AQE, with Pandas UDFs only where built-ins genuinely
cannot express the semantics.

Layout:
  session    — SparkSession factory with scale-ready conf profiles (ref: timedf/backend.py)
  timer      — nested hierarchical wall-clock timer (ref: timedf/timer.py)
  benchmark  — workload registry + results shape (ref: timedf/benchmark.py)
  sources/   — explicit-schema scans, multi-file union ingest, triggers (ref: timedf/benchmark_utils.py:25-74)
  functions/ — pandas-parity expressions, text metrics, vector math
  operators/ — dedup, similarity search, sessionization, splits, multimodal
  queries/   — the reference workloads' query suites on the testdata tables
  streaming/ — Structured Streaming variants (extension layer)
"""

from timedf_spark.session import get_spark, stop_spark
from timedf_spark.timer import Timer

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "Timer", "__version__"]
