"""Workload registry + result validation (capability parity with
timedf/benchmark.py:8-87 and the measured-run loop of
timedf/scripts/benchmark_run.py:52-122, written fresh for Spark).

A workload is stage-oriented: named stages, each a function
(spark, sf_dir, state) -> DataFrame | None, timed with the nested Timer.
Because Spark fuses lazily, each timed stage ends in an explicit action
barrier (noop write via sources.trigger) — the Spark analogue of the
reference's Backend.trigger_execution (SURVEY.md §4.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.sources import trigger
from timedf_spark.timer import Timer

__all__ = ["Workload", "BenchmarkResult", "run_workload", "REGISTRY", "register"]

StageFn = Callable[[SparkSession, str, dict], Optional[DataFrame]]


@dataclass
class Workload:
    name: str
    stages: list[tuple[str, StageFn]]
    description: str = ""


@dataclass
class BenchmarkResult:
    workload: str
    sf_dir: str
    iteration: int
    measurements: dict[str, float] = field(default_factory=dict)
    params: dict[str, Any] = field(default_factory=dict)

    def validate(self) -> None:
        """Result-shape check (ref: BenchmarkResults validation,
        timedf/benchmark.py:27-61): names non-empty, durations finite+positive."""
        if not self.measurements:
            raise ValueError("no measurements recorded")
        for name, dur in self.measurements.items():
            if not name or not isinstance(dur, float) or dur < 0:
                raise ValueError(f"bad measurement {name!r}: {dur!r}")


REGISTRY: dict[str, Workload] = {}


def register(w: Workload) -> Workload:
    REGISTRY[w.name] = w
    return w


def run_workload(
    spark: SparkSession,
    workload: Workload,
    sf_dir: str,
    iteration: int = 0,
    verbosity: int = 0,
) -> BenchmarkResult:
    tm = Timer(verbosity=verbosity)
    state: dict = {}
    with tm.timeit("total"):
        for stage_name, fn in workload.stages:
            with tm.timeit(stage_name):
                out = fn(spark, sf_dir, state)
                if out is not None:
                    trigger(out)  # action barrier: stage time includes its work
    res = BenchmarkResult(
        workload=workload.name,
        sf_dir=sf_dir,
        iteration=iteration,
        measurements=tm.results(),
    )
    res.validate()
    return res


# ---- built-in workloads (the reference's three, on testdata) --------------


def _taxi_stages() -> list[tuple[str, StageFn]]:
    from timedf_spark.queries import taxi
    from timedf_spark.sources import load_table

    def load(spark, sf_dir, state):
        df = load_table(spark, sf_dir, "lineitem").cache()
        state["lineitem"] = df
        return df

    def mk(qfn):
        return lambda spark, sf_dir, state: qfn(spark, sf_dir)

    return [("load_data", load)] + [
        (name, mk(spec.fn)) for name, spec in taxi.SUITE.items()
    ]


def _ml_stages() -> list[tuple[str, StageFn]]:
    from timedf_spark import ml
    from timedf_spark.queries.ml_etl import ml_features, ml_filter

    def filter_df(spark, sf_dir, state):
        return ml_filter(spark, sf_dir)

    def features(spark, sf_dir, state):
        state["features"] = ml_features(spark, sf_dir).cache()
        return state["features"]

    def split(spark, sf_dir, state):
        train, test = ml.random_split(state["features"], 0.2, seed=1, id_col="o_orderkey")
        state["train"], state["test"] = train, test
        return train

    def train(spark, sf_dir, state):
        # K4 completion: distributed GBT regression (ny_taxi_ml.py:222-258
        # ends in xgb.train; stock Spark ML supplies the boosted trees here)
        state["model"] = ml.fit_gbt(
            state["train"], ["price_k", "o_day", "price_grid"], "dist", max_iter=10
        )
        return None

    def predict(spark, sf_dir, state):
        return ml.predict_assembled(
            state["model"], state["test"], ["price_k", "o_day", "price_grid"]
        )

    return [
        ("filter_df", filter_df),
        ("feature_engineering", features),
        ("split_time", split),
        ("train_time", train),
        ("predict_time", predict),
    ]


def _plasticc_stages() -> list[tuple[str, StageFn]]:
    from timedf_spark.queries import plasticc
    from timedf_spark.queries.ml_train import plasticc_forest_train

    def etl(spark, sf_dir, state):
        return plasticc.etl_features_join(spark, sf_dir)

    def train(spark, sf_dir, state):
        # K5 completion: multi-class forest + weighted logloss (the
        # reference's t_ml stage, plasticc_pandas_modin.py:163-228)
        return plasticc_forest_train(spark, sf_dir)

    return [("t_etl", etl), ("t_ml", train)]


register(Workload("ny_taxi", _taxi_stages(), "4 OLAP aggregation queries (D1-D4)"))
register(Workload("ny_taxi_ml", _ml_stages(), "ETL + filter + features + split + train"))
register(Workload("plasticc", _plasticc_stages(), "multi-agg + features + metadata join"))
