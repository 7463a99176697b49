"""In-process pipeline composition — the engine's replacement for the
reference's Airflow control plane (SURVEY.md §2.2, C1–C10).

Mapping (dags/indicadores_titanic.py):
- C1 @dag definition            → Pipeline(name, stages)
- C2 Dummy start/end markers    → implicit (run() boundaries)
- C3 @task python nodes         → Stage(fn)
- C4 cluster provisioner        → session factory (get_spark) — the
                                  'cluster' is the SparkSession
- C5/C7 waiters (poll AWS)      → synchronous execution /
                                  StreamingQuery.awaitTermination
- C6 job submitter              → direct function call (or cli.py under
                                  spark-submit)
- C8 cluster teardown           → spark.stop() (optional, run(stop=True))
- C9 dependency wiring (>>)     → stage order + explicit depends_on
- C10 Variable.get secrets      → environment variables, read lazily at
                                  run time (the reference reads them at
                                  import time — an anti-pattern, SURVEY §3)

Data flows between stages as DataFrames/values in a context dict — the
in-process, type-safe version of XCom scalars (C9's value edges).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class Stage:
    """One pipeline node (reference C3). ``fn(spark, ctx)`` may read prior
    stages' outputs from ctx and returns this stage's output."""

    name: str
    fn: Callable[[SparkSession, dict], object]
    depends_on: tuple[str, ...] = ()


@dataclass
class StageResult:
    name: str
    seconds: float
    output: object


@dataclass
class Pipeline:
    """A one-shot batch pipeline (reference C1's schedule_interval='@once').

    Stages run in declaration order; declared dependencies are validated
    (every dependency must already have run — the >> wiring of C9)."""

    name: str
    stages: list[Stage] = field(default_factory=list)

    def stage(self, name: str, depends_on: tuple[str, ...] = ()):
        """Decorator: @pipeline.stage('load') — the @task analogue."""

        def deco(fn):
            self.stages.append(Stage(name, fn, depends_on))
            return fn

        return deco

    def run(
        self, spark: SparkSession, stop: bool = False
    ) -> dict[str, StageResult]:
        done: dict[str, StageResult] = {}
        ctx: dict[str, object] = {}
        try:
            for stage in self.stages:
                missing = [d for d in stage.depends_on if d not in done]
                if missing:
                    raise ValueError(
                        f"stage {stage.name!r} depends on unfinished {missing}"
                    )
                t0 = time.perf_counter()
                out = stage.fn(spark, ctx)
                ctx[stage.name] = out
                done[stage.name] = StageResult(
                    stage.name, time.perf_counter() - t0, out
                )
        finally:
            if stop:
                spark.stop()  # C8 teardown
        return done


def get_secret(name: str, default: str | None = None) -> str | None:
    """C10 analogue: config/secret lookup from the environment at call
    time (never at import time, never hard-coded)."""
    return os.environ.get(name, default)
