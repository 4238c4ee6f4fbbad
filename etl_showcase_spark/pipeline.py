"""Pipeline runner (SURVEY.md §2.12 Q4/Q5): the reference's Airflow DAG
chain `start >> extract >> validate >> transform >> create_tables >>
load >> quality_check >> end` (reference dags/weather_etl_pipeline.py:221)
as plain Python composition — an ordered list of named stages over a
shared context, with the reference's retry semantics
(default_args retries=3 / retry_delay, dags/weather_etl_pipeline.py:38-41)
and hard-failing quality gates (dags/weather_etl_pipeline.py:95-116,
195-215).

Orchestration is deliberately NOT an engine concern beyond this: no
scheduler, no task queue — a stage is a function `ctx -> ctx` where ctx
maps names to DataFrames (or any artifacts). Cluster-side retries of
individual Spark tasks belong to Spark itself; these retries cover
stage-level transients (a flaky source, a sink lease), mirroring the
Airflow layer of the reference.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Mapping, MutableMapping, Sequence
from dataclasses import dataclass, field
from typing import Any

Context = MutableMapping[str, Any]


class QualityGateError(RuntimeError):
    """A validation/quality stage rejected the data (the reference's
    RAISE EXCEPTION path, dags/weather_etl_pipeline.py:208-210)."""


@dataclass(frozen=True)
class Stage:
    name: str
    fn: Callable[[Context], Context | None]
    retries: int = 0  # re-runs on non-gate errors (gates never retry)
    retry_delay_s: float = 0.0


@dataclass
class PipelineReport:
    succeeded: list[str] = field(default_factory=list)
    attempts: dict[str, int] = field(default_factory=dict)


def run_pipeline(stages: Sequence[Stage], ctx: Context | None = None) -> tuple[Context, PipelineReport]:
    """Execute stages in order. A stage returning a mapping replaces the
    context; returning None keeps it (mutation in place is fine).

    QualityGateError always aborts immediately — retrying a
    deterministic data-quality failure only re-reads the same bad data
    (the reference's quality_check likewise fails the DAG run outright).
    Other exceptions retry up to `retries` times per stage.
    """
    ctx = ctx if ctx is not None else {}
    report = PipelineReport()
    for stage in stages:
        attempt = 0
        while True:
            attempt += 1
            try:
                out = stage.fn(ctx)
                if out is not None:
                    ctx = out
                break
            except QualityGateError:
                report.attempts[stage.name] = attempt
                raise
            except Exception:
                if attempt > stage.retries:
                    report.attempts[stage.name] = attempt
                    raise
                if stage.retry_delay_s:
                    time.sleep(stage.retry_delay_s)
        report.attempts[stage.name] = attempt
        report.succeeded.append(stage.name)
    return ctx, report


def gate(name: str, check: Callable[[Context], bool], message: str = "") -> Stage:
    """Build a quality-gate stage: raises QualityGateError when the
    check is false (Q1 pre-transform / Q2 post-load gates)."""

    def _run(ctx: Context) -> None:
        if not check(ctx):
            raise QualityGateError(message or f"quality gate failed: {name}")

    return Stage(name=name, fn=_run)


def observe_quality(df, name: str, metrics: Mapping[str, Any]):
    """Attach free-riding quality metrics to a DataFrame via Spark's
    Observation API: the metrics are computed DURING the frame's next
    action, not by a separate pass — the fix for the reference's
    count()-logging recomputation (SURVEY.md §4.4: the raw JSON is
    re-read up to 6× for logging actions).

    Returns (observed_df, observation); read ``observation.get`` after
    the action has run, e.g. inside a downstream gate stage.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    cols = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *cols), obs


def observation_gate(
    name: str,
    obs,
    check: Callable[[Mapping[str, Any]], bool],
    message: str = "",
) -> Stage:
    """Quality gate over observed metrics (Q2's post-load gate shape,
    reference dags/weather_etl_pipeline.py:195-215, at zero extra
    passes). Must be sequenced after the stage that runs the action."""

    def _run(ctx: Context) -> None:
        got = obs.get
        if not check(got):
            raise QualityGateError(message or f"observation gate failed: {name}: {got}")

    return Stage(name=name, fn=_run)
