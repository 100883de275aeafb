"""Pipeline runner: YAML spec -> executed DAG of operator steps.

Execution semantics re-expressed from the reference orchestrator's visible
behavior (SURVEY.md §3.1):

1. dependency resolution — ``requires_pipelines`` run first, memoized by
   absolute path (upstreams are existence-checked, not re-run:
   pipelines/prism/stage-ts-ppt-day-state.yml:3-5);
2. scope build — ``vars`` then ``dirs``, transitive templates, per-run
   ``sys.now.*`` / ``sys.run.short_id`` fixed once (pipelines/sample.yml:4);
3. step loop — ``{sys.step.NN}`` numbering, ``foreach`` fan-out bound to
   ``{item}`` (parallel, thread pool over Spark jobs),
   ``sequential_foreach`` strictly ordered
   (county_daily_aggregate_child.yml:33), ``parallel_with`` named async
   groups joined at the next differently-grouped step
   (county_daily_aggregate_parent.yml:21), ``output_var`` result binding
   (pipelines/tiger/county.yml:28-72);
4. recursion — the ``pipeline_execute`` built-in runs child pipelines with
   ``vars_kv`` overrides (county_daily_aggregate_parent.yml:13-22).

Spark-first notes: foreach fan-out that is pure dataflow should be rows,
not loops (SURVEY.md §2.4 L2) — the thread pool exists for ingestion-type
side-effecting steps; concurrent steps share one SparkSession and land in
a scheduler pool named after their group.
"""

from __future__ import annotations

import datetime as _dt
import json as _json
import os
import time as _time
import uuid as _uuid
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from shared_etl_pipelines_spark.plans.registry import Registry
from shared_etl_pipelines_spark.plans.spec import PipelineSpec, StepSpec
from shared_etl_pipelines_spark.plans.template import Scope


@dataclass
class StepContext:
    spark: SparkSession
    scope: Scope
    runner: "PipelineRunner"
    spec: PipelineSpec
    step: StepSpec
    item: Any = None

    def should_skip(self, out_path: str, overwrite: Any) -> bool:
        """Skip-if-exists memoization (L7/P1): raw layers use
        ``overwrite: false`` so reruns are cheap; derived layers recompute
        (download-ts-ppt-day.yml:24 vs :33)."""
        return (not _truthy(overwrite, default=True)) and os.path.exists(out_path)


def _truthy(v: Any, default: bool = False) -> bool:
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("true", "1", "yes")


@dataclass
class RunResult:
    spec: PipelineSpec
    outputs: dict[str, Any] = field(default_factory=dict)
    steps_run: list[str] = field(default_factory=list)
    manifest_path: str | None = None


class PipelineRunner:
    def __init__(
        self,
        spark: SparkSession,
        env: dict[str, Any] | None = None,
        registry: Registry | None = None,
        max_workers: int = 8,
        now: _dt.datetime | None = None,
    ):
        self.spark = spark
        self.env = dict(env or {})
        self.registry = registry or Registry()
        self.max_workers = max_workers
        self.now = now
        self._completed: dict[str, RunResult] = {}  # requires_pipelines memo
        self._pool = ThreadPoolExecutor(max_workers=max_workers)

    # -- public -------------------------------------------------------------

    def run(
        self, pipeline: str | PipelineSpec, var_overrides: dict[str, Any] | None = None
    ) -> RunResult:
        spec = (
            pipeline
            if isinstance(pipeline, PipelineSpec)
            else PipelineSpec.from_yaml(pipeline)
        )
        if spec.path and not var_overrides:
            memo = self._completed.get(spec.path)
            if memo is not None:
                return memo
        for rel in spec.requires_pipelines:
            self._run_upstream(spec, rel)
        started = _time.time()
        result = self._run_steps(spec, var_overrides or {})
        self._write_manifest(spec, result, started)
        if spec.path and not var_overrides:
            self._completed[spec.path] = result
        return result

    # -- internals ----------------------------------------------------------

    def _write_manifest(self, spec: PipelineSpec, result: RunResult, started: float) -> None:
        """Lineage manifest per run (SURVEY.md §1.4): dataset identity,
        upstream pipeline edges, steps executed, output bindings. Written
        under ``{env.basedir}/.runs/`` (the reference keeps run state in a
        git-ignored ``.runs/``); skipped when no basedir is bound."""
        basedir = self.env.get("basedir")
        if not basedir:
            return
        run_id = _uuid.uuid4().hex[:12]
        upstream = []
        for rel in spec.requires_pipelines:
            if spec.path:
                p = os.path.normpath(os.path.join(os.path.dirname(spec.path), rel))
                up = self._completed.get(p)
                upstream.append(
                    {
                        "pipeline": p,
                        "dataset_id": up.spec.dataset_id if up else None,
                        "manifest": up.manifest_path if up else None,
                    }
                )
        doc = {
            "run_id": run_id,
            "pipeline": spec.path,
            "project_id": spec.project_id,
            "dataset_id": spec.dataset_id,
            "requires": upstream,
            "steps_run": result.steps_run,
            "output_vars": sorted(result.outputs),
            "started_unix": round(started, 3),
            "finished_unix": round(_time.time(), 3),
        }
        runs_dir = os.path.join(str(basedir), ".runs")
        os.makedirs(runs_dir, exist_ok=True)
        path = os.path.join(runs_dir, f"{run_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(doc, f, indent=2)
        os.replace(tmp, path)
        result.manifest_path = path

    def _run_upstream(self, spec: PipelineSpec, rel: str) -> None:
        if not spec.path:
            raise ValueError(
                f"pipeline has requires_pipelines {rel!r} but no source path"
            )
        path = os.path.normpath(os.path.join(os.path.dirname(spec.path), rel))
        self.run(path)

    def _build_scope(self, spec: PipelineSpec, overrides: dict[str, Any]) -> Scope:
        scope = Scope(env=self.env, now=self.now)
        # vars top-down so later vars may reference earlier ones; overrides
        # (pipeline_execute vars_kv) shadow the document's values.
        for k, v in spec.vars.items():
            scope.bind(k, overrides.get(k, v))
        for k, v in overrides.items():
            if k not in spec.vars:
                scope.bind(k, v)
        dirs = {k: v for k, v in spec.dirs.items()}
        scope.bind("dirs", dirs)
        for k, v in dirs.items():  # dirs are also addressable bare
            if k not in scope.bindings:
                scope.bind(k, v)
        return scope

    def _run_steps(self, spec: PipelineSpec, overrides: dict[str, Any]) -> RunResult:
        scope = self._build_scope(spec, overrides)
        result = RunResult(spec=spec)
        pending: list[tuple[str, StepSpec, Future]] = []  # parallel_with group

        def join_pending() -> None:
            while pending:
                _group, p_step, fut = pending.pop(0)
                value = fut.result()
                if p_step.output_var:
                    scope.bind(p_step.output_var, value)
                    result.outputs[p_step.output_var] = value

        for i, step in enumerate(spec.steps):
            step_scope = scope.child({})
            step_scope.bind("sys.step.NN", f"{i + 1:02d}")
            name = step_scope.render(step.name)
            if step.parallel_with:
                if pending and pending[0][0] != step.parallel_with:
                    join_pending()
                fut = self._pool.submit(
                    self._exec_step, spec, step, step_scope, step.parallel_with
                )
                pending.append((step.parallel_with, step, fut))
                result.steps_run.append(name)
                continue
            join_pending()
            value = self._exec_step(spec, step, step_scope, None)
            if step.output_var:
                scope.bind(step.output_var, value)
                result.outputs[step.output_var] = value
            result.steps_run.append(name)
        join_pending()
        return result

    def _exec_step(
        self, spec: PipelineSpec, step: StepSpec, scope: Scope, pool: str | None
    ) -> Any:
        if pool:
            # concurrent groups get a scheduler pool so one group cannot
            # starve another on a shared cluster
            self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
        try:
            fan = step.foreach if step.foreach is not None else step.sequential_foreach
            if fan is None:
                return self._invoke(spec, step, scope, item=None)
            items = scope.render(fan)
            if not isinstance(items, list):
                raise TypeError(
                    f"foreach of step {step.name!r} is not a list: {items!r}"
                )
            if step.sequential_foreach is not None:
                return [self._invoke(spec, step, scope, item=it) for it in items]
            futs = [
                self._pool.submit(self._invoke, spec, step, scope, it) for it in items
            ]
            return [f.result() for f in futs]
        finally:
            if pool:
                self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

    def _invoke(self, spec: PipelineSpec, step: StepSpec, scope: Scope, item: Any) -> Any:
        s = scope.child({"item": item}) if item is not None else scope
        args = s.render(step.args)
        fn = self.registry.resolve(step.plugin)
        ctx = StepContext(
            spark=self.spark, scope=s, runner=self, spec=spec, step=step, item=item
        )
        return fn(ctx, **args)
