"""Pipeline language layer: YAML spec -> template scope -> executed DAG.

Mirrors the reference's pipeline-document semantics (SURVEY.md §1, §2.4)
on top of the operator library; dataflow steps compose into one lazy
Catalyst plan.
"""

from shared_etl_pipelines_spark.plans import builtins  # registers built-in plugins
from shared_etl_pipelines_spark.plans import ingest_plugins  # noqa: F401  (ditto)
from shared_etl_pipelines_spark.plans.registry import Registry, builtin_names, plugin
from shared_etl_pipelines_spark.plans.runner import PipelineRunner, RunResult, StepContext
from shared_etl_pipelines_spark.plans.spec import PipelineSpec, StepSpec
from shared_etl_pipelines_spark.plans.template import Scope, TemplateError

__all__ = [
    "PipelineRunner",
    "PipelineSpec",
    "Registry",
    "RunResult",
    "Scope",
    "StepContext",
    "StepSpec",
    "TemplateError",
    "builtin_names",
    "builtins",
    "plugin",
]
