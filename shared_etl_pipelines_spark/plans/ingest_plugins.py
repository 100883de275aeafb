"""Pipeline plugin bindings for the ingestion + catalog operators.

Arg names match the reference invocation contracts verbatim (SURVEY.md
§2.1/§2.3) so a reference pipeline document ports by changing only the
plugin internals, not the YAML.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from shared_etl_pipelines_spark.plans.registry import plugin
from shared_etl_pipelines_spark.plans.runner import StepContext
from shared_etl_pipelines_spark.sources import catalog as C
from shared_etl_pipelines_spark.sources import ingest as I


@plugin("web_download_list")
def web_download_list(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return I.web_download_list(**_b(args, "overwrite", "conditional_get"))


@plugin("ftp_download_tree")
def ftp_download_tree(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return I.ftp_download_tree(**_b(args, "overwrite", "recursive"))


@plugin("archive_extract")
def archive_extract(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return I.archive_extract(**_b(args, "overwrite"))


@plugin("gzip_extract")
def gzip_extract(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return I.gzip_extract(**_b(args, "overwrite"))


@plugin("stac_asset_download")
def stac_asset_download(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return I.stac_asset_download(**_b(args, "overwrite", "save_item_json"))


@plugin("vector_facts")
def vector_facts(
    ctx: StepContext, df: DataFrame | None = None, input_path: str | None = None,
    output_dir: str = ".", name: str | None = None, **_: Any,
) -> dict[str, Any]:
    if df is None:
        df = ctx.spark.read.parquet(input_path)
    return C.vector_facts(df, output_dir, name=name or "dataset")


@plugin("ai_dataset_evidence_bundle")
def ai_dataset_evidence_bundle(
    ctx: StepContext, df: DataFrame | None = None, input_path: str | None = None,
    **args: Any,
) -> dict[str, Any]:
    if df is None:
        df = ctx.spark.read.parquet(input_path)
    return C.evidence_bundle(df, **args)


@plugin("ai_dataset_research")
def ai_dataset_research(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return C.dataset_research(**args)


@plugin("catalog_json_upsert")
def catalog_json_upsert(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return C.catalog_json_upsert(**args)


@plugin("catalog_yaml_sync")
def catalog_yaml_sync(ctx: StepContext, **args: Any) -> dict[str, Any]:
    return C.catalog_yaml_sync(**_b(args, "overwrite_managed_fields"))


def _b(args: dict[str, Any], *bool_keys: str) -> dict[str, Any]:
    """YAML/templating may deliver booleans as strings — normalize."""
    out = dict(args)
    for k in bool_keys:
        if k in out and isinstance(out[k], str):
            out[k] = out[k].strip().lower() in ("true", "1", "yes")
    return out
