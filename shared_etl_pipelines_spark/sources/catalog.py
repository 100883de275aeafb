"""Metadata / catalog operators (SURVEY.md §2.3, O2-O6).

- vector_facts (O2): machine-readable dataset profile consumed downstream
  as ``{vector_facts.vector_facts_json}`` (pipelines/tiger/county.yml:36-41,47).
- ai_dataset_evidence_bundle (O3): sample + schema + notes manifest
  (pipelines/tiger/county.yml:42-51).
- ai_dataset_research (O4): out-of-engine LLM enrichment — deterministic
  stub here, marked as such (pipelines/tiger/county.yml:52-64).
- catalog_json_upsert (O5): keyed MERGE into catalog.json by dataset_id
  with ``source_step`` provenance (pipelines/tiger/county.yml:65-72).
- catalog_yaml_sync (O6): field-preserving sync into a YAML catalog dir;
  ``overwrite_managed_fields: false`` keeps human edits
  (pipelines/tiger/county.yml:73-80).

The JSON catalog is the reference's MERGE surface; at warehouse scale the
same upsert is a Delta-style MERGE INTO — here it stays a small driver
file exactly like the reference's catalog.json.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame


def vector_facts(df: DataFrame, output_dir: str, name: str = "dataset") -> dict[str, Any]:
    """O2: profile a DataFrame — schema, row count, per-column null/distinct
    counts. One aggregate pass (no per-column jobs)."""
    from pyspark.sql import functions as F

    n = df.count()
    aggs = []
    for f_ in df.schema.fields:
        aggs.append(F.count(F.col(f_.name)).alias(f"nn_{f_.name}"))
        aggs.append(F.approx_count_distinct(F.col(f_.name)).alias(f"dc_{f_.name}"))
    stats = df.agg(*aggs).collect()[0].asDict() if df.schema.fields else {}
    facts = {
        "name": name,
        "row_count": n,
        "columns": [
            {
                "name": f_.name,
                "type": f_.dataType.simpleString(),
                "nullable": f_.nullable,
                "null_count": n - int(stats.get(f"nn_{f_.name}", n)),
                "approx_distinct": int(stats.get(f"dc_{f_.name}", 0)),
            }
            for f_ in df.schema.fields
        ],
        "schema_json": json.loads(df.schema.json()),
    }
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{name}.vector_facts.json")
    with open(path, "w") as f:
        json.dump(facts, f, indent=1, sort_keys=True)
    return {"vector_facts_json": path, "facts": facts}


def evidence_bundle(
    df: DataFrame,
    dataset_id: str,
    output_dir: str,
    vector_facts_json: str | None = None,
    notes: str = "",
    supplemental_urls_file: str | None = None,
    sample_rows: int = 20,
) -> dict[str, Any]:
    """O3: assemble a cataloging evidence bundle: sample file, schema file,
    notes, optional facts + supplemental URLs."""
    os.makedirs(output_dir, exist_ok=True)
    sample_file = os.path.join(output_dir, f"{dataset_id}.sample.json")
    with open(sample_file, "w") as f:
        json.dump(
            [r.asDict(recursive=True) for r in df.limit(sample_rows).collect()],
            f, indent=1, sort_keys=True, default=str,
        )
    schema_file = os.path.join(output_dir, f"{dataset_id}.schema.json")
    with open(schema_file, "w") as f:
        f.write(df.schema.json())
    notes_file = os.path.join(output_dir, f"{dataset_id}.notes.txt")
    with open(notes_file, "w") as f:
        f.write(notes)
    return {
        "dataset_id": dataset_id,
        "sample_file": sample_file,
        "schema_file": schema_file,
        "notes_file": notes_file,
        "vector_facts_json": vector_facts_json,
        "supplemental_urls_file": supplemental_urls_file,
    }


def dataset_research(
    dataset_id: str,
    output_dir: str,
    title: str = "",
    data_class: str = "RAW",
    artifact_uri: str = "",
    sample_file: str | None = None,
    schema_file: str | None = None,
    notes_file: str | None = None,
    vector_facts_json: str | None = None,
    supplemental_urls_file: str | None = None,
    **_: Any,
) -> dict[str, Any]:
    """O4: dataset research document from the evidence bundle.

    The reference step is LLM-backed metadata research
    (pipelines/tiger/county.yml:52-64) — an out-of-engine enrichment. The
    engine's implementation is a DETERMINISTIC synthesis over the same
    evidence the LLM would read (schema file, sample rows, vector facts,
    notes, supplemental URLs): same inputs -> same document, no model in
    the loop. The output record carries every field the downstream
    ``catalog_json_upsert``/``catalog_yaml_sync`` chain consumes, so the
    O2 -> O3 -> O4 -> O5 -> O6 pipeline runs end to end.
    """
    os.makedirs(output_dir, exist_ok=True)

    columns: list[dict[str, Any]] = []
    if schema_file and os.path.exists(schema_file):
        schema = json.load(open(schema_file))
        for f_ in schema.get("fields", []):
            t = f_.get("type")
            columns.append(
                {"name": f_.get("name"), "type": t if isinstance(t, str) else "nested"}
            )

    sample_rows: list[dict[str, Any]] = []
    if sample_file and os.path.exists(sample_file):
        sample_rows = json.load(open(sample_file))
    for col in columns:
        observed = [r.get(col["name"]) for r in sample_rows]
        non_null = [v for v in observed if v is not None]
        col["sample_nulls"] = len(observed) - len(non_null)
        if non_null:
            col["example"] = non_null[0]

    row_count = None
    if vector_facts_json and os.path.exists(vector_facts_json):
        facts = json.load(open(vector_facts_json))
        row_count = facts.get("row_count")
        fact_cols = {c["name"]: c for c in facts.get("columns", [])}
        for col in columns:
            fc = fact_cols.get(col["name"])
            if fc:
                col["null_count"] = fc.get("null_count")
                col["approx_distinct"] = fc.get("approx_distinct")

    notes = ""
    if notes_file and os.path.exists(notes_file):
        notes = open(notes_file).read().strip()
    urls: list[str] = []
    if supplemental_urls_file and os.path.exists(supplemental_urls_file):
        urls = [
            ln.strip()
            for ln in open(supplemental_urls_file)
            if ln.strip() and not ln.startswith("#")
        ]

    col_phrase = (
        f"{len(columns)} columns ({', '.join(c['name'] for c in columns[:8])}"
        + (", ..." if len(columns) > 8 else "")
        + ")"
        if columns
        else "an unprofiled schema"
    )
    description = (
        f"{title or dataset_id}: {data_class.lower()} dataset with {col_phrase}"
        + (f", {row_count} rows" if row_count is not None else "")
        + (f". {notes}" if notes else ".")
    )
    keywords = sorted(
        {tok for tok in dataset_id.replace(".", "_").split("_") if len(tok) > 2}
        | {c["name"].lower() for c in columns[:16] if c.get("name")}
    )

    record = {
        "dataset_id": dataset_id,
        "title": title or dataset_id,
        "data_class": data_class,
        "artifact_uri": artifact_uri,
        "description": description,
        "columns": columns,
        "row_count": row_count,
        "keywords": keywords,
        "supplemental_urls": urls,
        "evidence": {
            "sample_file": sample_file,
            "schema_file": schema_file,
            "notes_file": notes_file,
            "vector_facts_json": vector_facts_json,
        },
        "generator": "evidence-synthesis-v1",  # deterministic, no LLM
    }
    path = os.path.join(output_dir, f"{dataset_id}.research.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    return {"output_file": path, "record": record}


# Backwards-compatible alias (pre-round-2 name).
dataset_research_stub = dataset_research


def catalog_json_upsert(
    research_file: str | dict[str, Any],
    catalog_json: str,
    project_id: str = "default",
    source_step: str | None = None,
) -> dict[str, Any]:
    """O5: MERGE the research record into catalog.json keyed by dataset_id.

    Read-modify-write with atomic replace; provenance recorded as
    ``source_step`` (the reference writes e.g. '05_ai_research',
    pipelines/tiger/county.yml:71)."""
    record = (
        dict(research_file)
        if isinstance(research_file, dict)
        else json.load(open(research_file))
    )
    dataset_id = record["dataset_id"]
    catalog: dict[str, Any] = {}
    if os.path.exists(catalog_json):
        with open(catalog_json) as f:
            catalog = json.load(f)
    entry = catalog.get(dataset_id, {})
    entry.update(record)
    entry["project_id"] = project_id
    if source_step:
        entry["source_step"] = source_step
    inserted = dataset_id not in catalog
    catalog[dataset_id] = entry
    os.makedirs(os.path.dirname(catalog_json) or ".", exist_ok=True)
    tmp = catalog_json + ".tmp"
    with open(tmp, "w") as f:
        json.dump(catalog, f, indent=1, sort_keys=True)
    os.replace(tmp, catalog_json)
    return {"catalog_json": catalog_json, "dataset_id": dataset_id, "inserted": inserted}


def catalog_yaml_sync(
    dataset_id: str,
    catalog_json: str,
    catalog_repo: str,
    overwrite_managed_fields: bool = False,
) -> dict[str, Any]:
    """O6: sync one catalog entry into a YAML catalog directory.

    Field-level merge: with ``overwrite_managed_fields=False`` existing
    values in the YAML win (human edits preserved); new fields are added
    either way."""
    import yaml

    with open(catalog_json) as f:
        entry = json.load(f)[dataset_id]
    os.makedirs(catalog_repo, exist_ok=True)
    path = os.path.join(catalog_repo, f"{dataset_id}.yml")
    existing: dict[str, Any] = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = yaml.safe_load(f) or {}
    if overwrite_managed_fields:
        merged = {**existing, **entry}
    else:
        merged = {**entry, **existing}  # existing (human) fields win
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        yaml.safe_dump(merged, f, sort_keys=True)
    os.replace(tmp, path)
    return {"path": path, "merged_fields": sorted(merged)}
