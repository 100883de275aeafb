"""Pipeline document model.

A pipeline is a YAML document with five top-level sections —
``project_id``, ``requires_pipelines``, ``vars``, ``dirs``, ``steps``
(SURVEY.md §1.1; e.g. pipelines/sample.yml, pipelines/prism/
download-ts-ppt-day.yml). A step carries ``name``, ``plugin``, ``args``,
optional ``foreach``/``sequential_foreach`` fan-out, optional
``parallel_with`` async-group tag, ``output_var`` result binding, and
``resources`` hints (pipelines/prism/stage-ts-ppt-day-mi-spi-3d.yml:23-24).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - yaml is present in this env
    yaml = None


@dataclass
class StepSpec:
    name: str
    plugin: str
    args: dict[str, Any] = field(default_factory=dict)
    foreach: Any = None
    sequential_foreach: Any = None
    parallel_with: str | None = None
    output_var: str | None = None
    resources: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "StepSpec":
        known = {f for f in cls.__dataclass_fields__}
        extra = set(d) - known
        if extra:
            raise ValueError(f"unknown step keys: {sorted(extra)}")
        if "plugin" not in d:
            raise ValueError(f"step missing plugin: {d}")
        # YAML 1.1 reads bare `on:` / `off:` keys as booleans — map them
        # back to the argument names they were written as.
        args = {
            {True: "on", False: "off"}.get(k, k): v
            for k, v in (d.get("args") or {}).items()
        }
        return cls(
            name=d.get("name", d["plugin"]),
            plugin=d["plugin"],
            args=args,
            foreach=d.get("foreach"),
            sequential_foreach=d.get("sequential_foreach"),
            parallel_with=d.get("parallel_with"),
            output_var=d.get("output_var"),
            resources=dict(d.get("resources") or {}),
        )


@dataclass
class PipelineSpec:
    project_id: str = "default"
    requires_pipelines: list[str] = field(default_factory=list)
    vars: dict[str, Any] = field(default_factory=dict)
    dirs: dict[str, Any] = field(default_factory=dict)
    steps: list[StepSpec] = field(default_factory=list)
    dataset_id: str | None = None
    data_class: str | None = None
    path: str | None = None  # source file, for requires_pipelines resolution

    @classmethod
    def from_dict(cls, d: dict[str, Any], path: str | None = None) -> "PipelineSpec":
        return cls(
            project_id=d.get("project_id", "default"),
            requires_pipelines=list(d.get("requires_pipelines") or []),
            vars=dict(d.get("vars") or {}),
            dirs=dict(d.get("dirs") or {}),
            steps=[StepSpec.from_dict(s) for s in (d.get("steps") or [])],
            dataset_id=d.get("dataset_id"),
            data_class=d.get("data_class"),
            path=path,
        )

    @classmethod
    def from_yaml(cls, text_or_path: str) -> "PipelineSpec":
        if yaml is None:
            raise RuntimeError("pyyaml not available")
        if os.path.exists(text_or_path):
            with open(text_or_path) as f:
                return cls.from_dict(yaml.safe_load(f), path=os.path.abspath(text_or_path))
        return cls.from_dict(yaml.safe_load(text_or_path))
