"""Plugin registry: named operators callable from pipeline steps.

The reference distinguishes BUILT-IN plugins (``plugin: ftp_download_tree``)
from repo-relative SCRIPT plugins (``plugin: geo/geo_raster_spi.py``), with
script lookup governed by prioritized asset-source overlays
(``pipeline_asset_sources`` — project assets at priority 100 shadow shared
assets at priority 200, pipelines/sample_step.yml:111-127). SURVEY.md §2,
§3.1 step 6.

Here both kinds resolve through one registry:

- built-ins register under their bare name via @plugin("name");
- "script path" names (anything containing '/' or ending '.py') resolve
  through ``asset_sources`` overlays — ordered (priority, mapping) pairs
  where a mapping maps script path -> callable. Python-module overlays can
  be mounted with :func:`mount_module` (every public callable becomes
  ``<prefix>/<fn_name>.py``).

A plugin is ``fn(ctx, **args) -> dict | None``; the dict is the step's
result object, addressable downstream as ``{output_var.field}``.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable

PluginFn = Callable[..., "dict[str, Any] | None"]

_BUILTINS: dict[str, PluginFn] = {}


def plugin(name: str) -> Callable[[PluginFn], PluginFn]:
    def deco(fn: PluginFn) -> PluginFn:
        _BUILTINS[name] = fn
        return fn

    return deco


def builtin_names() -> list[str]:
    return sorted(_BUILTINS)


class Registry:
    """Resolution order: exact built-in name, then script-path overlays by
    ascending priority (lower number = higher precedence, matching the
    reference's project=100-over-shared=200 convention)."""

    def __init__(self) -> None:
        self.asset_sources: list[tuple[int, dict[str, PluginFn]]] = []

    def add_asset_source(self, priority: int, scripts: dict[str, PluginFn]) -> None:
        self.asset_sources.append((priority, dict(scripts)))
        self.asset_sources.sort(key=lambda t: t[0])

    def mount_module(self, priority: int, prefix: str, module: Any) -> None:
        scripts: dict[str, PluginFn] = {}
        for name, fn in inspect.getmembers(module, callable):
            if not name.startswith("_"):
                scripts[f"{prefix}/{name}.py"] = fn
        self.add_asset_source(priority, scripts)

    def resolve(self, name: str) -> PluginFn:
        if name in _BUILTINS:
            return _BUILTINS[name]
        for _prio, scripts in self.asset_sources:
            if name in scripts:
                return scripts[name]
        # bare-name fallback for script plugins registered with .py suffix
        for _prio, scripts in self.asset_sources:
            for k, fn in scripts.items():
                if k.rsplit("/", 1)[-1] in (name, f"{name}.py"):
                    return fn
        raise KeyError(f"unknown plugin: {name!r}")
