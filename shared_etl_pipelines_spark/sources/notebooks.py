"""Jupyter notebook (nbformat) audit — the code-corpus ingestion pass.

Code training corpora are full of ``.ipynb`` files, and the published
pipelines (The Stack, StarCoder) all convert them the same way: parse
the nbformat-4 JSON (public spec: nbformat.readthedocs.io), DROP the
outputs (they carry base64 blobs, execution counts and PII-adjacent
paths), keep the code/markdown sources in order, and record what was
stripped. This module implements that conversion:

- ``parse_notebook``: nbformat 4.x JSON -> per-cell census
  (cell_type, source line/char counts, output count and byte volume
  by mime class) with the spec's quirks handled: ``source`` may be a
  string OR a list of lines; stream outputs carry ``text``,
  display/execute outputs carry a ``data`` mime bundle.
- ``notebook_to_script``: the training-side conversion — code cells
  concatenated with ``# %%`` cell markers (the jupytext/percent
  convention), markdown as comments, outputs GONE. Deterministic.

Refusals: non-JSON, nbformat != 4, a cells entry that is not an
object, unknown cell_type — all ValueError (quarantine, never guess).
"""

from __future__ import annotations

import json

__all__ = ["parse_notebook", "notebook_to_script", "build_notebook"]


def _validated_nb(blob: bytes) -> dict:
    """Shared intake gate: UTF-8 JSON, nbformat pinned to 4, every cell
    an object with a known cell_type. Both entry points run it, so a
    v3 notebook (code cells keyed 'input') can never convert silently
    to empty '# %%' stubs."""
    try:
        nb = json.loads(blob.decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"ipynb: not UTF-8 JSON — quarantine ({e})") from e
    if not isinstance(nb, dict) or nb.get("nbformat") != 4:
        raise ValueError(
            f"ipynb: nbformat {nb.get('nbformat') if isinstance(nb, dict) else '?'}"
            " unsupported (spec pin: 4) — quarantine"
        )
    for cell in nb.get("cells", []):
        if not isinstance(cell, dict):
            raise ValueError("ipynb: cells entry is not an object — quarantine")
        if cell.get("cell_type") not in ("code", "markdown", "raw"):
            raise ValueError(
                f"ipynb: unknown cell_type {cell.get('cell_type')!r} — quarantine"
            )
    return nb


def _source_text(cell: dict) -> str:
    src = cell.get("source", "")
    if isinstance(src, list):
        if not all(isinstance(s, str) for s in src):
            raise ValueError("ipynb: non-string source line — quarantine")
        return "".join(src)
    if not isinstance(src, str):
        raise ValueError("ipynb: source is neither str nor list — quarantine")
    return src


def parse_notebook(blob: bytes) -> dict:
    nb = _validated_nb(blob)
    cells_out = []
    for cell in nb.get("cells", []):
        ctype = cell.get("cell_type")
        text = _source_text(cell)
        n_out = 0
        out_bytes = 0
        image_outputs = 0
        for out in cell.get("outputs", []) if ctype == "code" else []:
            n_out += 1
            if "text" in out:  # stream output
                t = out["text"]
                out_bytes += len("".join(t) if isinstance(t, list) else t)
            for mime, payload in (out.get("data") or {}).items():
                body = "".join(payload) if isinstance(payload, list) else str(payload)
                out_bytes += len(body)
                if mime.startswith("image/"):
                    image_outputs += 1
        cells_out.append(
            {
                "cell_type": ctype,
                "n_lines": text.count("\n") + (1 if text else 0),
                "n_chars": len(text),
                "n_outputs": n_out,
                "output_bytes": out_bytes,
                "image_outputs": image_outputs,
                "execution_count": cell.get("execution_count"),
            }
        )
    lang = (
        nb.get("metadata", {})
        .get("kernelspec", {})
        .get("language", "")
    )
    return {"language": lang, "cells": cells_out}


def notebook_to_script(blob: bytes) -> str:
    """Outputs-stripped percent-format script — what lands in a
    training corpus. Raw cells drop entirely (spec: passthrough for
    exporters, not source)."""
    nb = _validated_nb(blob)
    parts = []
    for cell in nb.get("cells", []):
        text = _source_text(cell)
        if cell.get("cell_type") == "code":
            parts.append("# %%\n" + text)
        elif cell.get("cell_type") == "markdown":
            commented = "\n".join(
                "# " + ln if ln else "#" for ln in text.split("\n")
            )
            parts.append("# %% [markdown]\n" + commented)
    return "\n\n".join(parts) + ("\n" if parts else "")


def build_notebook(cells: list[dict], language: str = "python") -> bytes:
    """Fixture-grade nbformat-4 writer (sorted keys => deterministic)."""
    return json.dumps(
        {
            "nbformat": 4,
            "nbformat_minor": 5,
            "metadata": {"kernelspec": {"language": language, "name": language}},
            "cells": cells,
        },
        sort_keys=True,
    ).encode("utf-8")
