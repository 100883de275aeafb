"""Code-corpus ingestion codecs: nbformat-4 conversion and the Git LFS
spec/v1 pointer classifier."""

import hashlib

import pytest

from shared_etl_pipelines_spark.sources import lfs as L
from shared_etl_pipelines_spark.sources import notebooks as NB


def _nb(cells):
    return NB.build_notebook(cells)


def test_notebook_census_counts_cells_and_outputs():
    blob = _nb([
        {"cell_type": "code", "source": ["x = 1\n", "y = 2\n"],
         "execution_count": 1,
         "outputs": [
             {"output_type": "stream", "name": "stdout", "text": ["a", "bc"]},
             {"output_type": "execute_result",
              "data": {"text/plain": "3", "image/png": "AAAA"}},
         ]},
        {"cell_type": "markdown", "source": "# title"},
        {"cell_type": "raw", "source": "meta"},
    ])
    o = NB.parse_notebook(blob)
    assert o["language"] == "python"
    code = o["cells"][0]
    assert code["n_lines"] == 3 and code["n_chars"] == 12
    assert code["n_outputs"] == 2
    assert code["output_bytes"] == 3 + 1 + 4  # stream + text/plain + png
    assert code["image_outputs"] == 1
    md = o["cells"][1]
    assert (md["n_lines"], md["n_chars"], md["n_outputs"]) == (1, 7, 0)


def test_notebook_to_script_strips_outputs_and_raw():
    blob = _nb([
        {"cell_type": "code", "source": "print('hi')",
         "outputs": [{"output_type": "stream", "text": "hi\n"}]},
        {"cell_type": "markdown", "source": "Title\n\nbody"},
        {"cell_type": "raw", "source": "SECRET-RAW"},
    ])
    s = NB.notebook_to_script(blob)
    assert s == (
        "# %%\nprint('hi')\n\n# %% [markdown]\n# Title\n#\n# body\n"
    )
    assert "SECRET-RAW" not in s


def test_notebook_refusals():
    with pytest.raises(ValueError, match="nbformat"):
        NB.parse_notebook(b'{"nbformat": 3, "cells": []}')
    with pytest.raises(ValueError, match="not UTF-8 JSON"):
        NB.parse_notebook(b"\xff\xfenot json")
    with pytest.raises(ValueError, match="cell_type"):
        NB.parse_notebook(
            _nb([{"cell_type": "mystery", "source": ""}])
        )
    with pytest.raises(ValueError, match="source"):
        NB.parse_notebook(_nb([{"cell_type": "code", "source": 42}]))


def test_lfs_roundtrip_and_strictness():
    oid = hashlib.sha256(b"x").hexdigest()
    blob = L.build_lfs_pointer(oid, 999, extra={"x-k": "v"})
    assert L.is_probably_pointer(blob)
    p = L.parse_lfs_pointer(blob)
    assert p == {"oid": oid, "size": 999, "extra_keys": ["x-k"]}
    cases = {
        "short oid": blob.replace(oid.encode(), oid[:60].encode()),
        "crlf": blob.replace(b"\n", b"\r\n"),
        "unsorted keys": (
            b"version https://git-lfs.github.com/spec/v1\n"
            b"size 5\noid sha256:" + oid.encode() + b"\n"
        ),
        "dup key": blob + b"size 999\n",
        "bad size": blob.replace(b"size 999", b"size -1"),
    }
    for label, bad in cases.items():
        with pytest.raises(ValueError):
            L.parse_lfs_pointer(bad)
    assert not L.is_probably_pointer(b"print('hello')\n")
    assert not L.is_probably_pointer(b"v" * 2000)


def test_notebook_to_script_refuses_v3(tmp_path):
    """A v3 notebook (code cells keyed 'input') must quarantine in
    notebook_to_script too, not convert to empty '# %%' stubs
    (ADVICE r10)."""
    import json

    import pytest

    v3 = json.dumps(
        {
            "nbformat": 3,
            "worksheets": [
                {"cells": [{"cell_type": "code", "input": "print(1)"}]}
            ],
        }
    ).encode()
    with pytest.raises(ValueError, match="nbformat 3"):
        NB.notebook_to_script(v3)
    bad_cell = json.dumps(
        {"nbformat": 4, "cells": [{"cell_type": "widget", "source": "x"}]}
    ).encode()
    with pytest.raises(ValueError, match="unknown cell_type"):
        NB.notebook_to_script(bad_cell)
