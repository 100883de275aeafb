"""CLI surface: list-queries enumerates the registry; run executes a
pipeline document through the runner (reference CLI parity, SURVEY §3.1)."""

import io
import json
import os
from contextlib import redirect_stdout

import cli


def test_list_queries_enumerates_registry():
    from shared_etl_pipelines_spark.queries import REGISTRY

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.main(["list-queries"]) == 0
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == len(REGISTRY)
    # r10 invariant: the last rows-only sketches gained oracle-backed
    # error bands — every registry entry is oracle-checked
    assert not any("[rows-only]" in l for l in lines)
    assert all("[oracle]" in l for l in lines)


def test_kv_parsing_and_env_errors():
    import pytest

    assert cli._parse_kv(["a=1", "b=x=y"]) == {"a": "1", "b": "x=y"}
    with pytest.raises(SystemExit):
        cli._parse_kv(["nope"])
    with pytest.raises(SystemExit):
        cli._load_env("does-not-exist", None)
    assert cli._load_env(None, None) == {}


def test_run_pipeline_via_cli(sf_dir):
    examples = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "shared_etl_pipelines_spark", "plans", "examples", "crop_weighted.yml",
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert cli.main(["run", examples, "--var", f"sf_dir={sf_dir}"]) == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["steps"]["result"] is not None


def test_explain_via_cli(sf_dir, capfd):
    assert cli.main(["explain", "pricing_summary", "--sf-dir", sf_dir]) == 0
    out = capfd.readouterr().out
    assert "Physical Plan" in out and "HashAggregate" in out
