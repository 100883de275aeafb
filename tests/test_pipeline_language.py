"""Pipeline-language tests: every template form in SURVEY.md §1.2, the
step-runner semantics of §2.4 (L1-L8), and an end-to-end YAML pipeline
matching a hand-built DataFrame result — the analog of what the
reference's sample*.yml pipelines smoke-test."""

import datetime as dt
import os

import pytest

from shared_etl_pipelines_spark.plans import (
    PipelineRunner,
    PipelineSpec,
    Registry,
    Scope,
    TemplateError,
    plugin,
)


def mk_scope(**bindings):
    return Scope(
        bindings=bindings,
        env={"basedir": "/lake", "workdir": "/scratch"},
        now=dt.datetime(2026, 3, 27, 14, 30, 59),
        run_id="abc12345",
    )


# -- template engine --------------------------------------------------------

def test_var_substitution_transitive():
    s = mk_scope(
        prism_type="ts", prism_measure="ppt", prism_period="day",
        base="{prism_type}/{prism_measure}/{prism_period}",
        url="ftp://prism.example.org/{base}",
    )
    assert s.render("{url}") == "ftp://prism.example.org/ts/ppt/day"


def test_env_and_sys_now_formats():
    s = mk_scope()
    assert s.render("{env.basedir}/data") == "/lake/data"
    assert s.render("{sys.now.yymmdd}-{sys.now.hhmmss}") == "260327-143059"
    assert s.render("{sys.now.yyyymmdd}") == "20260327"
    assert s.render("{sys.now.yyyy}") == "2026"
    assert s.render("{sys.run.short_id}") == "abc12345"


def test_expr_range_end_exclusive():
    s = mk_scope(start_year=2008, end_year=2026)
    assert s.render("{expr.range(2008, 2011)}") == [2008, 2009, 2010]
    # var args (county_daily_aggregate_parent.yml:5-7)
    years = s.render("{expr.range(start_year, end_year)}")
    assert years[0] == 2008 and years[-1] == 2025 and len(years) == 18


def test_expr_date_and_nested_daterange():
    s = mk_scope(year=2024)
    assert s.render("{expr.date(2024, 2, 29)}") == dt.date(2024, 2, 29)
    days = s.render("{expr.daterange(expr.date(year,1,1), expr.date(year,12,31))}")
    assert len(days) == 366  # leap year, inclusive range
    assert days[0] == dt.date(2024, 1, 1) and days[-1] == dt.date(2024, 12, 31)


def test_whole_token_returns_object_embedded_stringifies():
    s = mk_scope(years=[2008, 2009], d=dt.date(2024, 1, 2))
    assert s.render("{years}") == [2008, 2009]
    assert s.render("year={d}") == "year=2024-01-02"


def test_json_embedded_template():
    # sentinel/...michigan.yml:50 — JSON braces survive, inner var resolves
    s = mk_scope(max_cloud_cover=20)
    out = s.render('{"eo:cloud_cover":{"lt":{max_cloud_cover}}}')
    assert out == '{"eo:cloud_cover":{"lt":20}}'


def test_output_var_field_access():
    s = mk_scope(vector_facts={"vector_facts_json": "/out/facts.json"})
    assert s.render("{vector_facts.vector_facts_json}") == "/out/facts.json"


def test_item_binding_and_template_cycle():
    s = mk_scope(a="{b}", b="{a}")
    child = s.child({"item": 2013})
    assert child.render("{item}/prism_{item}.zip") == "2013/prism_2013.zip"
    with pytest.raises(TemplateError):
        s.render("{a}")


def test_unknown_name_raises():
    with pytest.raises(TemplateError):
        mk_scope().render("{nope}")


def test_render_nested_containers():
    s = mk_scope(year=2020)
    out = s.render({"paths": ["{year}/a", "{year}/b"], "y": "{year}"})
    assert out == {"paths": ["2020/a", "2020/b"], "y": 2020}


# -- spec parsing -----------------------------------------------------------

SAMPLE_YAML = """
project_id: default
vars:
  years: "{expr.range(2008, 2010)}"
  base: "data/{sys.now.yyyy}"
dirs:
  outdir: "{base}/out"
steps:
  - name: "{sys.step.NN}_echo"
    plugin: echo
    args: {message: "hello {env.basedir}"}
    output_var: greeting
"""


def test_spec_from_yaml_text():
    spec = PipelineSpec.from_yaml(SAMPLE_YAML)
    assert spec.project_id == "default"
    assert spec.steps[0].plugin == "echo"
    assert spec.steps[0].output_var == "greeting"


def test_spec_unknown_step_key_rejected():
    with pytest.raises(ValueError):
        PipelineSpec.from_yaml("steps:\n  - plugin: echo\n    bogus: 1\n")


# -- runner -----------------------------------------------------------------

CALLS: list = []


@plugin("_record")
def _record(ctx, **args):
    CALLS.append(args.get("tag"))
    return {"tag": args.get("tag"), "n": len(CALLS)}


@pytest.fixture
def runner(spark):
    return PipelineRunner(
        spark,
        env={"basedir": "/lake"},
        now=dt.datetime(2026, 3, 27, 12, 0, 0),
    )


def test_step_numbering_and_output_var(runner):
    spec = PipelineSpec.from_yaml(SAMPLE_YAML)
    res = runner.run(spec)
    assert res.steps_run == ["01_echo"]
    assert res.outputs["greeting"]["message"] == "hello /lake"


def test_foreach_parallel_order_preserved(runner):
    CALLS.clear()
    spec = PipelineSpec.from_yaml(
        """
vars:
  years: "{expr.range(2000, 2004)}"
steps:
  - plugin: _record
    foreach: "{years}"
    args: {tag: "{item}"}
    output_var: runs
"""
    )
    res = runner.run(spec)
    assert [r["tag"] for r in res.outputs["runs"]] == [2000, 2001, 2002, 2003]
    assert sorted(CALLS) == [2000, 2001, 2002, 2003]


def test_sequential_foreach_strict_order(runner):
    CALLS.clear()
    spec = PipelineSpec.from_yaml(
        """
vars:
  days: "{expr.daterange(expr.date(2024,1,1), expr.date(2024,1,4))}"
steps:
  - plugin: _record
    sequential_foreach: "{days}"
    args: {tag: "day={item}"}
"""
    )
    runner.run(spec)
    # embedded {item} stringifies; strict sequential order preserved
    assert CALLS == ["day=2024-01-01", "day=2024-01-02", "day=2024-01-03", "day=2024-01-04"]


def test_requires_pipelines_memoized(runner, tmp_path):
    CALLS.clear()
    up = tmp_path / "upstream.yml"
    up.write_text("steps:\n  - plugin: _record\n    args: {tag: up}\n")
    down1 = tmp_path / "down1.yml"
    down1.write_text(
        "requires_pipelines:\n  - upstream.yml\n"
        "steps:\n  - plugin: _record\n    args: {tag: d1}\n"
    )
    sub = tmp_path / "sub"
    sub.mkdir()
    down2 = sub / "down2.yml"  # cross-directory relative path
    down2.write_text(
        "requires_pipelines:\n  - ../upstream.yml\n  - ../down1.yml\n"
        "steps:\n  - plugin: _record\n    args: {tag: d2}\n"
    )
    runner.run(str(down2))
    assert CALLS == ["up", "d1", "d2"]  # upstream ran exactly once
    runner.run(str(down1))
    assert CALLS == ["up", "d1", "d2"]  # fully memoized


def test_pipeline_execute_vars_kv(runner, tmp_path):
    CALLS.clear()
    child = tmp_path / "child.yml"
    child.write_text(
        "vars: {year: 1900}\n"
        "steps:\n  - plugin: _record\n    args: {tag: \"{year}\"}\n"
    )
    parent = tmp_path / "parent.yml"
    parent.write_text(
        """
vars:
  years: "{expr.range(2020, 2023)}"
steps:
  - plugin: pipeline_execute
    foreach: "{years}"
    parallel_with: year_children
    args:
      pipeline_path: child.yml
      mode: synchronized
      vars_kv: "year={item}"
"""
    )
    runner.run(str(parent))
    assert sorted(CALLS) == [2020, 2021, 2022]


def test_parallel_with_groups_join_before_next_step(runner):
    CALLS.clear()
    spec = PipelineSpec.from_yaml(
        """
steps:
  - plugin: _record
    parallel_with: grp
    args: {tag: a}
    output_var: a
  - plugin: _record
    parallel_with: grp
    args: {tag: b}
  - plugin: _record
    args: {tag: after}
"""
    )
    res = runner.run(spec)
    assert set(CALLS[:2]) == {"a", "b"} and CALLS[2] == "after"
    assert res.outputs["a"]["tag"] == "a"


def test_write_parquet_skip_if_exists(runner, spark, tmp_path):
    out = str(tmp_path / "t.parquet")
    df = spark.range(3)
    from shared_etl_pipelines_spark.plans.builtins import write_parquet
    from shared_etl_pipelines_spark.plans.runner import StepContext
    from shared_etl_pipelines_spark.plans.spec import StepSpec

    ctx = StepContext(
        spark=spark, scope=mk_scope(), runner=runner,
        spec=PipelineSpec(), step=StepSpec(name="w", plugin="write_parquet"),
    )
    r1 = write_parquet(ctx, df=df, out=out, overwrite=False)
    r2 = write_parquet(ctx, df=df, out=out, overwrite=False)  # L7 memoization
    r3 = write_parquet(ctx, df=df, out=out, overwrite=True)
    assert (r1["skipped"], r2["skipped"], r3["skipped"]) == (False, True, False)


# -- end-to-end dataflow pipeline ------------------------------------------

CORN_YAML = """
project_id: default
vars:
  factor: 4
steps:
  - name: "{sys.step.NN}_load_part"
    plugin: read_parquet
    args: {path: "{sf_dir}/part.parquet"}
    output_var: part

  - name: "{sys.step.NN}_fine_grid"
    plugin: select_cols
    args:
      df: "{part.df}"
      cols:
        - "p_partkey % 16 AS fy"
        - "CAST(FLOOR(p_partkey / 16) AS BIGINT) % 16 AS fx"
        - "p_size"
    output_var: fine

  - name: "{sys.step.NN}_mask"
    plugin: value_mask
    args: {df: "{fine.df}", column: p_size, include_values: [1, 5]}
    output_var: masked

  - name: "{sys.step.NN}_regrid"
    plugin: regrid_average
    args:
      df: "{masked.df}"
      fine_cols: [fy, fx]
      factor: "{factor}"
      value_col: mask
      coarse_cols: [y, x]
      out_col: w
    output_var: weights

  - name: "{sys.step.NN}_load_lineitem"
    plugin: read_parquet
    args: {path: "{sf_dir}/lineitem.parquet"}
    output_var: lineitem

  - name: "{sys.step.NN}_daily"
    plugin: select_cols
    args:
      df: "{lineitem.df}"
      cols:
        - "l_orderkey % 4 AS y"
        - "l_suppkey % 4 AS x"
        - "CAST(l_shipdate AS DATE) AS day"
        - "l_quantity AS v"
    output_var: daily

  - name: "{sys.step.NN}_weighted"
    plugin: multiply_join
    args:
      df: "{daily.df}"
      weights: "{weights.df}"
      on: [y, x]
      value_col: v
      weight_col: w
    output_var: cells

  - name: "{sys.step.NN}_agg"
    plugin: sql
    args:
      views: {cells: "{cells.df}"}
      query: >
        SELECT y AS zone, CAST(year(day) AS BIGINT) AS yr,
               SUM(v * w) / SUM(w) AS crop_wavg, SUM(w) AS crop_wavg_weight
        FROM cells GROUP BY 1, 2
    output_var: result
"""


def test_corn_pipeline_matches_direct_query(runner, spark, sf_dir):
    """§3.3 flagship as YAML == the directly-composed query (one lazy plan)."""
    from shared_etl_pipelines_spark.queries import REGISTRY

    spec = PipelineSpec.from_yaml(CORN_YAML)
    spec.vars["sf_dir"] = sf_dir
    res = runner.run(spec)
    got = {
        (r["zone"], r["yr"]): (r["crop_wavg"], r["crop_wavg_weight"])
        for r in res.outputs["result"]["df"].collect()
    }
    want = {
        (r["zone"], r["yr"]): (r["crop_wavg"], r["crop_wavg_weight"])
        for r in REGISTRY["crop_weighted_pipeline"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for k in got:  # want side passed through round_floats(4)
        assert got[k][0] == pytest.approx(want[k][0], abs=1e-4)
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-4)


def test_run_manifest_records_lineage(spark, sf_dir, tmp_path):
    """Each run writes a lineage manifest: dataset identity, upstream
    pipeline edges (with their dataset_ids), steps run (SURVEY.md §1.4)."""
    import json
    import os

    from shared_etl_pipelines_spark.plans import PipelineRunner

    examples = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "shared_etl_pipelines_spark", "plans", "examples",
    )
    runner = PipelineRunner(spark, env={"sf_dir": sf_dir, "basedir": str(tmp_path)})
    res = runner.run(os.path.join(examples, "rollsum_daily.yml"))
    assert res.manifest_path and os.path.exists(res.manifest_path)
    doc = json.load(open(res.manifest_path))
    assert doc["pipeline"].endswith("rollsum_daily.yml")
    assert doc["steps_run"] == res.steps_run
    assert doc["finished_unix"] >= doc["started_unix"]
    # the upstream stage pipeline is recorded as a lineage edge with its
    # own manifest pointer
    assert len(doc["requires"]) == 1
    up = doc["requires"][0]
    assert up["pipeline"].endswith("stage_daily_cells.yml")
    assert up["manifest"] and os.path.exists(up["manifest"])
    # two manifests on disk: upstream + this run
    runs = os.listdir(str(tmp_path / ".runs"))
    assert len([f for f in runs if f.endswith(".json")]) == 2
