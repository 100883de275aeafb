"""Command-line entry point, mirroring the reference orchestrator's CLI
(``python cli.py run prism/download.yml --env hpcc_msu --project-id default``,
reference pipelines/prism/README.md:12-14).

Subcommands:

  run <pipeline.yml>      run a YAML pipeline document (requires_pipelines
                          upstreams first), with --env / --project-id /
                          --var k=v overrides
  query <name>            run one registry query against --sf-dir and print
                          up to --limit rows
  explain <name>          print a registry query's physical plan
                          (--mode formatted|extended|codegen|...)
  list-queries            list every named query with its doc line
  envs                    show how environment bindings are resolved

Environment bindings (``{env.*}`` templates): ``--env NAME`` loads
``envs/NAME.yml`` (a flat mapping) relative to the repo or the pipeline
file; ``--env-kv k=v`` pairs add/override individual bindings. Both are
optional — pipelines that never reference ``{env.*}`` run without any.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _parse_kv(pairs: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"expected k=v, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def _load_env(name: str | None, pipeline_path: str | None) -> dict[str, str]:
    if not name:
        return {}
    import yaml

    candidates = [os.path.join(os.path.dirname(os.path.abspath(__file__)), "envs", f"{name}.yml")]
    if pipeline_path:
        candidates.append(
            os.path.join(os.path.dirname(os.path.abspath(pipeline_path)), "envs", f"{name}.yml")
        )
    for c in candidates:
        if os.path.exists(c):
            with open(c) as f:
                data = yaml.safe_load(f) or {}
            if not isinstance(data, dict):
                raise SystemExit(f"env file {c} must be a flat mapping")
            return {str(k): v for k, v in data.items()}
    raise SystemExit(f"no env file found for --env {name} (tried {candidates})")


def cmd_run(args: argparse.Namespace) -> int:
    from shared_etl_pipelines_spark.engine import get_spark
    from shared_etl_pipelines_spark.plans import PipelineRunner, PipelineSpec

    spec = PipelineSpec.from_yaml(args.pipeline)
    if args.project_id and spec.project_id not in ("default", args.project_id):
        raise SystemExit(
            f"--project-id {args.project_id} does not match pipeline "
            f"project_id {spec.project_id}"
        )
    env = _load_env(args.env, args.pipeline)
    env.update(_parse_kv(args.env_kv))
    overrides = _parse_kv(args.var)
    spark = get_spark(f"run:{os.path.basename(args.pipeline)}")
    runner = PipelineRunner(spark, env=env)
    result = runner.run(spec if not spec.path else args.pipeline, var_overrides=overrides or None)
    summary = {}
    for name, out in result.outputs.items():
        if isinstance(out, dict):
            summary[name] = {
                k: v for k, v in out.items() if isinstance(v, (str, int, float, bool))
            }
        else:
            summary[name] = str(type(out).__name__)
    print(json.dumps({"pipeline": args.pipeline, "steps": summary}, default=str))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from shared_etl_pipelines_spark.engine import get_spark
    from shared_etl_pipelines_spark.queries import REGISTRY

    if args.name not in REGISTRY:
        raise SystemExit(f"unknown query {args.name!r}; see list-queries")
    spark = get_spark(f"query:{args.name}")
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    from shared_etl_pipelines_spark.engine import get_spark
    from shared_etl_pipelines_spark.queries import REGISTRY

    if args.name not in REGISTRY:
        raise SystemExit(f"unknown query {args.name!r}; see list-queries")
    spark = get_spark(f"explain:{args.name}")
    df = REGISTRY[args.name].fn(spark, args.sf_dir)
    df.explain(args.mode)
    return 0


def cmd_list_queries(_: argparse.Namespace) -> int:
    from shared_etl_pipelines_spark.queries import REGISTRY

    width = max(len(n) for n in REGISTRY)
    for name in sorted(REGISTRY):
        qd = REGISTRY[name]
        oracle = "oracle" if qd.sql else "rows-only"
        print(f"{name:<{width}}  [{oracle}]  {qd.doc}")
    return 0


def cmd_envs(_: argparse.Namespace) -> int:
    print(__doc__.split("Environment bindings")[1])
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cli.py")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run a YAML pipeline document")
    run_p.add_argument("pipeline")
    run_p.add_argument("--env", default=None, help="environment name (envs/<name>.yml)")
    run_p.add_argument("--env-kv", action="append", default=[], metavar="K=V")
    run_p.add_argument("--project-id", default=None)
    run_p.add_argument("--var", action="append", default=[], metavar="K=V",
                       help="override a pipeline var (the CLI form of vars_kv)")
    run_p.set_defaults(fn=cmd_run)

    q_p = sub.add_parser("query", help="run one registry query")
    q_p.add_argument("name")
    q_p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    q_p.add_argument("--limit", type=int, default=20)
    q_p.set_defaults(fn=cmd_query)

    ex_p = sub.add_parser("explain", help="print a registry query's physical plan")
    ex_p.add_argument("name")
    ex_p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ex_p.add_argument("--mode", default="formatted",
                      choices=["simple", "extended", "formatted", "cost", "codegen"])
    ex_p.set_defaults(fn=cmd_explain)

    lq_p = sub.add_parser("list-queries", help="list registry queries")
    lq_p.set_defaults(fn=cmd_list_queries)

    env_p = sub.add_parser("envs", help="how env bindings resolve")
    env_p.set_defaults(fn=cmd_envs)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
