"""Self-service CLI — the engine's analog of dropping a YAML into
``configs/sources/`` (ref: dags/dag_factory.py:100-106, where every YAML in
the directory becomes a scheduled DAG).

    python -m data_engineering_etl_self_service_spark run <spec.yaml> [--ds YYYY-MM-DD]
    python -m data_engineering_etl_self_service_spark run-dir <configs/> [--ds YYYY-MM-DD]
    python -m data_engineering_etl_self_service_spark backfill <spec.yaml> --start A --end B
    python -m data_engineering_etl_self_service_spark query <name> [--sf-dir DIR]

Exit code 0 = published, 2 = data-quality failure (quarantined) — the
branch the reference routed to a Slack alert (ref: dags/dag_factory.py:74-87)
is here an exit status plus a structured report on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def _report_json(result) -> str:
    return json.dumps(
        {
            "dag_id": result.spec.dag_id,
            "passed": result.passed,
            "published_path": result.published_path,
            "quarantined_path": result.quarantined_path,
            "n_rows": result.n_rows,
            "failures": result.report.failures,
            "metrics": result.metrics,
        }
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_engineering_etl_self_service_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run one pipeline spec")
    p_run.add_argument("spec")
    p_run.add_argument("--ds", default=None)

    p_dir = sub.add_parser("run-dir", help="run every spec in a directory")
    p_dir.add_argument("config_dir")
    p_dir.add_argument("--ds", default=None)

    p_bf = sub.add_parser(
        "backfill", help="run one spec over an inclusive ds date range"
    )
    p_bf.add_argument("spec")
    p_bf.add_argument("--start", required=True)
    p_bf.add_argument("--end", required=True)

    p_q = sub.add_parser("query", help="run a named query and show it")
    p_q.add_argument("name")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_q.add_argument("--limit", type=int, default=20)

    p_e = sub.add_parser(
        "explain", help="print a named query's formatted physical plan"
    )
    p_e.add_argument("name")
    p_e.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    args = ap.parse_args(argv)

    from . import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")

    if args.cmd in ("query", "explain"):
        from .queries import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query '{args.name}'; known: {sorted(QUERIES)}",
                  file=sys.stderr)
            return 1
        df = QUERIES[args.name](spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    from .plans.pipeline import backfill, run_pipeline
    from .plans.spec import load_spec, load_specs

    if args.cmd == "backfill":
        from datetime import date, timedelta

        d0, d1 = date.fromisoformat(args.start), date.fromisoformat(args.end)
        days = [
            (d0 + timedelta(days=i)).isoformat()
            for i in range((d1 - d0).days + 1)
        ]
        worst = 0
        for result in backfill(spark, load_spec(args.spec), days):
            print(_report_json(result))
            if not result.passed:
                worst = 2
        return worst

    specs = (
        [load_spec(args.spec)]
        if args.cmd == "run"
        else load_specs(args.config_dir)
    )
    worst = 0
    for spec in specs:
        result = run_pipeline(spark, spec, ds=args.ds)
        print(_report_json(result))
        if not result.passed:
            worst = 2
    return worst


if __name__ == "__main__":
    sys.exit(main())
