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
            "quarantined_rows_path": result.quarantined_rows_path,
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

    p_s = sub.add_parser(
        "sql", help="run ANSI SQL over the lake tables (registered as views)"
    )
    p_s.add_argument("query")
    p_s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_s.add_argument("--limit", type=int, default=20)

    p_o = sub.add_parser(
        "optimize",
        help="lake maintenance: compact parquet (optionally z-ordered) "
        "or collapse+vacuum a snapshot table",
    )
    p_o.add_argument("path")
    p_o.add_argument("--out", default=None,
                     help="output path for parquet compaction "
                          "(default: <path>__compact)")
    p_o.add_argument("--target-mb", type=int, default=128)
    p_o.add_argument("--zorder", default=None,
                     help="comma-separated columns to Z-order by")
    p_o.add_argument("--snapshot", action="store_true",
                     help="treat path as a snapshot table: compact the "
                          "latest version and vacuum old ones")
    p_o.add_argument("--keep-last", type=int, default=1)

    args = ap.parse_args(argv)

    from . import get_spark

    spark = get_spark(app_name=f"cli-{args.cmd}")

    if args.cmd == "sql":
        # ad-hoc SQL over the lake: every catalog table becomes a view,
        # Catalyst does the rest — the self-service escape hatch when a
        # question isn't one of the named queries.
        from .catalog import register_views

        register_views(spark, args.sf_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
        return 0

    if args.cmd == "optimize":
        if args.snapshot:
            from .sources.snapshots import (
                compact_snapshot,
                snapshot_stats,
                vacuum,
            )

            v = compact_snapshot(spark, args.path)
            deleted = vacuum(args.path, keep_last=args.keep_last)
            print(json.dumps(
                {"compacted_version": v, "vacuumed_dirs": len(deleted),
                 "history": snapshot_stats(args.path)}
            ))
            return 0
        out = args.out or f"{args.path.rstrip('/')}__compact"
        if args.zorder:
            import math

            from .operators.layout import _input_bytes, zorder_by

            df = spark.read.parquet(args.path)
            n = max(
                1,
                math.ceil(
                    _input_bytes(spark, args.path)
                    / (args.target_mb << 20)
                ),
            )
            zorder_by(
                df, args.zorder.split(","), n_files=n
            ).write.mode("overwrite").parquet(out)
            print(json.dumps({"out": out, "n_files": n,
                              "zorder": args.zorder.split(",")}))
        else:
            from .operators.layout import compact

            n = compact(spark, args.path, out, target_mb=args.target_mb)
            print(json.dumps({"out": out, "n_files": n}))
        return 0

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
