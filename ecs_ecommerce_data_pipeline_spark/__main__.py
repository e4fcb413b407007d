"""Command-line interface: the engine as a tool, not just a library.

    python -m ecs_ecommerce_data_pipeline_spark list
    python -m ecs_ecommerce_data_pipeline_spark run daily_kpis --sf-dir /root/testdata/sf0.01 --limit 20
    python -m ecs_ecommerce_data_pipeline_spark explain tpch_q21_waiting_supplier
    python -m ecs_ecommerce_data_pipeline_spark oracle daily_kpis

``run`` prints the result as JSON lines (machine-consumable); ``explain``
prints the formatted physical plan (the 100 TB review artifact);
``oracle`` prints the query's DuckDB oracle SQL, which doubles as
executable documentation of its semantics.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ecs_ecommerce_data_pipeline_spark",
        description="PySpark-native analytics engine CLI",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list every registered query")

    run = sub.add_parser("run", help="run a query, print JSON lines")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument(
        "--limit",
        type=int,
        default=1000,
        help="max rows printed (default 1000 — the driver boundary stays "
        "bounded unless explicitly widened); 0 = all rows",
    )

    exp = sub.add_parser("explain", help="print the formatted physical plan")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    orc = sub.add_parser("oracle", help="print the query's oracle SQL")
    orc.add_argument("query")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from . import catalog

    if args.cmd == "list":
        oracles = catalog.oracle_sql()
        for name in catalog.queries():
            gate = "oracle" if name in oracles else "rows-only"
            print(f"{name}\t{gate}")
        return 0

    if args.cmd == "oracle":
        sql = catalog.oracle_sql().get(args.query)
        if sql is None:
            print(f"no oracle for {args.query!r}", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    qs = catalog.queries()
    if args.query not in qs:
        print(f"unknown query {args.query!r} (see `list`)", file=sys.stderr)
        return 1

    from pyspark.sql import SparkSession

    from .session import get_spark

    # only stop the session if this invocation created it (embedded use —
    # e.g. tests — passes through an already-active session)
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"cli:{args.cmd}:{args.query}")
    try:
        df = qs[args.query](spark, args.sf_dir)
        if args.cmd == "explain":
            print(
                spark._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
                    df._jdf.queryExecution(), "formatted"
                )
            )
            return 0
        # default-capped display collect: unbounded output is an explicit
        # opt-in (--limit 0), matching the engine's driver-boundary
        # discipline everywhere else
        rows = df.limit(args.limit).collect() if args.limit > 0 else df.collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        return 0
    finally:
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `... | head` closed the pipe: not an error
        sys.exit(0)
