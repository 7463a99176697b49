"""CLI entry point — the spark-submit surface (reference C6: the EMR step
runs ``spark-submit ... titanic_example_delta.py``; here any registered
query runs the same way):

    spark-submit --master local[8] -m pucminas_data_pipelines_spark.cli \
        --query q1_pricing_summary --sf-dir /root/testdata/sf0.01

or plain ``python -m pucminas_data_pipelines_spark.cli --list``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pucminas-spark-engine")
    parser.add_argument("--query", help="registered query name")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    parser.add_argument("--list", action="store_true", help="list queries")
    parser.add_argument("--show", type=int, default=20, help="rows to show")
    parser.add_argument("--explain", action="store_true", help="print the plan")
    parser.add_argument(
        "--verify",
        action="store_true",
        help="also run the query's DuckDB oracle and compare (exit 1 on mismatch)",
    )
    args = parser.parse_args(argv)

    from pucminas_data_pipelines_spark.plans import ORACLES, QUERIES

    if args.list:
        for name in sorted(QUERIES):
            tag = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    if not args.query:
        parser.error("--query or --list required")
    if args.query not in QUERIES:
        parser.error(f"unknown query {args.query!r} (use --list)")

    from pucminas_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name=f"cli:{args.query}")
    t0 = time.perf_counter()
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain(mode="formatted")
    n = df.count()
    df.show(args.show, truncate=False)
    verified: bool | None = None
    if args.verify:
        if args.query not in ORACLES:
            print(f"{args.query}: rows-only (no oracle registered)")
        else:
            import duckdb

            from pucminas_data_pipelines_spark.tables import TABLE_NAMES

            con = duckdb.connect()
            for t in TABLE_NAMES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{args.sf_dir.rstrip('/')}/{t}.parquet'"
                )
            duck = sorted(con.sql(ORACLES[args.query]).fetchall())
            ours = sorted(tuple(r) for r in df.collect())
            verified = duck == ours
    print(
        json.dumps(
            {
                "query": args.query,
                "rows": n,
                "seconds": round(time.perf_counter() - t0, 3),
                "sf_dir": args.sf_dir,
                **({} if verified is None else {"oracle_match": verified}),
            }
        )
    )
    spark.stop()
    return 0 if verified in (None, True) else 1


if __name__ == "__main__":
    sys.exit(main())
