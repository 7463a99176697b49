"""Dump .explain("formatted") for named queries to plans/<tag>/<q>_<suffix>.txt
(guide §1: capture plan shape — Exchange count, join strategy,
PushedFilters/ReadSchema, codegen spans, Python eval nodes — before and
after every change).

Usage: python scripts/dump_plans.py <tag> <suffix> <query> [<query> ...]
       python scripts/dump_plans.py <tag> <suffix> --headline
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pucminas_data_pipelines_spark.plans import QUERIES
from pucminas_data_pipelines_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if names == ["--headline"]:
        import bench

        names = [n for n in bench.HEADLINE if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dump-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_MEM", "8g")},
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
