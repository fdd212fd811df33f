"""Dump `.explain("formatted")` output per query for the optimization
round's before/after plan evidence (plans/rNN/<query>_<tag>.txt).

Usage: python tools/dump_plans.py <tag> <out_dir> <query> [query ...]

The plan is rendered without executing the final action, but note that
some query builders run bounded preparatory Spark jobs while composing
the frame (size-adaptive counts, iterative fits) — those run here too,
which is what makes the rendered plan the one the bench actually times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from real_time_data_pipeline_spark.operators import cache  # noqa: E402
from real_time_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    out_dir = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} [{tag}] at {sf_dir}\n\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")
        cache.release_all()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
