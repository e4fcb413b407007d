"""Per-query profiling harness for the optimization rounds.

Runs selected catalog queries at a given SF with the noop sink
(guide §1.4) N times each, labels jobs (§1.5), and prints per-query
wall seconds plus a first-vs-warm split so codegen cost is visible.

Usage:
    python tools/profile_queries.py q1 q2 ...        # noop-timed queries
    python tools/profile_queries.py --explain q1 ... # also dump plans
    env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecs_ecommerce_data_pipeline_spark import catalog  # noqa: E402
from ecs_ecommerce_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile")
    qs = catalog.queries()
    # a light warmup so the JVM/codegen baseline matches bench.py
    qs["daily_kpis"](spark, sf_dir).count()
    for name in args:
        if name not in qs:
            print(f"{name}: NOT IN CATALOG")
            continue
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: runs={times}")
        if explain:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            out = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                os.environ.get("PLANS_ROUND", "r12"),
                f"{name}_{os.environ.get('PLAN_SUFFIX', 'current')}.txt",
            )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
