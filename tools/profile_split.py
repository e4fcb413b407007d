"""Build-vs-exec profiling harness (guide §1.1/§1.5 + the round-11
Py4J lesson): for each query, time (a) plan CONSTRUCTION — the
`fn(spark, sf_dir)` call, which pays Py4J round trips, driver-side
collects and any plan-build-time Spark jobs — and (b) EXECUTION of the
already-built DataFrame via the noop sink (§1.4), plus the number of
Spark jobs each phase submitted (statusTracker job ids).

Usage:
    python tools/profile_split.py q1 q2 ...
    PROFILE_RUNS=3 python tools/profile_split.py ...   (default 2)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecs_ecommerce_data_pipeline_spark import catalog  # noqa: E402
from ecs_ecommerce_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-split")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = catalog.queries()
    qs["daily_kpis"](spark, sf_dir).count()  # JVM/codegen warmup

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN CATALOG")
            continue
        rows = []
        for i in range(runs):
            sc.setJobDescription(f"{name} build{i}")
            j0 = jobs()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            j1 = jobs()
            sc.setJobDescription(f"{name} exec{i}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = jobs()
            rows.append(
                (round(t1 - t0, 3), round(t2 - t1, 3), j1 - j0, j2 - j1)
            )
        sc.setJobDescription(None)
        detail = " ".join(
            f"[build {b}s/{jb}j exec {e}s/{je}j]" for b, e, jb, je in rows
        )
        print(f"{name}: {detail}", flush=True)


if __name__ == "__main__":
    main()
