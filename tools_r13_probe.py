#!/usr/bin/env python
"""Round-12 optimization probe: capture `.explain("formatted")` and
min-of-3 timings for named queries (bench methodology: full `.count()`
action per run, fresh Catalyst plan each run; optional noop-sink timing
to separate compute from the count action, guide §1.4).

Usage:
    python tools_r13_probe.py TAG q_name [q_name ...]

Writes plans/r13/<q>_<TAG>.txt and prints one timing line per query.
TAG is `before` / `after` (the judge-facing artifacts) or any scratch
label. SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored as in bench.py.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_tracking_spark.plans import QUERIES  # noqa: E402
from iceberg_tracking_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="r13_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    spark.range(1000).count()
    from iceberg_tracking_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "lineitem").limit(1000).count()
    load_table(spark, SF_DIR, "events").limit(1000).count()
    from bench import CANARY_FLOOR_SEC, _canary_sec

    canary = _canary_sec(spark)
    print(f"# canary {canary:.3f}s (floor {CANARY_FLOOR_SEC}s)")
    for name in names:
        fn = QUERIES[name].fn
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        best_cnt = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best_cnt = min(best_cnt, time.perf_counter() - t0)
        best_noop = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.perf_counter() - t0)
        print(
            f"{name}: count={best_cnt:.3f}s noop={best_noop:.3f}s "
            f"(min of {RUNS})"
        )
    c2 = _canary_sec(spark)
    print(f"# closing canary {c2:.3f}s")


if __name__ == "__main__":
    main()
