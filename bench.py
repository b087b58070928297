#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: one representative per operator family — scan-agg, join,
window/argmax, islands, spatial join, sessionization, dedup (minhash),
similarity (cosine top-k), plus the MOT IoU-argmax. Each timing is the
full action (plan + execute + count) from a cold plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_tracking_spark.plans import QUERIES  # noqa: E402
from iceberg_tracking_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_sum_count",
    "q_equijoin",
    "q_theta_argmax",
    "q_islands",
    "q_grid_join",
    "q_session_window",
    "q_minhash_lsh",
    "q_cosine_topk",
    "q_iou_argmax",
    "q_rollup",
    # scale-path additions: as-of (union+window), LSH-bucketed ANN,
    # token accounting, the full eval-metrics relational job, and the
    # five-way star join
    "q_asof_join",
    "q_ann_lsh",
    "q_token_count",
    "q_eval_metrics",
    "q_star_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}
    # Warm the JVM once (not counted): codegen plus the parquet/Arrow
    # reader paths — classloading on the first columnar scan otherwise
    # bills ~2 s of one-time JVM setup to whichever query runs first.
    spark.range(1000).count()
    from iceberg_tracking_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").limit(1000).count()
    load_table(spark, sf_dir, "events").limit(1000).count()
    for name in HEADLINE:
        q = QUERIES[name]
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
