"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a count() (no driver-side collect of results);
a warmup pass on the flagship query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

from regpulse_lakehouse_spark.queries import load_all
from regpulse_lakehouse_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("regpulse_bench")
    registry = load_all()

    # Warmup: JVM + codegen + parquet footer reads.
    registry["flagship_pricing_summary"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name, q in sorted(registry.items()):
        start = time.perf_counter()
        q.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "regpulse_lakehouse_spark_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
