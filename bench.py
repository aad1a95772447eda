#!/usr/bin/env python
"""Benchmark harness: runs every declared probe end-to-end at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_word_counts": sec, ...}, "sf": 0.1}

Protocol mirrors BASELINE.md: ``time.monotonic()`` around each full
pipeline (plan construction through ``collect()``), one session warm-up run
excluded from timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_hadoop_spark.probes import QUERIES  # noqa: E402
from big_data_hadoop_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")

    # Warm-up (JVM/codegen/session) — excluded from timings.
    QUERIES["q01_word_counts"](spark, sf_dir).collect()

    only = os.environ.get("BENCH_ONLY")
    names = only.split(",") if only else list(QUERIES)
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared-probe suite wall-clock, end-to-end per query",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
