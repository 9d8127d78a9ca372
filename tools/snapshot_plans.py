#!/usr/bin/env python
"""Regenerate tests/data/plan_golden.json — the per-headline-query physical-
plan feature snapshot that tests/test_plan_golden.py diffs against.

Run after an INTENTIONAL plan change (new query, optimization, Spark
upgrade), review the JSON diff like any golden, and commit it:

    python tools/snapshot_plans.py

Must use the same session shape as the test fixture (8 shuffle partitions,
8 cores, sf0.001) so literals-independent features line up exactly.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from backend_big_data_spark.plans.all_plans import QUERIES  # noqa: E402
from backend_big_data_spark.plans.audit import plan_features  # noqa: E402
from backend_big_data_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests/data/plan_golden.json"


def main() -> None:
    from backend_big_data_spark.text.dedup import release_dedup_caches

    spark = get_spark(app_name="snapshot_plans", shuffle_partitions=8)
    golden = {}
    for name in sorted(HEADLINE):
        # clean cache-manager state per query — mirrors the test: a plan's
        # features must not depend on which queries composed before it
        release_dedup_caches()
        spark.catalog.clearCache()
        golden[name] = plan_features(QUERIES[name](spark, SF))
    OUT.write_text(json.dumps(golden, indent=2, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({len(golden)} queries)")


if __name__ == "__main__":
    main()
