"""Golden-file plan regression gate over every bench headline query.

test_plan_stability.py asserts hand-picked invariants for a few plans; this
file freezes the full feature vector (shuffle counts, join strategies,
Python-eval nodes, pushdown) for ALL headline queries, so any refactor that
changes a physical plan — intentionally or not — shows up as a reviewable
JSON diff rather than a silent bench regression.

Regenerate after intentional plan changes: ``python tools/snapshot_plans.py``.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from backend_big_data_spark.plans.all_plans import QUERIES
from backend_big_data_spark.plans.audit import plan_features
from tests.conftest import SF_SMALL

GOLDEN_PATH = pathlib.Path(__file__).parent / "data/plan_golden.json"
GOLDEN = json.loads(GOLDEN_PATH.read_text())


def test_golden_covers_all_headline_queries():
    from bench import HEADLINE

    assert sorted(GOLDEN) == sorted(HEADLINE)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_plan_matches_golden(spark, name):
    # Compose from a clean cache-manager state: persisted intermediates
    # (shingle/signature/pair tables) registered by EARLIER queries collapse
    # later plans into InMemoryRelation scans, making the feature vector
    # depend on composition ORDER rather than the query. Each plan is
    # snapshotted and compared with only its OWN persist marks in effect.
    from backend_big_data_spark.text.dedup import release_dedup_caches

    release_dedup_caches()
    spark.catalog.clearCache()
    actual = plan_features(QUERIES[name](spark, SF_SMALL))
    assert actual == GOLDEN[name], (
        f"physical plan for {name!r} drifted from golden; if intentional, "
        "regenerate with `python tools/snapshot_plans.py` and review the diff"
    )
