"""Physical-plan feature extraction for plan-regression goldens.

`plan_features` reduces ``df.explain("formatted")`` text to a small dict of
scale-relevant invariants — how many keyed shuffles, which join strategies,
whether Python evaluation appears, whether scan pushdown happened. These are
exactly the properties PERF.md argues from; snapshotting them per headline
query (tests/data/plan_golden.json) turns "a refactor silently added a
shuffle / dropped a broadcast / de-optimized a UDF to row-at-a-time Python"
into a test failure instead of a bench regression two rounds later.

Feature choice deliberately excludes anything unstable: expression ids
(``#21``), partition counts inside ``hashpartitioning(.., 8)``, file sizes,
and AQE runtime re-plans (explain on an unexecuted DataFrame always shows the
initial plan, ``isFinalPlan=false``) do not affect the extracted values.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_features(df: DataFrame) -> dict[str, object]:
    text = formatted_plan(df)
    return {
        # keyed shuffles: the expensive, data-volume-proportional exchanges
        "keyed_shuffles": text.count("hashpartitioning("),
        # global-sort exchanges (rangepartitioning) — orderBy outputs
        "range_shuffles": text.count("rangepartitioning("),
        # join strategies actually planned
        "broadcast_hash_joins": _tree_count(text, "BroadcastHashJoin"),
        "sort_merge_joins": _tree_count(text, "SortMergeJoin"),
        "nested_loop_joins": _tree_count(text, "BroadcastNestedLoopJoin"),
        "cartesian_products": _tree_count(text, "CartesianProduct"),
        # Python boundary: row-at-a-time vs Arrow-batched vs none
        "python_row_eval": _tree_count(text, "BatchEvalPython"),
        "python_arrow_eval": (
            _tree_count(text, "ArrowEvalPython")
            + _tree_count(text, "MapInPandas")
            + _tree_count(text, "FlatMapGroupsInPandas")
        ),
        # top-k planned as per-task heap rather than global sort
        "take_ordered": "TakeOrderedAndProject" in text,
        # any parquet scan with a non-empty pushed-filter list
        "has_pushed_filters": any(
            "PushedFilters: [" in ln and "PushedFilters: []" not in ln
            for ln in text.splitlines()
        ),
        # row-exploding generators (shingle/pair expansion) — count matters
        "generates": _tree_count(text, "Generate"),
        # window operators (global windows are a scale hazard; see PERF.md)
        "windows": _tree_count(text, "Window"),
    }


def _tree_count(text: str, node: str) -> int:
    """Count node occurrences in the tree section only (the detail section
    repeats every node name once more as a "(n) Node" header)."""
    tree = text.split("\n\n", 1)[0]
    return tree.count(node)
