"""The shared single-evaluation pin switch (operators/pinning.py).

Every fan-out pin and per-round lineage truncation in the repo routes
through ``pin_single_evaluation`` so one switch decides how a pin
materializes: executor-local (fast, gate/bench default) or a reliable
DFS checkpoint (survives executor loss — the cluster mode, r12 verdict
item 1). These tests pin the mode-resolution contract; the heavier
semantics tests (ranks stay exact under either mode over persisted
inputs) live in tests/test_operators.py.

DataFrame exposes no ``isCheckpointed`` introspection, so the tests
read the two observable signals instead: lineage truncation (the pinned
frame's physical plan is a ``Scan ExistingRDD``, not the original
range/project chain) and, for the reliable mode, the rdd-* payload that
``checkpoint`` writes under the configured checkpoint dir.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation


def _frame(spark):
    return spark.range(1000).select(
        F.col("id"), (F.col("id") * 7 % 13).alias("v")
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ckpt_rdd_dirs(tmp: str) -> set[str]:
    import pathlib

    return {str(p) for p in pathlib.Path(tmp).rglob("rdd-*")}


def test_local_pin_preserves_content_and_truncates_lineage(spark):
    df = _frame(spark)
    pinned = pin_single_evaluation(df, pin="local")
    assert "ExistingRDD" in _plan(pinned) and "Range" not in _plan(pinned)
    assert sorted(r.id for r in pinned.collect()) == list(range(1000))
    assert pinned.columns == df.columns


def test_reliable_pin_requires_checkpoint_dir(spark):
    # only meaningful while no checkpoint dir is configured (a prior
    # reliable-pin test on the session-scoped context may have set one
    # — a SparkContext checkpoint dir cannot be unset)
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already configured on session context")
    with pytest.raises(ValueError, match="setCheckpointDir"):
        pin_single_evaluation(_frame(spark), pin="reliable")


def test_reliable_pin_roundtrip(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    pinned = pin_single_evaluation(_frame(spark), pin="reliable")
    assert "ExistingRDD" in _plan(pinned)
    assert _ckpt_rdd_dirs(ckpt), "reliable pin wrote nothing to the dir"
    assert pinned.agg(F.sum("v")).first()[0] == sum(
        i * 7 % 13 for i in range(1000)
    )


def test_auto_resolves_by_checkpoint_dir(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PIN", raising=False)
    ckpt = str(tmp_path / "ckpt2")
    spark.sparkContext.setCheckpointDir(ckpt)
    pinned = pin_single_evaluation(_frame(spark), pin="auto")
    assert "ExistingRDD" in _plan(pinned)
    # with a dir configured, auto must take the reliable (DFS) path
    assert _ckpt_rdd_dirs(ckpt), "auto pin did not checkpoint to the dir"


def test_env_override_wins_for_auto_sites(spark, tmp_path, monkeypatch):
    ckpt = str(tmp_path / "ckpt3")
    spark.sparkContext.setCheckpointDir(ckpt)
    monkeypatch.setenv("SPARK_GRAFT_PIN", "local")
    pinned = pin_single_evaluation(_frame(spark), pin="auto")
    assert "ExistingRDD" in _plan(pinned)
    # a configured dir would pick reliable; the env forces local for
    # AUTO sites, so nothing lands in the dir
    assert not _ckpt_rdd_dirs(ckpt)
    # an explicit argument is never downgraded by the env
    explicit = pin_single_evaluation(_frame(spark), pin="reliable")
    assert "ExistingRDD" in _plan(explicit)
    assert _ckpt_rdd_dirs(ckpt)


def test_bogus_mode_raises(spark):
    with pytest.raises(ValueError, match="pin must be"):
        pin_single_evaluation(_frame(spark), pin="bogus")
