"""Single-evaluation pins — the shared materialization switch.

Several operators must materialize an intermediate frame ONCE so every
downstream plan branch reads the same physical rows (fan-out pins over
structurally-different consumer branches; the ``monotonically_increasing_id``
two-branch contract in ``operators/windows.distributed_rank``; per-round
lineage truncation in the iterative graph/LM loops). The r12 optimization
round hard-coded ``localCheckpoint(eager=True)`` at each new pin site,
which is executor-local UNREPLICATED storage: at cluster scale an executor
loss (or a dynamic-allocation reclaim) after the pin kills the query with
no recompute path. This module is the one place that decides HOW a pin
materializes, so the same query code is gate-fast locally and
churn-safe on a cluster (r12 verdict item 1).

Modes
-----

``pin="local"``
    ``localCheckpoint(eager=...)`` — one local write, no DFS. Right for
    single-box gate/bench runs and short jobs; does NOT survive executor
    loss.

``pin="reliable"``
    ``checkpoint(eager=...)`` — writes to the directory configured via
    ``spark.sparkContext.setCheckpointDir`` (a replicated DFS path on a
    real cluster) and reads it back: survives executor loss and dynamic
    allocation, at the cost of one distributed write+read. Raises at call
    time if no checkpoint dir is configured.

``pin="auto"`` (the default at every pin site)
    ``reliable`` when a checkpoint dir is configured, else ``local``.
    A cluster deployment opts into churn-safe pins with ONE line of
    bootstrap (``setCheckpointDir``) and zero query-code changes; the
    local harness, which sets no checkpoint dir, keeps the exact r12
    plans and timings. ``SPARK_GRAFT_PIN=local|reliable`` overrides the
    choice globally (parameterised config, not a code fork) — e.g. to
    force ``local`` on a cluster for a throwaway job, or to exercise
    ``reliable`` under the local harness.

Both modes are EAGER by default — a Spark job runs at plan-construction
time, not at the first action. That is the point of a pin: the
materialization must happen before any consumer branch compiles its plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def pin_single_evaluation(
    df: DataFrame, pin: str = "auto", eager: bool = True
) -> DataFrame:
    """Materialize ``df`` once under the selected pin mode (see module
    docstring). Returns the checkpointed frame; content is unchanged, so
    a pin over deterministic input is semantics-neutral."""
    mode = pin
    if mode == "auto":
        # env override applies to AUTO sites only: an explicit
        # pin="local"/"reliable" argument is a call-site contract
        # (e.g. a caller that has verified its frame must survive
        # executor churn) and is never silently downgraded
        mode = os.environ.get("SPARK_GRAFT_PIN", "auto")
    if mode == "auto":
        sc = df.sparkSession.sparkContext
        mode = "reliable" if sc.getCheckpointDir() is not None else "local"
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise ValueError(
                "pin='reliable' needs spark.sparkContext.setCheckpointDir"
                "(<DFS path>) — on a cluster, point it at replicated "
                "storage; localCheckpoint (pin='local') does not survive "
                "executor loss"
            )
        return df.checkpoint(eager=eager)
    raise ValueError(f"pin must be 'local', 'reliable' or 'auto', got {mode!r}")


__all__ = ["pin_single_evaluation"]
