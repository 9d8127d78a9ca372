"""Inline pipeline observability via ``df.observe`` — data-quality
metrics collected DURING the job, not by a second pass.

A 100 TB ETL run cannot afford a separate ``count()``/null-scan per
monitoring metric (each is another full scan); Spark's Observation API
attaches named aggregates to the existing plan, evaluated as rows flow
through the already-running action. The reference has no monitoring at
all; this is the additive operational layer a production pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    required_cols: list[str],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``.

    Returns ``(observed_df, observation)``; run any ACTION on the returned
    frame (write, collect, count), then read ``observation.get`` — a dict
    like ``{"rows": N, "null_<col>": M, ...}`` — to decide pass/fail
    (e.g. abort a publish when a required column's null rate spikes).
    Zero extra scans: the metrics ride the action's own pass.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        for c in required_cols
    ]
    return df.observe(obs, *metrics), obs


def assert_quality(
    observation: Observation,
    max_null_fraction: float,
    required_cols: list[str],
) -> dict[str, float]:
    """Evaluate an ``observe_quality`` observation AFTER the action ran:
    raises if any required column's null fraction exceeds the bound;
    returns the per-column null fractions. Call between "write to staging"
    and "publish" — the cheap gate that keeps a bad batch out of the
    serving dataset."""
    got = observation.get
    rows = got["rows"] or 0
    fractions = {
        c: (got[f"null_{c}"] / rows if rows else 0.0) for c in required_cols
    }
    breaches = {
        c: f for c, f in fractions.items() if f > max_null_fraction
    }
    if breaches:
        raise ValueError(
            f"quality gate failed: null fractions {breaches} exceed "
            f"{max_null_fraction} over {rows} rows"
        )
    return fractions
