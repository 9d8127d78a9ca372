"""Training-mix construction: repetition-based upsampling.

LLM data curricula weight sources by repeating them (2 epochs of books,
0.5 of web, ...). Integer repetition expressed distributively: each row
explodes into ``factor`` copies via ``explode(sequence(1, factor))`` — a
generator, not a shuffle, so a 100 TB mix materializes map-side with the
copy index carried for downstream deterministic shuffling (the
(key, copy) pair hashes to a stable position in the epoch order).

Fractional factors compose with the deterministic samplers in
text/sampling.py: repeat ⌊f⌋ times and hash-sample the remaining f−⌊f⌋
fraction — both pieces pure column logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repeat_by_factor(
    df: DataFrame,
    group_col: str,
    factors: dict[str, int],
    default_factor: int = 1,
) -> DataFrame:
    """Replicate each row ``factors[group]`` times (``default_factor`` for
    unlisted groups), adding a 1-based ``copy`` column. Factor 0 drops the
    group entirely — the same map-side plan also expresses exclusion."""
    if any(f < 0 for f in factors.values()) or default_factor < 0:
        raise ValueError("repetition factors must be >= 0")
    factor = F.lit(default_factor)
    for k, f in sorted(factors.items()):
        factor = F.when(F.col(group_col) == k, F.lit(f)).otherwise(factor)
    return (
        df.withColumn("__factor", factor)
        .filter(F.col("__factor") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(1), F.col("__factor")))
        )
        .withColumn("copy", F.col("copy").cast("int"))
        .drop("__factor")
    )
