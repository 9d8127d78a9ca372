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


def temperature_mix_rates(
    df: DataFrame,
    group_col: str = "source",
    keep_frac: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted (α=0.5) downsampling rates per group — the
    multilingual/multi-source rebalancing rule from the public pretraining
    literature (sample group s proportionally to ``n_s^α`` instead of
    ``n_s``, flattening the head and boosting the tail), targeting
    ``keep_frac`` of the corpus overall.

    α is fixed at 0.5 so the weight is ``sqrt`` — IEEE-correctly-rounded
    in every engine, unlike libm ``pow`` — and the normalizer Z folds the
    per-group weights IN GROUP ORDER (sorted collect + left fold ≡ DuckDB
    ``list_reduce`` over ``list(... ORDER BY ...)``), making the rates
    bit-exact across engines. Rates are then snapped to an integer
    millionths threshold (half-up), which is what the hash filter
    compares against — so membership can never straddle a ULP.

    Output: ``(group_col, n_docs long, thresh long)`` where a row of the
    corpus is kept iff ``stable_hash(id) % 1e6 < thresh`` for its group.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.sqrt(F.col("n_docs").cast("double"))
    stats = counts.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(group_col), w.alias("w")))
                ),
                lambda s: s["w"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("Z"),
        F.sum("n_docs").alias("N"),
    )
    rate = F.least(
        F.lit(1.0),
        F.col("N").cast("double")
        * F.lit(keep_frac)
        * F.sqrt(F.col("n_docs").cast("double"))
        / F.col("Z")
        / F.col("n_docs"),
    )
    return counts.crossJoin(F.broadcast(stats)).select(
        group_col,
        "n_docs",
        F.floor(rate * 1e6 + F.lit(0.5)).cast("long").alias("thresh"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str = "source",
    keep_frac: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply :func:`temperature_mix_rates`: deterministic hash membership
    per row against its group's threshold. One broadcast join — the corpus
    never shuffles."""
    from backend_big_data_spark.text.sampling import stable_hash

    rates = temperature_mix_rates(
        df, group_col=group_col, keep_frac=keep_frac, id_col=id_col
    )
    return df.join(F.broadcast(rates), group_col).filter(
        stable_hash(F.col(id_col)) % 1000000 < F.col("thresh")
    )
