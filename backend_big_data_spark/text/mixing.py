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


def unimax_allocation(
    df: DataFrame,
    budget: int,
    max_epochs: int = 2,
    group_col: str = "lang",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    more effective language sampling for large-scale multilingual
    pretraining", arXiv:2304.09151): spread a total training budget
    UNIFORMLY across groups, capping each group at ``max_epochs`` passes
    over its data — the published alternative to temperature sampling
    that stops the head languages from swallowing the budget without
    over-epoching the tail.

    Water-filling has a closed form over caps sorted ascending
    (c_1 ≤ … ≤ c_K, prefix sums S_i): the capped prefix is the largest t
    with ``S_t + (K−t)·c_t ≤ budget``, the level is
    ``L = (budget − S_t)/(K−t)``, and each group receives
    ``min(cap, floor(L))`` rows — so the whole allocator is two window
    cumulative sums over a K-row aggregate, no driver loop, no collect
    (up to K−1 rows of budget round away; documented, deterministic).

    Output: one row per group — ``(group, n_rows, cap, alloc)``.
    """
    from pyspark.sql import Window

    if budget <= 0 or max_epochs <= 0:
        raise ValueError("budget and max_epochs must be positive")
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_rows"))
    caps = counts.withColumn(
        "cap", (F.col("n_rows") * max_epochs).cast("long")
    )
    w = Window.orderBy("cap", group_col)
    wall = Window.partitionBy()
    ranked = (
        caps.withColumn("__i", F.row_number().over(w))
        .withColumn("__s", F.sum("cap").over(w))
        .withColumn("__k", F.count("*").over(wall))
    )
    # t = max prefix index with S_i + (K-i)*c_i <= budget (0 if none)
    with_t = ranked.withColumn(
        "__t",
        F.max(
            F.when(
                F.col("__s") + (F.col("__k") - F.col("__i")) * F.col("cap")
                <= budget,
                F.col("__i"),
            )
        ).over(wall),
    ).withColumn(
        "__st",
        F.max(
            F.when(F.col("__i") == F.col("__t"), F.col("__s"))
        ).over(wall),
    )
    level = F.when(
        F.col("__t").isNull(),
        F.floor(F.lit(budget) / F.col("__k")),
    ).otherwise(
        F.when(
            F.col("__t") == F.col("__k"), F.lit(budget)  # everything capped
        ).otherwise(
            F.floor(
                (F.lit(budget) - F.col("__st"))
                / (F.col("__k") - F.col("__t"))
            )
        )
    )
    return with_t.select(
        group_col,
        "n_rows",
        "cap",
        F.least(F.col("cap"), level.cast("long")).alias("alloc"),
    )


def unimax_epochs(
    df: DataFrame,
    budget: int,
    max_epochs: int = 2,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-row epoch counts realizing the UniMax allocation: within each
    group the ``alloc`` rows-worth of budget becomes ``e = alloc / n``
    full epochs for every row plus one extra epoch for the ``alloc mod n``
    rows that rank first in the group's deterministic hash order (stable
    across runs/engines — the text/sampling.py convention). Rows with
    zero epochs are dropped. Output: (id, group, n_epochs)."""
    from pyspark.sql import Window

    from backend_big_data_spark.text.sampling import stable_hash

    alloc = unimax_allocation(df, budget, max_epochs, group_col).select(
        group_col, "n_rows", "alloc"
    )
    w = Window.partitionBy(group_col).orderBy(
        stable_hash(F.col(id_col)), id_col
    )
    ranked = df.select(id_col, group_col).withColumn(
        "__rk", F.row_number().over(w)
    )
    e = F.floor(F.col("alloc") / F.col("n_rows")).cast("int")
    extra = (F.col("__rk") <= F.col("alloc") % F.col("n_rows")).cast("int")
    return (
        ranked.join(F.broadcast(alloc), on=group_col)
        .select(
            id_col,
            group_col,
            (e + extra).alias("n_epochs"),
        )
        .filter(F.col("n_epochs") > 0)
    )
