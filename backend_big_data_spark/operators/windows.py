"""Window-function operators (SURVEY.md §2.5-2.6).

Implements the reference's three window idioms with its B6 bug fixed:
pagination in the reference rides ``row_number() OVER (ORDER BY lit(1))``
(``queries.py:26``) — nondeterministic page contents AND a single-partition
sort. Here pagination requires an explicit stable key and uses Spark's
native ``offset/limit`` (planned as a global limit, no window at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pin_single_evaluation(df: DataFrame, pin: str) -> DataFrame:
    """Materialize ``df`` ONCE so every downstream plan branch reads the
    same physical partitioning (the ``monotonically_increasing_id``
    two-branch contract — see :func:`distributed_rank`).

    Delegates to the repo-wide switch
    :func:`backend_big_data_spark.operators.pinning.pin_single_evaluation`
    — ``pin="local"`` (executor-local, fast, does not survive executor
    loss), ``pin="reliable"`` (DFS checkpoint dir, churn-safe), or
    ``pin="auto"`` (reliable when a checkpoint dir is configured, local
    otherwise; ``SPARK_GRAFT_PIN`` overrides). Both modes are EAGER — a
    Spark job runs at plan-construction time, not at the first action.
    That is the point: the pin must happen before either branch compiles
    its plan.
    """
    from backend_big_data_spark.operators.pinning import pin_single_evaluation

    return pin_single_evaluation(df, pin)


def paginate(df: DataFrame, order_by: Sequence[Column | str], page: int, page_size: int) -> DataFrame:
    """Stable pagination — fixes reference B6 (``queries.py:10-28``).

    ``order_by`` must be a total order (include a unique key as the last
    column) or page contents are undefined. ``page`` is 1-based.
    Planned as TakeOrderedAndProject + offset: only ``page*page_size`` rows
    ever leave the executors — no single-partition global sort of the table.
    """
    if page < 1 or page_size < 1:
        raise ValueError("page and page_size must be >= 1")
    return df.orderBy(*order_by).offset((page - 1) * page_size).limit(page_size)


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group — the reference's canonical idiom
    (``queries.py:470-474``: top-5 camera models per brand). ``order_by``
    should break ties on a unique key for deterministic output.

    Scale: Spark plans a per-partition-key window; with AQE skew handling a
    hot group splits. For extreme k≪group-size cases a groupBy+min_by_k
    (aggregate push-down) variant would cut the shuffle, but the window form
    is the right default.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def global_rank(
    df: DataFrame, order_by: Sequence[Column | str], rank_col: str = "rank"
) -> DataFrame:
    """Global ranking — reference W2 (``queries.py:322``, rank all owners by
    total views). Delegates to :func:`distributed_rank` (range-partition +
    broadcast prefix offsets), so there is NO partition-less window and no
    bounded-input contract to police: the same call ranks a 50-row owner
    table and a 10⁹-row entity dimension. Rank stays LONG: beyond 2³¹−1
    rows an int cast would silently wrap under non-ANSI mode, and this
    function's whole contract is unbounded input. Call sites that need
    the reference's int ``row_number`` schema (photo W2) cast at the
    edge, where the input is known to be owner-cardinality.
    """
    return distributed_rank(df, order_by, rank_col=rank_col)


def global_topk_ranked(
    df: DataFrame,
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows by a total order with their global rank attached.

    The rank-filtered-top-k idiom (``rank() <= k``) does NOT need a
    global ranking pass: ``orderBy().limit(k)`` plans as
    TakeOrderedAndProject — only k rows per partition ever leave the
    executors — and the ``row_number`` window then runs over the k-row
    result, bounded by the LITERAL k, not the data. Use
    :func:`distributed_rank` instead when every row needs its rank.
    """
    top = df.orderBy(*order_by).limit(k)
    w = Window.orderBy(*order_by)
    return top.withColumn(rank_col, F.row_number().over(w).cast("int"))


def distributed_rank(
    df: DataFrame,
    order_by: Sequence[Column | str],
    rank_col: str = "rank",
    total_col: str | None = None,
    pin: str = "auto",
) -> DataFrame:
    """Exact global 1-based ``row_number`` over a total order WITHOUT a
    partition-less window — the two-pass distributed ranking that
    replaces the "No Partition Defined" single-task global sort.

    ``order_by`` must be a total order (include a unique key) or ranks
    are nondeterministic — the same contract as SQL ``row_number``.

    The `operators/setsimjoin._dense_ids` discipline, extended from
    order-faithful ids to EXACT dense ranks:

    1. ``repartitionByRange(order_by)`` range-partitions on the sort key
       (partition p's keys all precede partition p+1's; the range
       partitioner balances row counts via sampling), then
       ``sortWithinPartitions`` orders each partition's own range — the
       per-task sort is n/numPartitions, bounded by config, not data.
    2. ``monotonically_increasing_id`` (partition_id·2³³ + row number)
       recovers each row's partition id and 0-based intra-partition
       index for free — no second window.
    3. Per-partition row counts aggregate to ≤ numShufflePartitions rows;
       prefix-summing them to partition OFFSETS is the only ordered
       window in the plan and runs over that bounded counts frame — the
       CCNet-histogram pattern (bounded by config, not data), NOT over
       the ranked rows themselves.
    4. Offsets broadcast-join back on partition id:
       ``rank = offset[pid] + intra_index + 1``.

    ``total_col``, when set, also attaches the total row count n (needed
    by closed-form ntile) from the same bounded counts frame — no extra
    pass over the data.

    Scale: one range shuffle of the data + one broadcast join; every
    per-task frame is |n|/numPartitions. At 10⁹-row entity dimensions
    this replaces a single-task global sort with 32-or-more-way
    parallelism. Intra-partition index is exact to 2³³ rows/partition
    (monotonically_increasing_id's record field).

    The rows branch and the counts branch MUST see ONE physical
    evaluation of the ordered frame: ``monotonically_increasing_id`` is
    only meaningful relative to the partitioning that produced it, and
    AQE does not guarantee a ReusedExchange — over a CACHED input it
    re-plans the range exchange per branch (adaptive coalescing can
    differ run to run), the two branches' (pid, idx) spaces diverge,
    and ranks duplicate/drop nondeterministically (caught round 11 by
    the grouped form's hot-group scale study; this global form
    reproduced the same corruption on a persisted sf0.1 input —
    duplicate ranks AND a join that dropped rows). The pin
    (:func:`_pin_single_evaluation`) materializes one evaluation that
    both branches read — the setsimjoin one-scan discipline: one range
    shuffle + one materialization, no extra shuffle, eager (a Spark
    job runs at plan-construction). ``pin="local"`` is executor-local
    and unreplicated — fast, but the job CANNOT survive executor loss
    after the pin; ``pin="reliable"`` checkpoints to the configured DFS
    checkpoint dir and is the mode for long-lived cluster runs under
    executor churn; ``pin="auto"`` (default) picks reliable exactly
    when a checkpoint dir is configured. Persisted-input determinism
    tests in tests/test_operators.py guard the contract for both forms
    in both modes.
    """
    ordered = _pin_single_evaluation(
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__dr_mid", F.monotonically_increasing_id())
        .withColumn("__dr_pid", F.shiftright("__dr_mid", 33))
        .withColumn(
            "__dr_idx", F.col("__dr_mid").bitwiseAND(F.lit((1 << 33) - 1))
        ),
        pin,
    )
    counts = ordered.groupBy("__dr_pid").agg(F.count(F.lit(1)).alias("__dr_cnt"))
    w_off = Window.orderBy("__dr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_tot = Window.orderBy("__dr_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__dr_pid",
        F.coalesce(F.sum("__dr_cnt").over(w_off), F.lit(0)).alias("__dr_off"),
        F.sum("__dr_cnt").over(w_tot).alias("__dr_tot"),
    )
    out = ordered.join(F.broadcast(offsets), "__dr_pid").withColumn(
        rank_col, (F.col("__dr_off") + F.col("__dr_idx") + 1).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__dr_tot"))
    return out.drop("__dr_mid", "__dr_pid", "__dr_idx", "__dr_off", "__dr_tot")


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL ``ntile(n)`` in closed form from an exact (1-based rank, total
    count) pair — no window function at all.

    SQL semantics: with t rows, the first ``t % n`` tiles hold
    ``⌈t/n⌉`` rows and the rest ``⌊t/n⌋``. With base = ⌊t/n⌋,
    rem = t % n, big = rem·(base+1)::

        tile(r) = ⌈r / (base+1)⌉                 if r <= big
                  rem + ⌈(r - big) / base⌉       otherwise

    (t < n degenerates cleanly: base = 0, big = t, first branch covers
    every row and assigns tile = r.) Division runs in doubles — exact for
    operands below 2⁵³, far beyond any entity dimension — with the
    divisor of the dead branch clamped ≥ 1 so ANSI mode never sees /0.
    """
    base = F.floor(total / F.lit(n)).cast("long")
    rem = (total % F.lit(n)).cast("long")
    big = rem * (base + 1)
    tile_lo = F.ceil(rank / (base + 1))
    tile_hi = rem + F.ceil((rank - big) / F.greatest(base, F.lit(1)))
    return F.when(rank <= big, tile_lo).otherwise(tile_hi).cast("int")


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_by: Sequence[Column | str],
    tile_col: str,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_by)`` — hash-identical to
    the SQL window function — built from :func:`distributed_rank` +
    :func:`ntile_from_rank`, so no partition-less window ever sees the
    data rows. ``order_by`` must be a total order (unique tie-break) for
    deterministic tiles, same as the window form.

    This is the 100 TB replacement for global-ntile segmentation
    (RFM scores, user deciles): the naive window funnels the full entity
    dimension (10⁸–10⁹ rows at scale) through ONE task; this form's
    largest single-task frame is numShufflePartitions counter rows.
    """
    ranked = distributed_rank(
        df, order_by, rank_col="__dn_rank", total_col="__dn_tot"
    )
    return ranked.withColumn(
        tile_col, ntile_from_rank(F.col("__dn_rank"), F.col("__dn_tot"), n)
    ).drop("__dn_rank", "__dn_tot")


def grouped_distributed_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column | str],
    rank_col: str = "rank",
    total_col: str | None = None,
    pin: str = "auto",
) -> DataFrame:
    """Exact per-group 1-based ``row_number() OVER (PARTITION BY group
    ORDER BY order_by)`` with NO per-group window over the data rows —
    the group-wise form of :func:`distributed_rank` (ROADMAP round-11
    candidate), for when single GROUPS are entity-cardinality (a hot
    key's rows would otherwise funnel through one window task even in
    the keyed form).

    1. ``repartitionByRange(group_cols ++ order_by)``: each partition
       holds a contiguous (group, key) range, so a group's rows occupy a
       contiguous run of partitions and are contiguous WITHIN each
       partition after ``sortWithinPartitions``.
    2. ``monotonically_increasing_id`` recovers (partition id,
       intra-partition index) map-side.
    3. One keyed aggregate to (partition, group): row count + the
       group's FIRST intra-partition index. The per-group prefix sum
       over partitions is a window KEYED ON THE GROUP whose input is ≤
       numShufflePartitions rows per group (a group spans at most all
       partitions) — bounded by config, never by group size.
    4. Join the (partition, group) offsets back: rank = offset +
       (intra_index − group_base) + 1. The offsets frame holds ≤
       (#groups + #partitions) rows — AQE broadcasts it when small,
       hash-joins otherwise; either way nothing aggregates a group
       through one task.

    ``order_by`` must be a total order within each group (unique
    tie-break), same contract as the window form. ``total_col`` attaches
    the per-group row count (closed-form grouped ntile needs it) from
    the same bounded counts frame. NULL group keys form a valid
    partition (SQL ``PARTITION BY`` semantics): the offsets join is
    null-safe on every group column. ``pin`` selects the
    single-evaluation mode — see :func:`_pin_single_evaluation` for the
    local-vs-reliable executor-loss tradeoff.
    """
    gcols = list(group_cols)
    ordered = _pin_single_evaluation(
        df.repartitionByRange(*gcols, *order_by)
        .sortWithinPartitions(*gcols, *order_by)
        .withColumn("__dr_mid", F.monotonically_increasing_id())
        .withColumn("__dr_pid", F.shiftright("__dr_mid", 33))
        .withColumn(
            "__dr_idx", F.col("__dr_mid").bitwiseAND(F.lit((1 << 33) - 1))
        ),
        # single physical evaluation — see distributed_rank: the counts
        # and data branches must share ONE (pid, idx) space, which AQE's
        # ReusedExchange does not guarantee (corrupts over cached inputs)
        pin,
    )
    counts = ordered.groupBy("__dr_pid", *gcols).agg(
        F.count(F.lit(1)).alias("__dr_cnt"),
        F.min("__dr_idx").alias("__dr_base"),
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__dr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = (
        Window.partitionBy(*gcols)
        .orderBy("__dr_pid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offsets = counts.select(
        "__dr_pid",
        *gcols,
        "__dr_base",
        F.coalesce(F.sum("__dr_cnt").over(w_off), F.lit(0)).alias("__dr_off"),
        F.sum("__dr_cnt").over(w_tot).alias("__dr_tot"),
    )
    # Null-safe equi-join on the group columns: a NULL group key is a
    # valid PARTITION BY partition, and plain `=` would silently drop
    # every row of it (NULL != NULL). eqNullSafe (SQL `<=>`) plans as
    # the same hash join — null-safe equality is still an equi-join key
    # for Spark's planner, so this costs nothing over the name join.
    offsets = offsets.select(
        F.col("__dr_pid").alias("__off_pid"),
        *[F.col(c).alias(f"__off_g{i}") for i, c in enumerate(gcols)],
        "__dr_base",
        "__dr_off",
        "__dr_tot",
    )
    cond = F.col("__dr_pid") == F.col("__off_pid")
    for i, c in enumerate(gcols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__off_g{i}"))
    out = ordered.join(offsets, cond).withColumn(
        rank_col,
        (
            F.col("__dr_off") + F.col("__dr_idx") - F.col("__dr_base") + 1
        ).cast("long"),
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__dr_tot"))
    return out.drop(
        "__dr_mid", "__dr_pid", "__dr_idx", "__dr_base", "__dr_off",
        "__dr_tot", "__off_pid", *[f"__off_g{i}" for i in range(len(gcols))],
    )


def grouped_distributed_ntile(
    df: DataFrame,
    n: int,
    group_cols: Sequence[str],
    order_by: Sequence[Column | str],
    tile_col: str,
) -> DataFrame:
    """Exact ``ntile(n) OVER (PARTITION BY group ORDER BY order_by)`` —
    :func:`grouped_distributed_rank` + the closed-form
    :func:`ntile_from_rank` with each group's own total, so a hot
    group's segmentation never runs through one window task."""
    ranked = grouped_distributed_rank(
        df, group_cols, order_by, rank_col="__dn_rank", total_col="__dn_tot"
    )
    return ranked.withColumn(
        tile_col, ntile_from_rank(F.col("__dn_rank"), F.col("__dn_tot"), n)
    ).drop("__dn_rank", "__dn_tot")


def lag_delta(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    value: Column,
    delta_col: str = "delta",
) -> DataFrame:
    """Per-group difference from the previous row (lag) — additive over the
    reference (its Window import at ``queries.py:1`` never uses lag/lead)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(delta_col, value - F.lag(value).over(w))
