"""Distributed covariance + PCA/whitening over embedding columns.

The embedding-pipeline preprocessing pair (additive scope; no reference
counterpart):

- :func:`embedding_covariance` — the full (upper-triangle) covariance
  matrix of an ``array<float>`` column as a long-format DataFrame. The
  scale-correct shape: each row expands map-side to its dim·(dim+1)/2
  pairwise products through JVM higher-order functions (no Python, no
  self-join — a row never meets another row), and ONE partial-aggregated
  shuffle of (i, j) keys reduces them. Shuffle volume is O(dim²·
  partitions), independent of row count — the plan that survives 100 TB.
- :func:`pca_components` — eigendecomposition of that matrix on the
  driver (dim×dim, the bounded quantizer-training pattern — same contract
  as `ann._sq8_train`), returning principal axes + explained variance.
- :func:`pca_project` — project (optionally whiten) the corpus onto the
  top-k axes as a pure Catalyst expression (aggregate/zip_with dot
  products against axis literals) — no UDF in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pair_products(v, dim: int):
    """Per-row upper-triangle products struct(i, j, x_i*x_j) — the
    map-side expansion both the one-shot covariance and the maintained
    moment sidecars expand through."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.element_at(v, i.cast("int") + 1)
                        * F.element_at(v, j.cast("int") + 1)
                    ).alias("xy"),
                ),
            ),
        )
    )


def embedding_moments(
    emb: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """The covariance's ADDITIVE sufficient statistics, long format
    ``(i, j, v)``:

    - ``(i, j, Σ x_i·x_j)`` for 0 <= i <= j < dim,
    - ``(i, -1, Σ x_i)`` per-dimension sums,
    - ``(-1, -1, n)`` the row count (exact in a double below 2^53).

    Additive across row-disjoint frames, so per-batch sidecars of these
    rows fold to the full-corpus moments by one keyed sum — the
    maintained-state discipline (`streaming/margin_ingest.py` writes one
    per admission batch; :func:`covariance_from_moments` finishes)."""
    v = F.col(vec_col).cast("array<double>")
    pair = (
        emb.select(F.explode(_pair_products(v, dim)).alias("p"))
        .select("p.i", "p.j", F.col("p.xy").alias("v"))
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    dims = (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("v"))
        .select(F.col("i").cast("int").alias("i"), F.lit(-1).alias("j"), "v")
    )
    cnt = emb.select(
        F.lit(-1).alias("i"),
        F.lit(-1).alias("j"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    return pair.unionByName(dims).unionByName(cnt)


def covariance_from_moments(
    moments: DataFrame,
    *,
    quant: float = 1e6,
) -> DataFrame:
    """Finish the covariance from (possibly per-batch, possibly folded)
    moment rows: keyed sum to the corpus totals, then the same
    cov = Sxy/n − (Sx/n)(Sy/n) + floor-quantization arithmetic as the
    one-shot :func:`embedding_covariance` — the maintained sidecar path
    lands on the identical quantization grid.

    Raises on ``None`` input: ``read_master_moments`` returns ``None``
    when the sidecar fails its coverage guard, and the documented
    contract is that CALLERS fall back to the full-scan covariance —
    a silent AttributeError here would mask that decision."""
    if moments is None:
        raise ValueError(
            "covariance_from_moments: moments is None — the sidecar "
            "failed its coverage guard; fall back to the full-scan "
            "embedding_covariance at the call site"
        )
    tot = moments.groupBy("i", "j").agg(F.sum("v").alias("v"))
    n = tot.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    dims = tot.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        "i", F.col("v").alias("sx")
    )
    pairs = tot.filter(F.col("j") >= 0)
    return (
        pairs.crossJoin(F.broadcast(n))
        .join(F.broadcast(dims), "i")
        .join(
            F.broadcast(
                dims.select(F.col("i").alias("j"), F.col("sx").alias("sy"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.floor(
                    (
                        F.col("v") / F.col("n")
                        - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
                    )
                    * F.lit(quant)
                    + F.lit(0.5)
                )
                / F.lit(quant)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def dim_stats_from_moments(moments: DataFrame) -> DataFrame:
    """Per-dimension sufficient statistics ``(i, sx, sxx, n)`` out of a
    moment sidecar frame (possibly per-batch — keyed-summed here): the
    dim sums live at ``(i, -1)``, the squared sums on the diagonal
    ``(i, i)``, the row count at ``(-1, -1)``. Everything the drift
    readout needs, with no corpus rescan."""
    tot = moments.groupBy("i", "j").agg(F.sum("v").alias("v"))
    n = tot.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    sx = tot.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        "i", F.col("v").alias("sx")
    )
    sxx = tot.filter((F.col("i") >= 0) & (F.col("i") == F.col("j"))).select(
        "i", F.col("v").alias("sxx")
    )
    return sx.join(sxx, "i").crossJoin(F.broadcast(n))


def drift_readout(ref: DataFrame, cur: DataFrame) -> DataFrame:
    """Per-dimension distribution-drift report from two ``(i, sx, sxx,
    n)`` statistics frames (reference vs current): mean shift and
    variance ratio, floor-quantized on the millionths grid (the
    covariance family's fixed-point parity discipline; NULL var_ratio
    marks a degenerate reference dimension). The SHARED readout behind
    `plans.round9b.embedding_drift_report` (stats from the corpus) and
    its sidecar twin (stats from maintained moments) — one formula, so
    the drift-from-sidecars ≡ drift-from-corpus certification can never
    drift itself. Input frames are dim-sized: every join here is
    broadcast-cheap and corpus-size-independent."""

    def stats(df, mu, var):
        m = F.col("sx") / F.col("n")
        return df.select(
            "i",
            m.alias(mu),
            (F.col("sxx") / F.col("n") - m * m).alias(var),
        )

    def q6(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    r = stats(ref, "mu_ref", "var_ref")
    c = stats(cur, "mu_cur", "var_cur")
    return (
        r.join(c, "i")
        .select(
            F.col("i").cast("int").alias("i"),
            q6(F.col("mu_ref")).alias("mean_ref"),
            q6(F.col("mu_cur")).alias("mean_cur"),
            q6(F.col("mu_cur") - F.col("mu_ref")).alias("mean_shift"),
            q6(
                F.when(
                    F.col("var_ref") > 0, F.col("var_cur") / F.col("var_ref")
                )
            ).alias("var_ratio"),
        )
        .orderBy("i")
    )


def embedding_covariance(
    emb: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
    quant: float = 1e6,
) -> DataFrame:
    """Population covariance of every dimension pair (i <= j), long format
    ``(i, j, cov)``.

    cov(i,j) = Sxy/n − (Sx/n)(Sy/n) over the raw sums — one map-side
    expansion to pairwise products (JVM ``transform``/``flatten``), one
    keyed aggregate, then two broadcast joins against the 1×dim mean table.
    Values quantize through ``floor(x*quant + 0.5)/quant`` — the repo's
    fixed-point parity discipline, NOT ROUND: floor is the same IEEE op in
    every engine AND never emits negative zero (near-zero covariances are
    the common case off-diagonal, and ``-0.0`` vs ``0.0`` hash-differs).
    The partial-agg order error (~1e-13 relative) sits far below the grid.
    """
    v = F.col(vec_col).cast("array<double>")
    pair_sums = (
        emb.select(F.explode(_pair_products(v, dim)).alias("p"))
        .select("p.i", "p.j", "p.xy")
        .groupBy("i", "j")
        .agg(F.sum("xy").alias("sxy"), F.count(F.lit(1)).alias("n"))
    )
    dim_sums = (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"))
    )
    return (
        pair_sums.join(F.broadcast(dim_sums), "i")
        .join(
            F.broadcast(
                dim_sums.select(F.col("i").alias("j"), F.col("sx").alias("sy"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.floor(
                    (
                        F.col("sxy") / F.col("n")
                        - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
                    )
                    * F.lit(quant)
                    + F.lit(0.5)
                )
                / F.lit(quant)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def pca_components(
    emb: DataFrame,
    *,
    dim: int,
    k: int,
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k principal axes of the embedding corpus.

    Aggregates the dim×dim covariance distributed (one pass through
    :func:`embedding_covariance` at full double precision), collects the
    O(dim²) matrix to the driver — bounded model-training sync, not a data
    collect — and eigendecomposes with numpy. Returns ``(components,
    explained_variance, mean)``: components is (k, dim) with a
    deterministic sign convention (largest-|coefficient| entry positive,
    first-index tie-break), eigenvalues descending.
    """
    rows = embedding_covariance(
        emb, dim=dim, vec_col=vec_col, quant=1e12
    ).collect()
    cov = np.zeros((dim, dim))
    for r in rows:
        cov[r.i, r.j] = cov[r.j, r.i] = r.cov
    mean_rows = (
        emb.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("mu"))
        .collect()
    )
    mean = np.zeros(dim)
    for r in mean_rows:
        mean[r.i] = r.mu
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:  # deterministic sign: dominant coefficient positive
        j = int(np.argmax(np.abs(np.round(c, 12))))
        if c[j] < 0:
            c *= -1
    return comps, vals[order], mean


def _dot_lit(vec: Column, weights: np.ndarray) -> Column:
    arr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    emb: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    *,
    explained_variance: np.ndarray | None = None,
    vec_col: str = "embedding",
    out_col: str = "pca",
    eps: float = 1e-9,
) -> DataFrame:
    """Center and project the corpus onto the given axes — whitened
    (unit-variance per axis) when ``explained_variance`` is passed. Pure
    Catalyst: one dot product per axis against literal arrays; centering
    folds into the constant term (x−μ)·c = x·c − μ·c, so the row-side work
    is k fused JVM dot products and the plan stays whole-stage codegen."""
    v = F.col(vec_col).cast("array<double>")
    cols = []
    for a, comp in enumerate(components):
        c = _dot_lit(v, comp) - F.lit(float(np.dot(mean, comp)))
        if explained_variance is not None:
            c = c / F.lit(float(np.sqrt(explained_variance[a] + eps)))
        cols.append(c)
    return emb.withColumn(out_col, F.array(*cols))
