"""Similarity search over embedding columns (north-star additive scope).

Two paths:

- **brute force** (the correctness baseline): broadcast the query set,
  cosine via higher-order array functions (JVM-side, no Python), top-k per
  query via window. Exact. Cost O(|queries|·|corpus|) — fine when the query
  set is small/broadcastable, which is the serving-path shape.
- **random-hyperplane LSH** (the 100 TB scale path): sign-bit bucket keys
  from seeded hyperplanes; candidates only meet within a bucket
  (multi-probe across ``num_tables`` independent tables), then exact cosine
  re-rank on candidates. Recall tunable via bits/tables.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.windows import topk_per_group


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns — pure Catalyst
    higher-order functions, evaluated left-to-right (deterministic)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (must be small); the corpus streams map-side —
    no shuffle of corpus vectors. Output: (query_id, neighbor_id,
    cosine_sim, rnk) with deterministic id tie-break.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    sim = cosine_sim(F.col("qv"), F.col("nv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
        rank_col="rnk",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
        "rnk",
    ).orderBy("query_id", "rnk")


def _hyperplanes(dim: int, num_bits: int, num_tables: int, seed: int):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_tables, num_bits, dim))


@lru_cache(maxsize=8)
def _md5_planes(dim: int, num_bits: int, num_tables: int):
    """Hash-derived hyperplanes: component (t, b, i) is a deterministic
    function of md5(f"{t}:{b}:{i}") mapped to [-1, 1]. Every value is the
    SAME IEEE double an SQL engine derives from the same formula
    (``((md5_60bit % 2000001) - 1000000) / 1000000.0``), which makes the
    whole bucketing stage cross-engine reproducible — the seeded-Gaussian
    family can't be replayed in SQL. Uniform (not Gaussian) components
    still give valid sign-LSH bucketing for cosine.

    Plan-build cost control: the md5 calls are unavoidable (the VALUES are
    the contract), but the digest→double mapping is one numpy pass instead
    of a Python triple loop (first 15 hex chars == first 8 digest bytes
    >> 4), and the table is memoized per (dim, bits, tables) — at
    production dims (1-4k) with many tables a recompose would otherwise
    stall the driver for seconds. Callers treat the array as read-only."""
    import hashlib

    md5 = hashlib.md5
    raw = np.fromiter(
        (
            int.from_bytes(md5(f"{t}:{b}:{i}".encode()).digest()[:8], "big") >> 4
            for t in range(num_tables)
            for b in range(num_bits)
            for i in range(dim)
        ),
        dtype=np.uint64,
        count=num_tables * num_bits * dim,
    )
    planes = (
        (raw % 2000001).astype(np.int64) - 1000000
    ).astype(np.float64) / 1000000.0
    planes = planes.reshape(num_tables, num_bits, dim)
    planes.flags.writeable = False
    return planes


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    plane_source: str = "gaussian",
) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane (sign) LSH.

    Bucket key per table = sign bits of hyperplane dot products (computed in
    a vectorized pandas UDF, Arrow-batched). Corpus and queries are bucketed
    identically; the join shuffles on (table, bucket) only — at 100 TB no
    vector ever meets more than its bucket peers. Exact cosine re-ranks
    candidates; recall < 1 by construction, tuned by (num_bits, num_tables).

    ``dim`` is required (callers know it from the schema) so composing the
    plan triggers ZERO Spark jobs — no eager ``first()`` sniff at build
    time. ``plane_source``: ``"gaussian"`` (seeded, the default) or
    ``"md5"`` (hash-derived, SQL-replayable — the oracle-gated variant).
    """
    from pyspark.sql.functions import pandas_udf

    if plane_source == "md5":
        planes = _md5_planes(dim, num_bits, num_tables)
    else:
        planes = _hyperplanes(dim, num_bits, num_tables, seed)

    @pandas_udf("array<string>")
    def bucket_keys(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim)
        keys = []
        bits_all = [(m @ planes[t].T) > 0 for t in range(num_tables)]
        for i in range(m.shape[0]):
            keys.append(
                [
                    f"{t}:" + "".join("1" if b else "0" for b in bits_all[t][i])
                    for t in range(num_tables)
                ]
            )
        return pd.Series(keys)

    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"), v.alias(f"{prefix}_vec")
        ).withColumn("bucket", F.explode(bucket_keys(F.col(f"{prefix}_vec"))))

    cb = with_buckets(corpus, "neighbor")
    qb = with_buckets(queries, "query")
    # overlapping LSH tables DO need the pair dedup — but partitioning
    # the candidate stream by query_id FIRST lets one exchange serve
    # both the dedup (HashPartitioning(query_id) satisfies
    # ClusteredDistribution(query_id, neighbor_id) — subset key) and the
    # downstream per-query top-k window: 2 exchanges → 1 (guide §2.4,
    # same-key operations share one exchange; r13 bracket: 5→4
    # exchanges, wall neutral-to-better at sf0.1). Trade-off, priced:
    # the single exchange carries the RAW pair stream (the old dedup
    # exchange ran a map-side partial aggregate first), inflating bytes
    # by the pair-duplication factor — bounded by num_tables, and ≈1 for
    # sparse LSH; the old plan shipped the deduped pairs TWICE, so the
    # crossover is dup_factor ≈ 2 and fewer stages wins the block-count
    # game (§2.2) below it. Per-query skew exposure is unchanged — the
    # top-k window already collapsed each query to one task.
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine_sim(F.col("query_vec"), F.col("neighbor_vec"))
    scored = cand.select("query_id", "neighbor_id", sim.alias("sim"))
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
        rank_col="rnk",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
        "rnk",
    ).orderBy("query_id", "rnk")


def _sq8_train(corpus: DataFrame, vec_col: str, dim: int) -> tuple[Column, Column]:
    """The SQ8 quantizer: per-dimension (min, span) of the corpus. ONE
    bounded stats pass — O(dim) rows to the driver (legitimate quantizer
    training, not a data collect) — returned as two array literals so the
    encode/decode expressions stay pure Catalyst."""
    cvec = F.col(vec_col).cast("array<double>")
    stats = (
        corpus.select(F.posexplode(cvec).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    mins = [0.0] * dim
    spans = [0.0] * dim
    for r in stats:
        mins[r["i"]] = r["mn"]
        spans[r["i"]] = r["mx"] - r["mn"]
    return (
        F.array(*[F.lit(m) for m in mins]),
        F.array(*[F.lit(s) for s in spans]),
    )


def _sq8_dequant_expr(vec: Column, quantizer: tuple[Column, Column]) -> Column:
    """Quantize-then-dequantize a vector through uint8 codes. Quantize:
    ``floor((x-mn)/span*255 + 0.5)`` (0 when the dim is constant);
    dequantize: ``mn + c*span/255`` — the identical expression the SQL
    oracle writes, so IEEE arithmetic agrees bit-for-bit. The intermediate
    ``codes`` array is the at-rest storage form (4× smaller than float32)."""
    mn_arr, sp_arr = quantizer

    def _mn(i):
        return F.element_at(mn_arr, i + 1)

    def _sp(i):
        return F.element_at(sp_arr, i + 1)

    codes = F.transform(
        vec,
        lambda x, i: F.when(
            _sp(i) > 0.0, F.floor((x - _mn(i)) / _sp(i) * 255.0 + 0.5)
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return F.transform(
        codes, lambda c, i: _mn(i) + c.cast("double") * _sp(i) / 255.0
    )


def sq8_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
) -> DataFrame:
    """Scalar-quantized (SQ8) ANN: per-dimension linear quantization of the
    corpus to uint8 codes, asymmetric search (float query × dequantized
    corpus), top-k by approximate cosine.

    The memory-bound scale path: at 100 TB of embeddings the uint8 codes
    are 4× smaller at rest and in cache than float32 (8× vs double), and
    the quantizer is just per-dim (min, max) — one stats pass, no training.
    Recall loss is bounded by the per-dim quantization error (span/255);
    production stacks re-rank the top candidates with full-precision
    vectors (compose with :func:`brute_force_cosine_topk` over the
    result ids for that).

    Deterministic end-to-end — stats, codes, and dequantized values are
    exact functions of the corpus, so the whole pipeline (not just the
    re-rank) replays in SQL for the oracle gate. Quantize:
    ``floor((x-mn)/(mx-mn)*255 + 0.5)`` (0 when the dim is constant);
    dequantize: ``mn + c*(mx-mn)/255`` — both sides write the identical
    expression so IEEE arithmetic agrees bit-for-bit.
    """
    cvec = F.col(vec_col).cast("array<double>")
    dequant = _sq8_dequant_expr(cvec, _sq8_train(corpus, vec_col, dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), dequant.alias("nv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), cvec.alias("qv")
    )
    sim = cosine_sim(F.col("qv"), F.col("nv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
        rank_col="rnk",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
        "rnk",
    ).orderBy("query_id", "rnk")


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse quantizer + probe-and-rerank.

    Train ``nlist`` KMeans centroids (or take ``centroids`` — a tiny
    ``(list_id int, centroid array<double>)`` frame — as a FIXED coarse
    quantizer, which makes the whole pipeline deterministic and
    SQL-replayable for the oracle gate), assign every corpus vector to its
    nearest centroid (the inverted lists), probe each query's ``nprobe``
    nearest centroids, exact-cosine re-rank only vectors in probed lists.
    With ``nprobe == nlist`` this degrades to exact brute force (tested
    invariant); recall rises monotonically with nprobe.

    Scale: the corpus shuffles ONCE on list id (and would be written
    bucketed by it at rest); each query touches nprobe/nlist of the data.
    Centroids are tiny and ride along broadcast — classic IVF from the
    public ANN literature (e.g. FAISS's IVFFlat design), expressed as
    DataFrame ops.
    """
    cvec = F.col(vec_col).cast("array<double>")
    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = corpus.select(array_to_vector(cvec).alias("features"))
        model = KMeans(k=nlist, seed=seed, maxIter=10, featuresCol="features").fit(train)
        spark = corpus.sparkSession
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "list_id int, centroid array<double>",
        )

    def nearest_lists(df: DataFrame, prefix: str, n_take: int) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(f"{prefix}_id"), cvec.alias(f"{prefix}_vec")
        ).crossJoin(F.broadcast(centroids)).select(
            f"{prefix}_id",
            f"{prefix}_vec",
            "list_id",
            cosine_sim(F.col(f"{prefix}_vec"), F.col("centroid")).alias("csim"),
        )
        return topk_per_group(
            scored,
            partition_by=[f"{prefix}_id"],
            order_by=[F.desc("csim"), F.col("list_id")],
            k=n_take,
            rank_col="_crnk",
        ).select(f"{prefix}_id", f"{prefix}_vec", "list_id")

    lists = nearest_lists(corpus, "neighbor", 1)          # inverted lists
    probes = nearest_lists(queries, "query", nprobe)      # probed lists
    # no pair dedup: the corpus assignment is top-1, so each neighbor
    # lives in EXACTLY one inverted list and a (query, neighbor) pair can
    # materialize at most once — a distinct here would shuffle the whole
    # candidate stream on (query_id, neighbor_id) for nothing (guide
    # §2.4: a distinct on already-unique data). The overlapping-bucket
    # LSH paths keep theirs.
    cand = lists.join(F.broadcast(probes), "list_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = cosine_sim(F.col("query_vec"), F.col("neighbor_vec"))
    top = topk_per_group(
        cand.select("query_id", "neighbor_id", sim.alias("sim")),
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
        rank_col="rnk",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
        "rnk",
    ).orderBy("query_id", "rnk")


def ivf_sq8_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    centroids: DataFrame,
    dim: int,
) -> DataFrame:
    """IVF lists holding SQ8 codes + full-precision re-rank — the composed
    production shape (FAISS's IVF,SQ8 index factory expressed as DataFrame
    ops): the coarse quantizer prunes which lists a query touches
    (nprobe/nlist of the corpus), the scalar-quantized codes make the
    in-list scan 4× smaller, and only the top ``rerank`` candidates per
    query are re-scored against full-precision vectors.

    Deterministic end-to-end with a FIXED ``centroids`` frame: coarse
    assignment is an exact argmax, the SQ8 quantizer is a pure function of
    the corpus, and both ranking stages tie-break on neighbor id — so the
    ENTIRE pipeline (assignment, probe, approx scan, re-rank) replays in
    SQL for the oracle gate. With ``nprobe == nlist`` and ``rerank`` ≥ the
    candidate count this degrades to exact brute force (tested invariant).

    Scale: corpus shuffles once on list id (stored bucketed by it at
    rest, codes not floats); the re-rank join ships only |queries|·rerank
    candidate ids, broadcast against the full-precision table — the big
    side never reshuffles.
    """
    cvec = F.col(vec_col).cast("array<double>")
    dequant = _sq8_dequant_expr(cvec, _sq8_train(corpus, vec_col, dim))

    def nearest_lists(df: DataFrame, prefix: str, n_take: int, payload: Column) -> DataFrame:
        scored = df.select(
            F.col(id_col).alias(f"{prefix}_id"), payload.alias(f"{prefix}_vec")
        ).crossJoin(F.broadcast(centroids)).select(
            f"{prefix}_id",
            f"{prefix}_vec",
            "list_id",
            cosine_sim(F.col(f"{prefix}_vec"), F.col("centroid")).alias("csim"),
        )
        return topk_per_group(
            scored,
            partition_by=[f"{prefix}_id"],
            order_by=[F.desc("csim"), F.col("list_id")],
            k=n_take,
            rank_col="_crnk",
        ).select(f"{prefix}_id", f"{prefix}_vec", "list_id")

    # inverted lists: assignment by the FULL vector (build-time exactness),
    # per-list payload = the dequantized SQ8 code vector (the stored form)
    lists = nearest_lists(corpus, "neighbor", 1, payload=cvec).select(
        "neighbor_id", "list_id"
    ).join(
        corpus.select(F.col(id_col).alias("neighbor_id"), dequant.alias("nv_q")),
        "neighbor_id",
    )
    probes = nearest_lists(queries, "query", nprobe, payload=cvec)
    # no pair dedup: top-1 corpus assignment ⇒ one list per neighbor ⇒
    # (query, neighbor) pairs are already distinct (see ivf_cosine_topk)
    approx = (
        lists.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("query_vec"), F.col("nv_q")).alias("asim"),
        )
    )
    shortlist = topk_per_group(
        approx,
        partition_by=["query_id"],
        order_by=[F.desc("asim"), F.col("neighbor_id")],
        k=rerank,
        rank_col="_arnk",
    ).select("query_id", "neighbor_id")
    # full-precision re-rank: the tiny shortlist broadcasts against the
    # full-precision table; the corpus side streams map-side
    full = corpus.select(F.col(id_col).alias("neighbor_id"), cvec.alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"), cvec.alias("qv"))
    exact = (
        full.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    top = topk_per_group(
        exact,
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
        rank_col="rnk",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
        "rnk",
    ).orderBy("query_id", "rnk")


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    num_tables: int = 4,
    probes: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    plane_source: str = "gaussian",
) -> DataFrame:
    """Multi-probe sign-LSH ANN (Lv et al., VLDB 2007, specialized to
    radius-1 perturbations): besides its base bucket, each QUERY also
    probes the ``probes`` buckets obtained by flipping one sign bit —
    chosen as the bits with the smallest |hyperplane margin|, i.e. the
    hash decisions most likely to have split true neighbors.

    The 100 TB lever: recall per byte. A missed neighbor usually differs
    in exactly the lowest-margin bit, so radius-1 probing recovers most
    of the recall an EXTRA TABLE would buy — without storing or shuffling
    another full copy of the corpus index (the corpus side keeps ONE base
    bucket per table; only the query side fans out, by a constant
    ``1+probes`` factor on a broadcast-sized frame).

    Deterministic probe order: |margin| ascending with bit-index
    tie-break, so the md5 plane family replays the whole candidate set in
    SQL (the oracle-gated variant).
    """
    from pyspark.sql.functions import pandas_udf

    if not 0 < probes < num_bits:
        raise ValueError(f"probes must be in (0, {num_bits}), got {probes}")
    if plane_source == "md5":
        planes = _md5_planes(dim, num_bits, num_tables)
    else:
        planes = _hyperplanes(dim, num_bits, num_tables, seed)

    def _keys_udf(n_extra: int):
        @pandas_udf("array<string>")
        def keys(vecs: pd.Series) -> pd.Series:
            m = np.stack(vecs.to_numpy())
            out = []
            dots_all = [m @ planes[t].T for t in range(num_tables)]
            for i in range(m.shape[0]):
                ks = []
                for t in range(num_tables):
                    dots = dots_all[t][i]
                    bits = dots > 0
                    base = "".join("1" if b else "0" for b in bits)
                    ks.append(f"{t}:{base}")
                    # radius-1 probes: flip the n_extra lowest-|margin|
                    # bits, one at a time (|margin| asc, bit-index asc)
                    order = np.lexsort((np.arange(num_bits), np.abs(dots)))
                    for j in order[:n_extra]:
                        flipped = (
                            base[:j]
                            + ("0" if bits[j] else "1")
                            + base[j + 1 :]
                        )
                        ks.append(f"{t}:{flipped}")
                out.append(ks)
            return pd.Series(out)

        return keys

    def with_buckets(df: DataFrame, prefix: str, n_extra: int) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"), v.alias(f"{prefix}_vec")
        ).withColumn(
            "bucket", F.explode(_keys_udf(n_extra)(F.col(f"{prefix}_vec")))
        )

    cb = with_buckets(corpus, "neighbor", 0)  # base buckets only
    qb = with_buckets(queries, "query", probes)
    # same subset-key exchange share as lsh_cosine_topk: partition by
    # query_id once; the (query, neighbor) dedup and the per-query
    # top-k window both run on that single exchange (guide §2.4)
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .repartition("query_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = cosine_sim(F.col("query_vec"), F.col("neighbor_vec"))
    scored = cand.select("query_id", "neighbor_id", sim.alias("sim"))
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
        rank_col="rnk",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
        "rnk",
    ).orderBy("query_id", "rnk")
