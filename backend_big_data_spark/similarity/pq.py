"""Product-quantized (PQ) ANN — subspace codebooks + asymmetric distance.

The third leg of the quantized-ANN family (next to SQ8 and IVF,
similarity/ann.py): split each vector into ``m`` subvectors, quantize each
subvector to its nearest entry of a per-subspace codebook, store only the
``m`` code ids. With ``m=8`` subspaces × 16 codes, a 64-dim float32 vector
(256 B) compresses to 8 nibbles (4 B) — 64× smaller at rest; search is
asymmetric (full-precision query vs reconstructed corpus), the classic ADC
scheme from the public PQ literature (Jégou et al., FAISS's PQ index).

Determinism for the oracle gate: codebooks are normally KMeans-trained per
subspace; like IVF's fixed-centroid mode, a FIXED anchor policy (the
subvectors of the ``ksub`` lowest-id corpus vectors) makes encode/decode an
exact argmin — the ENTIRE pipeline replays in SQL. A KMeans-per-subspace
trainer can drop in without touching search (same codebook frame contract).

Scale notes:
- encode is one explode (m rows per vector) + broadcast-join against the
  tiny codebook + one keyed reassembly agg — shuffles on the vector id
  only, and at rest the codes table IS the corpus (4 B/vector);
- squared-L2 to each code is an 8-element fold in whole-stage codegen;
  both engines sum left-to-right over the same doubles, so argmin ties
  cannot diverge (and ties proper break on code_id);
- ADC search here is the exhaustive form (every vector's reconstruction is
  scored); compose with IVF lists exactly like ``ivf_sq8_cosine_topk``
  for the sub-linear path — the encode/decode contract is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from backend_big_data_spark.operators.windows import topk_per_group
from backend_big_data_spark.similarity.ann import cosine_sim


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance, summed left-to-right (matches the oracle's
    list_sum(list_transform(...)) fold order bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def anchor_codebooks(
    corpus: DataFrame,
    m: int,
    d_sub: int,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic per-subspace codebooks: entry ``c`` of subspace ``j``
    is the ``j``-th subvector of the ``c``-th lowest-id corpus vector.
    Output: ``(sub_id int, code_id int, codevec array<double>)`` —
    m × ksub rows, broadcast-sized by construction."""
    cvec = F.col(vec_col).cast("array<double>")
    # ksub lowest-id vectors; the limit bounds the window input to ksub
    # rows, so the unpartitioned row_number sorts a constant-sized frame
    anchors = (
        corpus.orderBy(id_col)
        .limit(ksub)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("__rk"),
            cvec.alias("__v"),
        )
        .select((F.col("__rk") - 1).cast("int").alias("code_id"), "__v")
    )
    subs = F.array(
        *[F.slice(F.col("__v"), j * d_sub + 1, d_sub) for j in range(m)]
    )
    return anchors.select(
        "code_id", F.posexplode(subs).alias("sub_id", "codevec")
    ).select(F.col("sub_id").cast("int"), "code_id", "codevec")


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int,
    d_sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every subvector to its nearest codebook entry (squared-L2
    argmin, ties → min code_id). Output: ``(id_col, sub_id, code_id)`` —
    the at-rest PQ representation."""
    cvec = F.col(vec_col).cast("array<double>")
    subs = F.array(*[F.slice(cvec, j * d_sub + 1, d_sub) for j in range(m)])
    exploded = corpus.select(
        F.col(id_col), F.posexplode(subs).alias("sub_id", "subvec")
    ).select(F.col(id_col), F.col("sub_id").cast("int"), "subvec")
    scored = exploded.join(F.broadcast(codebooks), "sub_id").select(
        id_col,
        "sub_id",
        "code_id",
        _sq_l2(F.col("subvec"), F.col("codevec")).alias("d2"),
    )
    # argmin via min(struct(d2, code_id)) — ONE hash aggregate with
    # map-side partial combine over the |corpus|·m·ksub scored rows,
    # instead of a window (sort + full materialization of every scored
    # row per group). Lexicographic struct ordering = (min d2, tie → min
    # code_id), identical to the oracle's row_number ordering. Measured
    # −40% on the PQ encode stage at sf0.1.
    best = scored.groupBy(id_col, "sub_id").agg(
        F.min(F.struct("d2", "code_id")).alias("_b")
    )
    return best.select(id_col, "sub_id", F.col("_b.code_id").alias("code_id"))


def pq_reconstruct(
    codes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Decode PQ codes back to approximate vectors: look the codevector up
    per (sub_id, code_id) and concatenate in subspace order. Output:
    ``(id_col, recon array<double>)``."""
    joined = codes.join(F.broadcast(codebooks), ["sub_id", "code_id"])
    return joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_id", "codevec"))),
                lambda s: s["codevec"],
            )
        ).alias("recon")
    )


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC top-k: full-precision queries scored against PQ-reconstructed
    corpus vectors by cosine, tie-break on neighbor id. Same output
    contract as the other ANN entry points (query_id, neighbor_id,
    cosine_sim[6dp], rnk)."""
    assert dim % m == 0, "dim must divide into m equal subspaces"
    d_sub = dim // m
    if codebooks is None:
        codebooks = anchor_codebooks(
            corpus, m=m, d_sub=d_sub, ksub=ksub, id_col=id_col, vec_col=vec_col
        )
    codes = pq_encode(corpus, codebooks, m=m, d_sub=d_sub, id_col=id_col, vec_col=vec_col)
    recon = pq_reconstruct(codes, codebooks, id_col=id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("recon").alias("nv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("nv")).alias("sim"),
        )
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


__all__ = [
    "anchor_codebooks",
    "ivf_pq_cosine_topk",
    "pq_cosine_topk",
    "pq_encode",
    "pq_reconstruct",
    "train_pq_codebooks",
]


def ivf_pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    nprobe: int = 3,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    centroids: DataFrame,
    dim: int,
) -> DataFrame:
    """IVF lists holding PQ codes of RESIDUALS + full-precision re-rank —
    the complete FAISS-style "IVFx,PQy" workhorse expressed as DataFrame
    ops: the coarse quantizer prunes which lists a query touches, each
    in-list vector is stored as the PQ codes of its residual
    (``x − centroid`` — residuals concentrate near 0, so the same codebook
    budget spends its resolution where the data is), ADC scores the probed
    candidates, and only the top ``rerank`` per query are re-scored
    against full-precision vectors.

    Deterministic end-to-end with FIXED ``centroids`` and anchor
    codebooks (residuals of the ``ksub`` lowest-id vectors): assignment,
    residual, encode, decode, probe, and both rankings replay in SQL.

    Scale: corpus shuffles once on list id; the at-rest form per vector
    is ``m`` nibble/byte codes + a list id; the re-rank ships only
    |queries|·rerank ids broadcast against the full-precision table.
    """
    assert dim % m == 0
    d_sub = dim // m
    cvec = F.col(vec_col).cast("array<double>")

    def nearest_lists(df: DataFrame, prefix: str, n_take: int) -> DataFrame:
        scored = (
            df.select(F.col(id_col).alias(f"{prefix}_id"), cvec.alias(f"{prefix}_vec"))
            .crossJoin(F.broadcast(centroids))
            .select(
                f"{prefix}_id",
                f"{prefix}_vec",
                "list_id",
                cosine_sim(F.col(f"{prefix}_vec"), F.col("centroid")).alias("csim"),
            )
        )
        return topk_per_group(
            scored,
            partition_by=[f"{prefix}_id"],
            order_by=[F.desc("csim"), F.col("list_id")],
            k=n_take,
            rank_col="_crnk",
        ).select(f"{prefix}_id", f"{prefix}_vec", "list_id")

    # corpus→list assignment is a top-1: argmax via max(struct) hash
    # aggregate (map-side combine) instead of a window over the
    # |corpus|·nlist scored rows; (csim, −list_id) ordering ≡ the window's
    # (csim DESC, list_id ASC)
    cscored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), cvec.alias("neighbor_vec"))
        .crossJoin(F.broadcast(centroids))
        .select(
            "neighbor_id",
            F.struct(
                cosine_sim(F.col("neighbor_vec"), F.col("centroid")).alias("csim"),
                (-F.col("list_id")).alias("_nl"),
                F.col("list_id").alias("list_id"),
                F.col("neighbor_vec").alias("v"),
            ).alias("_s"),
        )
    )
    assigned = (
        cscored.groupBy("neighbor_id")
        .agg(F.max("_s").alias("_b"))
        .select(
            "neighbor_id",
            F.col("_b.list_id").alias("list_id"),
            F.col("_b.v").alias("neighbor_vec"),
        )
    )
    resid = assigned.join(F.broadcast(centroids), "list_id").select(
        F.col("neighbor_id").alias(id_col),
        "list_id",
        F.zip_with(
            F.col("neighbor_vec"), F.col("centroid"), lambda x, c: x - c
        ).alias("rvec"),
    )
    # NOT pinned (r12 measured): the residual table feeds three branches
    # (codebooks, encode, recon re-attach) but their shared assignment
    # subtree plans identical exchanges, which runtime exchange reuse
    # already de-duplicates — an eager pin measured 4.3s → 6.0s.
    codebooks = anchor_codebooks(
        resid, m=m, d_sub=d_sub, ksub=ksub, id_col=id_col, vec_col="rvec"
    )
    codes = pq_encode(resid, codebooks, m=m, d_sub=d_sub, id_col=id_col, vec_col="rvec")
    rhat = pq_reconstruct(codes, codebooks, id_col=id_col)
    recon = (
        rhat.join(resid.select(id_col, "list_id"), id_col)
        .join(F.broadcast(centroids), "list_id")
        .select(
            F.col(id_col).alias("neighbor_id"),
            "list_id",
            F.zip_with(F.col("recon"), F.col("centroid"), lambda r, c: r + c).alias(
                "nv_q"
            ),
        )
    )
    probes = nearest_lists(queries, "query", nprobe)
    # no pair dedup: the argmax assignment above puts each neighbor in
    # EXACTLY one list, so (query, neighbor) pairs are already distinct —
    # a distinct would shuffle the candidate stream for nothing (§2.4)
    approx = (
        recon.join(F.broadcast(probes), "list_id")
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


def train_pq_codebooks(
    corpus: DataFrame,
    m: int,
    d_sub: int,
    ksub: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """KMeans-per-subspace PQ codebooks — the production trainer behind the
    same ``(sub_id, code_id, codevec)`` frame contract the anchor policy
    fills, so ``pq_encode`` / ``pq_cosine_topk`` / ``ivf_pq_cosine_topk``
    take either interchangeably (``codebooks=...``).

    Training is a driver loop over the ``m`` subspaces (m is small — 8/16;
    each fit is a DISTRIBUTED pyspark.ml KMeans over that subspace's
    slices); like the IVF KMeans quantizer and Lloyd training in
    ml/clustering.py, the trainer itself is inherently rows-only for the
    oracle gate — search stays SQL-replayable via the fixed-codebook path.
    KMeans minimizes exactly the encode objective (mean squared subvector
    distance), so trained codebooks dominate anchors on distortion
    (tested).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cvec = F.col(vec_col).cast("array<double>")
    spark = corpus.sparkSession
    rows = []
    for j in range(m):
        sub = corpus.select(
            array_to_vector(F.slice(cvec, j * d_sub + 1, d_sub)).alias("features")
        )
        model = KMeans(k=ksub, seed=seed + j, maxIter=10).fit(sub)
        for c, center in enumerate(model.clusterCenters()):
            rows.append((j, c, [float(x) for x in center]))
    return spark.createDataFrame(
        rows, "sub_id int, code_id int, codevec array<double>"
    )
