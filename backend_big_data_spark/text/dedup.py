"""Document deduplication operators (north-star additive scope).

Four families, all expressed as distributed DataFrame plans:

- **exact**: content fingerprint (md5/sha2) + hash groupBy. One shuffle on
  the fingerprint; at 100 TB this is the cheapest possible dedup.
- **MinHash + LSH**: shingle → k minhashes → b bands × r rows → band-bucket
  self-join for candidate pairs. Candidate generation touches only documents
  sharing a band key — never the O(n²) pair space. (Broder's MinHash and the
  banding construction from the public MMDS literature.)
- **n-gram Jaccard (exact)**: inverted-index self-join on shingles computing
  exact Jaccard. Quadratic in the worst case — at scale run it only as the
  verify stage on LSH candidates (``ngram_jaccard_pairs`` accepts any
  pre-filtered doc set).
- **SimHash**: 64-bit bitwise-majority signature via an Arrow-batched pandas
  UDF (numpy), Hamming-banded for candidates.

Hash strategy: ``hash_fn="xxhash64"`` (JVM, fast — the 100 TB default) or
``"md5"`` (reproducible in any SQL engine — used by the DuckDB oracle gate).
Both are deterministic; only md5 is cross-engine portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens, word_shingles


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content fingerprint with its duplicate count and
    canonical (min-id) representative. ``dup_count > 1`` rows are duplicate
    clusters; keeping ``canonical_doc_id`` reproduces a dedup'd corpus via a
    semi-join. Single hash-aggregate shuffle on the 16-byte fingerprint."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("fingerprint"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------
def _minhash_col(shingles: Column, seed: int, hash_fn: str) -> Column:
    if hash_fn == "md5":
        hashed = F.transform(
            shingles, lambda x: F.md5(F.concat(F.lit(f"{seed}:"), x).cast("binary"))
        )
    elif hash_fn == "xxhash64":
        hashed = F.transform(shingles, lambda x: F.xxhash64(F.concat(F.lit(f"{seed}:"), x)))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return F.array_min(hashed)


#: Persisted intermediates handed out by this module, so a long-lived
#: serving session can release them when a corpus is swapped out instead of
#: accumulating cache entries until LRU eviction pressure sets in.
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame, persist: bool) -> DataFrame:
    if not persist:
        return df
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_dedup_caches() -> int:
    """Unpersist every intermediate this module has persisted; returns the
    number released. The serving layer calls this on corpus swap."""
    n = 0
    for df in _PERSISTED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    _PERSISTED.clear()
    return n


def doc_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    persist: bool = True,
) -> DataFrame:
    """(id, shingles) pairs; documents shorter than ``n`` tokens drop out.

    Input is repartitioned first: shingling is the compute-bound stage of
    every dedup pipeline and must never run on a single input split."""
    from backend_big_data_spark.sources.catalog import ensure_parallelism

    # Materialize the token array in its OWN projection before shingling:
    # inlining tokens() into word_shingles() would re-run the regex split
    # inside every element_at of every shingle (measured 5× slower at
    # sf0.1). Catalyst keeps the two projections separate because __toks is
    # referenced many times.
    toks = (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    )
    out = (
        toks.select(
            F.col(id_col), word_shingles(F.col("__toks"), n=n).alias("shingles")
        )
        .filter(F.size("shingles") > 0)
    )
    # Persist: within one serving session several dedup queries (minhash,
    # exact jaccard, two-stage verify) all start from this table, and
    # Spark's cache manager keys on the canonical plan — the first query
    # materializes, the rest reuse. Shingles are ~2× the text in size;
    # release via release_dedup_caches() (or pass persist=False).
    return _persist(out, persist)


def minhash_signatures(
    shingled: DataFrame,
    num_hashes: int = 16,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
) -> DataFrame:
    """k minhash columns ``mh0..mh{k-1}`` per document. All k hashes evaluate
    in one codegen stage over the shingle array — one pass over the data."""
    sig_cols = [
        _minhash_col(F.col("shingles"), s, hash_fn).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return shingled.select(F.col(id_col), *sig_cols)


def _band_key(sig_cols: list[str], hash_fn: str) -> Column:
    joined = F.concat_ws("|", *[F.col(c).cast("string") for c in sig_cols])
    if hash_fn == "md5":
        return F.md5(joined.cast("binary"))
    return F.xxhash64(joined).cast("string")


def band_table(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_key) — the banded-LSH index rows for a signature
    frame. This is the table a recurring ingest PERSISTS at admission
    time (`streaming/ingest_dedup.py`): probing it replaces re-shingling
    the at-rest corpus on every arriving batch."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _band_key([f"mh{b * r + i}" for i in range(r)], hash_fn).alias("band_key"),
        )
        for b in range(bands)
    ]
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, "bk.band", "bk.band_key")


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs from banded minhash signatures.

    Emits (doc_a, doc_b, est_jaccard) where est_jaccard is the fraction of
    agreeing minhashes. Pairs surface iff some band matches exactly — the
    standard LSH S-curve: with k=16, b=4 (r=4), P(candidate) = 1-(1-j⁴)⁴.

    Scale: the self-join shuffles on (band, band_key) — documents only meet
    within a bucket. A pathological bucket (many identical docs) is quadratic
    in that bucket only; AQE skew-join splits it across tasks.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    # The signature table is read three times (both join sides + the agree
    # columns); persist it so shingling/hashing runs once. Spark's cache
    # manager keys on the canonical plan, so repeated invocations share one
    # entry. Signatures are tiny relative to the corpus (k hashes/doc);
    # release via release_dedup_caches().
    signatures = _persist(signatures, persist)
    r = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _band_key([f"mh{b * r + i}" for i in range(r)], hash_fn).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), *[F.col(f"mh{s}") for s in range(num_hashes)],
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(id_col, *[f"mh{s}" for s in range(num_hashes)], "bk.band", "bk.band_key")

    a = banded.alias("a")
    b = banded.alias("b")
    agree = sum(
        F.when(F.col(f"a.mh{s}") == F.col(f"b.mh{s}"), 1).otherwise(0)
        for s in range(num_hashes)
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            (agree / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs


# --------------------------------------------------------------------------
# exact n-gram Jaccard
# --------------------------------------------------------------------------
#: default document-frequency cap — a shingle shared by more documents than
#: this carries no dedup signal and would expand to df(df-1)/2 pairs in one
#: posting row. Uncapped all-pairs behaviour now requires an EXPLICIT
#: ``max_df=None`` opt-in; the exact scale path is
#: `text/setjoin.prefix_filtered_jaccard_pairs` (PPJoin), which never
#: materialises hot-shingle pair expansions at all.
DEFAULT_MAX_DF = 256


def ngram_jaccard_pairs(
    shingled: DataFrame,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    max_df: int | None = DEFAULT_MAX_DF,
) -> DataFrame:
    """Exact Jaccard over distinct word n-grams via an inverted index.

    Formulation: group the exploded (shingle → doc) index by shingle, keep
    only shingles shared by ≥2 documents (unique shingles — the vast
    majority — can never contribute to an intersection), and generate the
    ordered doc pairs array-side with higher-order functions. Counting pair
    occurrences gives |A∩B|; |A∪B| = |A|+|B|-|A∩B|. ONE wide shuffle (on
    shingle) + one small shuffle (on surviving pairs) — measured ~30% faster
    than the equivalent inverted-index self-join, which shuffles the full
    index twice.

    Skew/scale: a shingle appearing in d documents expands to d(d-1)/2
    pairs inside one row. ``max_df`` caps that document frequency —
    ultra-common shingles carry no dedup signal and production pipelines
    drop them (the cap slightly LOWERS intersection counts for pairs that
    shared a dropped shingle). The cap is ON by default
    (``DEFAULT_MAX_DF``); passing ``max_df=None`` is an explicit opt-in to
    the quadratic all-pairs form, which exists only as the oracle
    cross-check for `text/setjoin.prefix_filtered_jaccard_pairs` — use the
    PPJoin there when you need EXACT pairs at scale (measured 59× faster
    on a hot-shingle corpus, identical output). At 100 TB: run on LSH
    candidates, not the raw corpus, and keep the cap.
    """
    e = shingled.select(
        F.col(id_col),
        F.size("shingles").alias("sh_count"),
        F.explode("shingles").alias("shingle"),
    )
    grouped = (
        e.groupBy("shingle")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("i"), F.col("sh_count").alias("c"))
            ).alias("docs")
        )
        .filter(F.size("docs") >= 2)
    )
    if max_df is not None:
        grouped = grouped.filter(F.size("docs") <= max_df)
    # ordered pairs (a < b) from the per-shingle posting list, array-side
    docs_sorted = F.array_sort("docs")
    pair_arrays = F.flatten(
        F.transform(
            docs_sorted,
            lambda x, i: F.transform(
                F.slice(
                    docs_sorted,
                    i + F.lit(2),
                    F.greatest(F.size(docs_sorted) - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(
                    x["i"].alias("a"),
                    x["c"].alias("ca"),
                    y["i"].alias("b"),
                    y["c"].alias("cb"),
                ),
            ),
        )
    )
    pairs = grouped.select(F.explode(pair_arrays).alias("p")).select(
        "p.a", "p.ca", "p.b", "p.cb"
    )
    inter = pairs.groupBy("a", "b", "ca", "cb").agg(
        F.count("*").alias("intersection_size")
    )
    jac = F.col("intersection_size") / (
        F.col("ca") + F.col("cb") - F.col("intersection_size")
    )
    return inter.filter(jac >= threshold).select(
        F.col("a").alias("doc_a"),
        F.col("b").alias("doc_b"),
        "intersection_size",
        F.round(jac, 6).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document as a zero-padded hex string.

    Arrow-batched ``mapInPandas``: token hashes from md5 (deterministic,
    portable), bit-majority via numpy unpackbits — vectorized per batch, not
    per row. Output: (id, simhash_hex, n_tokens).
    """
    import pandas as pd  # noqa: F401 (imported for type clarity)

    out_schema = f"{id_col} long, simhash_hex string, n_tokens int"

    def compute(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, hexes, ntoks = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = text.split()
                if not toks:
                    ids.append(doc_id)
                    hexes.append("0" * 16)
                    ntoks.append(0)
                    continue
                h = np.frombuffer(
                    b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks),
                    dtype=np.uint8,
                ).reshape(len(toks), 8)
                bits = np.unpackbits(h, axis=1).astype(np.int32)  # (n, 64) of 0/1
                votes = (2 * bits - 1).sum(axis=0)
                sig_bits = (votes > 0).astype(np.uint8)
                sig = np.packbits(sig_bits).tobytes()
                ids.append(doc_id)
                hexes.append(sig.hex())
                ntoks.append(len(toks))
            yield pd.DataFrame(
                {id_col: ids, "simhash_hex": hexes, "n_tokens": ntoks}
            )

    return df.select(id_col, text_col).mapInPandas(compute, schema=out_schema)


def simhash_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Hamming-adjacent candidates by 16-bit band equality (4 bands over the
    64-bit signature): pairs agreeing on ≥1 band. Same banded-join shape as
    MinHash LSH, so the same skew/scale properties apply."""
    bands = [
        F.struct(F.lit(i).alias("band"), F.substring("simhash_hex", 1 + 4 * i, 4).alias("bk"))
        for i in range(4)
    ]
    banded = signatures.select(
        F.col(id_col), F.col("simhash_hex"), F.explode(F.array(*bands)).alias("b")
    ).select(id_col, "simhash_hex", "b.band", "b.bk")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash_hex").alias("simhash_a"),
            F.col("b.simhash_hex").alias("simhash_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


# --------------------------------------------------------------------------
# Winnowing (rolling-hash document fingerprinting)
# --------------------------------------------------------------------------
def winnowing_fingerprints(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS algorithm): hash every POSITIONAL character k-gram, slide a window
    of ``window`` hashes, keep each window's minimum, distinct the kept set.
    Guarantees: any shared substring of length ≥ k+window-1 contributes at
    least one shared fingerprint — the standard containment/overlap
    detector (plagiarism, near-dup at passage granularity).

    All higher-order column expressions (sequence/transform/slice/
    array_min) — no Python. The positional k-gram hash array materializes
    in its own projection so the substring+hash work runs once, not once
    per window (same CSE hazard as ``doc_shingles``).

    Output: (id, fingerprint) exploded — ready for a groupBy-join exactly
    like ``ngram_jaccard_pairs``' inverted index.
    """
    text = F.col(text_col)
    n_grams = F.length(text) - k + 1
    if hash_fn == "xxhash64":
        gram_hash = lambda i: F.xxhash64(F.substring(text, i, F.lit(k)))
    elif hash_fn == "md5":
        # first 15 hex chars = 60 bits: positive in any signed/unsigned
        # integer type, so window-min agrees across engines (the SQL oracle
        # computes the identical value)
        gram_hash = lambda i: F.conv(
            F.substring(F.md5(F.substring(text, i, F.lit(k))), 1, 15), 16, 10
        ).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(0))), gram_hash
    )
    hashed = df.select(F.col(id_col), gram_hashes.alias("__h")).filter(
        F.size("__h") > 0
    )
    n_windows = F.size(F.col("__h")) - window + 1
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
        lambda i: F.array_min(F.slice(F.col("__h"), i, window)),
    )
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fingerprint")
    )


# --------------------------------------------------------------------------
# Two-stage near-dup pipeline: LSH candidates → exact verify
# --------------------------------------------------------------------------
def lsh_verified_pairs(
    shingled: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """The production near-dup shape: MinHash-LSH proposes candidates
    (cheap, recall-oriented), exact Jaccard verifies them (precision). The
    expensive exact stage runs ONLY on documents that appear in some
    candidate pair — a semi-join prunes the shingle index to the candidate
    doc set first, so at 100 TB the quadratic stage touches a vanishing
    fraction of the corpus.

    Output: (doc_a, doc_b, est_jaccard, intersection_size, jaccard) for
    pairs whose EXACT jaccard ≥ threshold. Subset guarantee: every output
    pair is an LSH candidate; pairs the banding misses (jaccard below the
    S-curve's recall at this (bands, rows) point) are absent by design.
    """
    # The shingle table feeds BOTH stages (signatures + exact verify);
    # persist it so tokenize/shingle runs once. Spark's cache manager keys
    # on the canonical plan, so repeated pipeline invocations share it;
    # release via release_dedup_caches().
    shingled = _persist(shingled, persist)
    sigs = minhash_signatures(shingled, num_hashes, hash_fn, id_col)
    cand = lsh_candidate_pairs(sigs, num_hashes, bands, hash_fn, id_col, persist=persist)
    cand_docs = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    pruned = shingled.join(cand_docs, on=id_col, how="semi")
    # max_df=None: the verify stage must be EXACT, and its input is already
    # pruned to candidate docs (bounded), so the all-pairs opt-in is safe
    exact = ngram_jaccard_pairs(pruned, threshold=0.0, id_col=id_col, max_df=None)
    return (
        cand.join(exact, on=["doc_a", "doc_b"], how="inner")
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard", "intersection_size", "jaccard")
    )


# --------------------------------------------------------------------------
# Incremental dedup: admit a NEW batch against an already-ingested corpus
# --------------------------------------------------------------------------
def incremental_dedup_kept(
    docs: DataFrame,
    is_new: Column,
    verified_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    within_batch_near: bool = False,
    corpus_fp_bloom: list[int] | None = None,
    bloom_bits: int = 1 << 17,
    bloom_hashes: int = 3,
    corpus_fps: DataFrame | None = None,
) -> DataFrame:
    """Which NEW-batch documents survive dedup against the EXISTING corpus
    — the production ingest shape: the corpus is already deduped and at
    rest; only the arriving batch is probed against it (plus within-batch
    exact dedup), and nothing already admitted is ever re-evaluated
    (key-hash assignment stability is what makes this incremental).

    Removal policy, deterministic and order-free:

    - exact: a batch doc whose content fingerprint (md5) exists anywhere
      in the corpus, or that is not the min-id holder of its fingerprint
      WITHIN the batch;
    - near (cross): a batch doc appearing in a ``verified_pairs`` row
      whose other side is an existing doc;
    - near (within batch, ``within_batch_near=True``): near-dup pairs
      INSIDE the arriving batch are resolved transitively — connected
      components over the both-new pairs, keep only the min-id member of
      each component (a real ingest hits internal near-dups immediately;
      a pair-wise drop would under-remove chains). The component min is
      kept even if the cross/exact rules remove it: its near-twins are
      transitively near the corpus content that displaced it.

    Scale: two fingerprint semi-joins + one pair filter — no full-corpus
    rescan; at 100 TB the corpus side is just its (16-byte fp) and
    (shingle index / LSH bands) tables, both maintained incrementally.
    The within-batch component step runs on the BATCH near-pair graph
    only (operators/graph.py min-label propagation — O(diameter) rounds,
    2-4 for the near-clique clusters dedup produces).

    ``corpus_fp_bloom``: optional Bloom bitmap over the CORPUS content
    fingerprints (`build_shingle_bloom` over md5(text) words, maintained
    incrementally via `merge_blooms` — see `streaming/ingest_dedup.py`).
    When set, batch rows whose fingerprint is definitely absent from the
    corpus skip the vs-corpus semi-join entirely (`apply_bloom_prefilter`
    — map-side, ahead of the exchange). Result-invariant: Blooms have no
    false negatives, and false positives are re-checked by the exact
    semi-join.

    ``corpus_fps``: optional pre-materialized corpus fingerprint frame
    (one ``__fp`` column — e.g. the fp column the streaming sinks persist
    at admission time). When provided, the vs-corpus probe neither
    re-hashes the corpus text nor shuffles it: the batch's distinct
    fingerprints (micro-batch-bounded) are BROADCAST and the corpus side
    is a map-side broadcast semi-join over a 16-byte column scan — zero
    Exchange, zero sort on the corpus at any scale.
    """
    base = docs.select(F.col(id_col), F.col(text_col), is_new.alias("__new"))
    # The pair table is tiny (near-dup pairs only) but its producing subtree
    # (LSH bands + exact verify) is the most expensive plan in the module.
    # With within_batch_near it feeds TWO consumers (cross-near removal,
    # within-batch components) — persist so it materializes once, released
    # via release_dedup_caches(). Cross-only mode has ONE consumer: a
    # persist there is pure cost plus a cache entry to leak.
    verified_pairs = _persist(verified_pairs, within_batch_near)
    fps = base.select(
        F.col(id_col), F.md5(text_col).alias("__fp"), F.col("__new")
    )
    batch = fps.filter(F.col("__new"))
    existing = fps.filter(~F.col("__new"))

    probe = batch
    if corpus_fp_bloom is not None:
        probe = apply_bloom_prefilter(
            probe, corpus_fp_bloom, F.col("__fp"), bloom_bits, bloom_hashes
        )
    # the probe is asymmetric (micro-batch vs corpus): broadcast the
    # batch's distinct fingerprints and stream the corpus side map-side —
    # the corpus never shuffles for the exact-dup check. The intersection
    # is batch-bounded, so the final semi-join back to the batch is tiny.
    existing_fps = (
        corpus_fps.select("__fp") if corpus_fps is not None
        else existing.select("__fp")
    )
    batch_fp_set = probe.select("__fp").distinct()
    hit_fps = existing_fps.join(
        F.broadcast(batch_fp_set), on="__fp", how="semi"
    ).distinct()
    vs_corpus = probe.join(hit_fps, on="__fp", how="semi").select(id_col)
    batch_canon = batch.groupBy("__fp").agg(F.min(id_col).alias("__keep"))
    in_batch_dupes = (
        batch.join(batch_canon, on="__fp")
        .filter(F.col(id_col) != F.col("__keep"))
        .select(id_col)
    )

    new_flags = fps.select(F.col(id_col), F.col("__new"))
    pa = verified_pairs.join(
        new_flags.withColumnRenamed(id_col, "doc_a").withColumnRenamed(
            "__new", "__new_a"
        ),
        on="doc_a",
    ).join(
        new_flags.withColumnRenamed(id_col, "doc_b").withColumnRenamed(
            "__new", "__new_b"
        ),
        on="doc_b",
    )
    cross = pa.filter(F.col("__new_a") != F.col("__new_b"))
    near_removed = cross.select(
        F.when(F.col("__new_a"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias(id_col)
    )

    removed = vs_corpus.unionByName(in_batch_dupes).unionByName(near_removed)
    if within_batch_near:
        # min-label propagation, not star contraction: near-dup components
        # are shallow near-cliques (2-4 hops), where O(diameter) rounds
        # beats star's fixed O(log² n) round overhead; deep-chain graphs
        # would swap in connected_components_star (same contract)
        from backend_big_data_spark.operators.graph import connected_components

        both_new = pa.filter(F.col("__new_a") & F.col("__new_b")).select(
            "doc_a", "doc_b"
        )
        labels = connected_components(both_new, src="doc_a", dst="doc_b")
        batch_near_losers = labels.filter(
            F.col("node") != F.col("component")
        ).select(F.col("node").alias(id_col))
        removed = removed.unionByName(batch_near_losers)
    return (
        base.filter(F.col("__new"))
        .join(removed.distinct(), on=id_col, how="anti")
        .select(id_col)
    )


# --------------------------------------------------------------------------
# Train/eval decontamination: per-doc shingle containment vs an index
# --------------------------------------------------------------------------
def _bloom_positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """Bit positions for a key: Kirsch-Mitzenmacher double hashing over ONE
    xxhash64 — pos_s = h1 + s·h2 (h2 forced odd, so with power-of-two
    ``num_bits`` every stride hits all residues). One hash evaluation per
    row regardless of ``num_hashes``; builder and prober share this exactly."""
    h = F.xxhash64(col)
    h1 = F.pmod(h, F.lit(num_bits))
    h2 = F.shiftright(h, 33).bitwiseOR(F.lit(1))
    return [
        F.pmod(h1 + F.lit(s) * F.pmod(h2, F.lit(num_bits)), F.lit(num_bits))
        for s in range(num_hashes)
    ]


def build_shingle_bloom(
    index_shingles: DataFrame,
    shingle_col: str = "shingle",
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> list[int]:
    """Build a Bloom bitmap over the index shingles, returned as a dense
    ``num_bits/64``-long word list (bit ``p`` lives in word ``p // 64`` at
    position ``p % 64``).

    Built distributively: each shingle sets ``num_hashes`` bit positions;
    one groupBy on the 64-bit word index + ``bit_or`` folds them into
    ≤ ``num_bits/64`` rows, which is the ONLY driver transfer (bounded by
    the bitmap size, not the data — KB-scale, like a quantizer). No
    pre-distinct: ``bit_or`` is idempotent and partial aggregation
    collapses repeats map-side, so the shuffle carries at most one row per
    word. Spark's own ``DataFrameStatFunctions.bloomFilter`` ends at a
    driver-side JVM object that can't be used inside a plan; this word
    list rides back in as a one-row broadcast (see
    :func:`apply_bloom_prefilter`) probed by pure column expressions —
    embedding it as a 32 KB string/array LITERAL instead knocks the filter
    out of whole-stage codegen (measured 3×: Java's 64 KB constant limits).
    """
    pos = _bloom_positions(F.col(shingle_col), num_bits, num_hashes)
    rows = (
        index_shingles.select(F.explode(F.array(*pos)).alias("p"))
        .groupBy((F.col("p") / 64).cast("long").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT)))"
            ).alias("bits")
        )
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def merge_blooms(a: list[int], b: list[int]) -> list[int]:
    """Union two same-shape Bloom bitmaps (elementwise OR) — the
    incremental-ingest maintenance op: the at-rest index bitmap absorbs
    each admitted batch's bitmap without rescanning the corpus, and
    ``bloom(index ∪ batch) == merge(bloom(index), bloom(batch))`` exactly
    (bit positions are a pure function of the key). Driver-side on KB-scale
    arrays; at 100 TB this is the metadata commit, not a data job."""
    if len(a) != len(b):
        raise ValueError(
            f"bloom shapes differ ({len(a)} vs {len(b)} words) — bitmaps "
            f"must share (num_bits, num_hashes) to be mergeable"
        )
    return [x | y for x, y in zip(a, b)]


def bloom_might_contain(
    words_col: Column,
    key_col: Column,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> Column:
    """Membership probe against :func:`build_shingle_bloom`'s word array —
    all ``num_hashes`` probed bits must be set (``element_at`` +
    ``getbit``, fully codegen'd). No false negatives by construction;
    false positives only cost a wasted row in the downstream exact join."""
    test = F.lit(True)
    for p in _bloom_positions(key_col, num_bits, num_hashes):
        word = F.element_at(words_col, (p / 64).cast("int") + 1)
        test = test & (
            F.call_function("getbit", word, F.pmod(p, F.lit(64)).cast("int"))
            == 1
        )
    return test


def apply_bloom_prefilter(
    df: DataFrame,
    words: list[int],
    key_col: Column,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """Pre-drop rows whose key is definitely not in the Bloom set. The
    bitmap rides as a ONE-ROW broadcast joined to every probe row (a 1:1
    BroadcastNestedLoopJoin — no expansion, no shuffle), keeping the probe
    expressions inside codegen and the filter ahead of any exchange."""
    bmdf = df.sparkSession.createDataFrame([(words,)], "___bloom array<bigint>")
    return (
        df.crossJoin(F.broadcast(bmdf))
        .filter(
            bloom_might_contain(F.col("___bloom"), key_col, num_bits, num_hashes)
        )
        .drop("___bloom")
    )


def containment_vs_index(
    target_shingles: DataFrame,
    index_shingles: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "shingle",
    bloom_bits: int | None = None,
    bloom_hashes: int = 3,
) -> DataFrame:
    """Per-document n-gram containment against a reference index — the
    decontamination primitive: what fraction of each target (eval) doc's
    shingle rows also occur anywhere in the index (train) set. A ratio
    near 1 flags an eval doc leaked into training data.

    Inputs are EXPLODED (id, shingle) rows for the targets and any frame
    with a ``shingle_col`` for the index (deduplicated here). Counts are
    multiplicity-weighted: if the exploded target input carries repeated
    (id, shingle) rows, each row counts toward both ``n_shingles`` and
    ``n_contaminated`` (feed ``dropDuplicates([id, shingle])`` rows for
    distinct-shingle semantics). Output: (id, n_shingles, n_contaminated,
    contamination ∈ [0, 1]).

    Scale: one semi-join keyed on the shingle — the inverted-index shape;
    the index side never materializes pairs. ``bloom_bits`` enables the
    100 TB add-on: a Bloom bitmap built over the index shingles pre-drops
    definite misses AT THE SCAN, before the semi-join exchange — only
    possible hits shuffle. Result-identical with or without (no false
    negatives; false positives are re-checked by the join itself).
    """
    tot = target_shingles.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    probes = target_shingles
    if bloom_bits is not None:
        words = build_shingle_bloom(
            index_shingles, shingle_col, bloom_bits, bloom_hashes
        )
        probes = apply_bloom_prefilter(
            probes, words, F.col(shingle_col), bloom_bits, bloom_hashes
        )
    hit = (
        probes.join(
            index_shingles.select(shingle_col).distinct(), shingle_col, "semi"
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return tot.join(hit, id_col, "left").select(
        id_col,
        "n_shingles",
        n_cont.alias("n_contaminated"),
        F.round(n_cont / F.col("n_shingles"), 6).alias("contamination"),
    )


def jaccard_vs_query(
    shingled: DataFrame,
    query_shingled: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Serving-side near-dup LOOKUP: top-k corpus documents by exact
    shingle Jaccard against ONE query document — the point-query twin of
    the corpus-wide pair jobs above ("show me documents like this one",
    the triage view over any dedup/contamination hit).

    ``query_shingled`` is a one-row ``(shingles array)`` frame; its
    distinct shingles broadcast, so the corpus side is one semi-ish
    broadcast join + a per-doc count — no self-join, no shuffle beyond
    the doc-keyed aggregate. Output: (id, intersection_size, jaccard
    [6dp], rnk), ranked by raw Jaccard with id tie-break.
    """
    from pyspark.sql import Window

    qs = query_shingled.select(
        F.explode("shingles").alias("shingle")
    ).distinct()
    nq = qs.agg(F.count("*").alias("__nq"))
    e = shingled.select(
        F.col(id_col),
        F.size("shingles").alias("__ca"),
        F.explode("shingles").alias("shingle"),
    )
    inter = (
        e.join(F.broadcast(qs), on="shingle")
        .groupBy(id_col, "__ca")
        .agg(F.count("*").alias("intersection_size"))
    )
    j = F.col("intersection_size") / (
        F.col("__ca") + F.col("__nq") - F.col("intersection_size")
    )
    top = (
        inter.crossJoin(F.broadcast(nq))
        .withColumn("__j", j)
        .orderBy(F.desc("__j"), id_col)
        .limit(k)
    )
    w = Window.orderBy(F.desc("__j"), id_col)  # bounded: k rows
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .select(
            id_col,
            "intersection_size",
            F.round("__j", 6).alias("jaccard"),
            "rnk",
        )
    )
