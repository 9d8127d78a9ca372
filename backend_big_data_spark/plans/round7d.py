"""Round-7 additions III: communities, the unigram tokenizer, and
maintained-index ANN serving.

Five registry families, all additive training-data-pipeline capability
(the reference engine, CiccioRomeo/backend-big-data, has none of them):

- `supplier_communities` — label propagation over the repeat-purchase
  supply graph, completing the graph family (CC = reachability,
  PageRank = centrality, LPA = community structure — the link-graph
  curation prior for grouping sources before mixture balancing);
- `community_modularity` — the LPA labels' quality gate (Newman
  weighted modularity per community in exact BIGINT fixed point);
- `doc_unigram_vocab` / `doc_unigram_token_stats` — the unigram-LM
  tokenizer (`text/unigram.py`), completing the tokenizer family next
  to BPE;
- `tokenizer_fertility_eval` — BPE vs unigram head-to-head on the same
  corpus (the ship-decision readout);
- `ann_ivf_maintained_topk` — IVF serving over STORED inverted lists
  (`similarity/ivf_serve.py`), the ANN member of the maintained-index
  family.

Determinism/oracle strategy: the published LPA is randomized (random
update order, random tie-break); `operators/graph.py::label_propagation`
pins the engine-portable contract — synchronous rounds, integer vote
weights, (weight DESC, label ASC) argmax, FIXED iteration count — so a
k-step MATERIALIZED CTE chain (the `round7c._pagerank_oracle` device)
replays it exactly. The unigram chain replays its Viterbi DP with
recursive list-growing CTEs (depth = max word length) and quantizes
costs to BIGINT milli-nats so every comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

_LPA_ITERS = 4
#: repeat-purchase threshold: the raw TPC-H customer×supplier incidence
#: graph is near-complete bipartite noise (every customer touches most
#: suppliers once) and LPA correctly collapses it to ~2 giant blobs;
#: keeping only repeat-purchase edges (w ≥ 3) leaves the actual affinity
#: structure (~194 communities at sf0.01) — the standard sparsification
#: before community detection on co-occurrence graphs.
_LPA_MIN_W = 3


def _lpa_oracle(k: int = _LPA_ITERS) -> str:
    """Replay of `operators/graph.py::label_propagation` on the supply
    graph as a k-step MATERIALIZED CTE chain. Vote sums are BIGINT
    (exact); the per-node argmax is `row_number() OVER (ORDER BY v DESC,
    label)` — the same (−weight, label) ordering as the Spark side's
    ``min_by`` struct."""
    parts = [
        f"""WITH raw AS MATERIALIZED (
  SELECT 'c' || o_custkey AS x, 's' || l_suppkey AS y,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1, 2
  HAVING COUNT(*) >= {_LPA_MIN_W}
  UNION ALL
  SELECT 's' || s_suppkey, 'n' || s_nationkey, CAST(1 AS BIGINT)
  FROM supplier
),
und AS MATERIALIZED (
  SELECT least(x, y) AS a, greatest(x, y) AS b, CAST(SUM(w) AS BIGINT) AS w
  FROM raw WHERE x <> y GROUP BY 1, 2
),
sym AS MATERIALIZED (
  SELECT a, b, w FROM und UNION ALL SELECT b, a, w FROM und
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM sym)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
v{i} AS MATERIALIZED (
  SELECT s.a, l.label, CAST(SUM(s.w) AS BIGINT) AS v
  FROM sym s JOIN l{i - 1} l ON s.b = l.node GROUP BY 1, 2
),
l{i} AS MATERIALIZED (
  SELECT a AS node, label FROM (
    SELECT a, label,
           row_number() OVER (PARTITION BY a ORDER BY v DESC, label) AS rn
    FROM v{i}
  ) WHERE rn = 1
)"""
        )
    return "".join(parts) + f"\nSELECT node, label AS community FROM l{k} ORDER BY node"


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (Viterbi segmentation + hard-EM) over documents
# ---------------------------------------------------------------------------

_UNI_MAXL = 4
_UNI_V = 24
_UNI_ROUNDS = 2

_UNI_BUCKET = (
    "CASE WHEN len(word) <= 3 THEN '1-3' WHEN len(word) <= 6 THEN '4-6' "
    "WHEN len(word) <= 9 THEN '7-9' ELSE '10+' END"
)


def _uni_round(r: int, maxl: int, v: int) -> str:
    """One Viterbi-EM round as CTEs: candidates against cost{r-1}, the
    DP as a RECURSIVE list-growing pass (row i holds best[0..i]; depth =
    word length), the per-(word, end) argmin choice, the backtrack as a
    second recursion walking choice pointers, then usage counts → pruned
    vocab → cost{r}. Recursive CTEs stay un-MATERIALIZED (not allowed);
    everything referenced twice is MATERIALIZED."""
    return f""",
cand{r} AS MATERIALIZED (
  SELECT w.word, w.n, s.s AS s, s.s + l.l AS e,
         substr(w.word, s.s + 1, l.l) AS p, c.cost
  FROM wc w, LATERAL unnest(range(0, len(w.word))) AS s(s),
       LATERAL unnest(range(1, least({maxl}, len(w.word) - s.s) + 1)) AS l(l),
       cost{r - 1} c
  WHERE c.piece = substr(w.word, s.s + 1, l.l)),
cl{r} AS MATERIALIZED (
  SELECT word, e, list(struct_pack(s := s, cost := cost)) AS cl
  FROM cand{r} GROUP BY 1, 2),
dp{r} AS (
  SELECT word, 0 AS i, [CAST(0 AS BIGINT)] AS bl FROM wc
  UNION ALL
  SELECT d.word, d.i + 1,
         list_append(d.bl, CAST(list_min(
           list_transform(c.cl, x -> d.bl[x.s + 1] + x.cost)) AS BIGINT))
  FROM dp{r} d JOIN cl{r} c ON c.word = d.word AND c.e = d.i + 1),
dpf{r} AS MATERIALIZED (
  SELECT d.word, d.bl FROM dp{r} d
  JOIN wc w ON w.word = d.word AND d.i = len(w.word)),
choice{r} AS MATERIALIZED (
  SELECT word, e, s, p FROM (
    SELECT ca.word, ca.e, ca.s, ca.p,
           row_number() OVER (PARTITION BY ca.word, ca.e
             ORDER BY f.bl[ca.s + 1] + ca.cost, ca.s, ca.p) AS rn
    FROM cand{r} ca JOIN dpf{r} f ON f.word = ca.word)
  WHERE rn = 1),
seg{r} AS (
  SELECT w.word, w.n, len(w.word) AS pos, CAST(NULL AS VARCHAR) AS piece
  FROM wc w
  UNION ALL
  SELECT s.word, s.n, ch.s, ch.p
  FROM seg{r} s JOIN choice{r} ch ON ch.word = s.word AND ch.e = s.pos
  WHERE s.pos > 0),
used{r} AS MATERIALIZED (
  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt FROM seg{r}
  WHERE piece IS NOT NULL GROUP BY 1),
voc{r} AS MATERIALIZED (
  SELECT s.piece, CAST(greatest(COALESCE(u.cnt, 0), 1) AS BIGINT) AS cnt
  FROM singles s LEFT JOIN used{r} u ON u.piece = s.piece
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM used{r} WHERE len(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {v})),
cost{r} AS MATERIALIZED (
  SELECT piece, cnt,
         CAST(floor(-1000.0 * ln(CAST(cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)))
              AS BIGINT) AS cost
  FROM voc{r}, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM voc{r}) t)"""


_UNI_CORPUS = r"""WITH RECURSIVE toks AS MATERIALIZED (
  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
wc AS MATERIALIZED (
  SELECT u.w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks, LATERAL unnest(t) AS u(w) WHERE u.w <> '' GROUP BY 1),
"""


def _uni_ctes(
    rounds: int,
    maxl: int = _UNI_MAXL,
    v: int = _UNI_V,
    include_corpus: bool = True,
) -> str:
    """WITH-prefix replaying `text/unigram.py::hard_em` through
    ``cost{rounds}``: the corpus word table, the occurrence-weighted
    substring seed (all singles + top-``v`` multis under the
    (count DESC, piece ASC) order), milli-nat fixed-point costs, then
    ``rounds`` Viterbi-EM rounds. ``ln`` is the single cross-engine
    double (≤1-ulp wobble vs a 1e-3 quantization grid — the FPGrowth
    minSupport contract); every comparison downstream is BIGINT.
    ``include_corpus=False`` drops the ``WITH RECURSIVE toks/wc``
    prelude for splicing into a composite oracle that already defines
    them (`_fertility_oracle`)."""
    parts = [
        (_UNI_CORPUS if include_corpus else "")
        + r"""subs AS MATERIALIZED (
  SELECT substr(w.word, s.s + 1, l.l) AS piece, CAST(SUM(w.n) AS BIGINT) AS cnt"""
        + f"""
  FROM wc w, LATERAL unnest(range(0, len(w.word))) AS s(s),
       LATERAL unnest(range(1, least({maxl}, len(w.word) - s.s) + 1)) AS l(l)
  GROUP BY 1),
singles AS MATERIALIZED (SELECT piece FROM subs WHERE len(piece) = 1),
voc0 AS MATERIALIZED (
  SELECT piece, cnt FROM subs WHERE len(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt FROM subs WHERE len(piece) > 1
    ORDER BY cnt DESC, piece LIMIT {v})),
cost0 AS MATERIALIZED (
  SELECT piece, cnt,
         CAST(floor(-1000.0 * ln(CAST(cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)))
              AS BIGINT) AS cost
  FROM voc0, (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM voc0) t)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(_uni_round(r, maxl, v))
    return "".join(parts)


def _uni_vocab_oracle() -> str:
    return (
        _uni_ctes(_UNI_ROUNDS)
        + f"\nSELECT piece, cnt AS freq, cost AS cost_mn FROM cost{_UNI_ROUNDS}"
        " ORDER BY freq DESC, piece"
    )


def _uni_stats_oracle() -> str:
    """One more Viterbi pass (round ``rounds+1``'s cand/dp/seg chain)
    under the final costs IS the corpus encoding; tokens per word =
    its piece-row count, per-word total cost = the DP table's last
    entry — both exact BIGINTs, aggregated occurrence-weighted."""
    enc_r = _UNI_ROUNDS + 1
    return (
        _uni_ctes(_UNI_ROUNDS)
        + _uni_round(enc_r, _UNI_MAXL, _UNI_V)
        + f""",
enc AS MATERIALIZED (
  SELECT word, n, CAST(COUNT(piece) AS BIGINT) AS toks
  FROM seg{enc_r} WHERE piece IS NOT NULL GROUP BY 1, 2)
SELECT {_UNI_BUCKET} AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS distinct_words,
       CAST(SUM(n) AS BIGINT) AS occurrences,
       CAST(SUM(len(word) * n) AS BIGINT) AS chars,
       CAST(SUM(toks * n) AS BIGINT) AS unigram_tokens,
       CAST(SUM(f.bl[len(word) + 1] * n) AS BIGINT) AS cost_mn
FROM enc JOIN dpf{enc_r} f USING (word)
GROUP BY 1 ORDER BY 1"""
    )


def _uni_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n) frequency table — the one corpus scan (same tokenizer
    contract as `round7b._word_counts`: whitespace tokens of trimmed
    text, empties dropped)."""
    from backend_big_data_spark.functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register("doc_unigram_vocab", oracle=_uni_vocab_oracle())
def doc_unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, unigram-LM side: learn a unigram vocabulary
    from the document corpus (`text/unigram.py::hard_em` — substring
    seed, milli-nat fixed-point costs, two Viterbi-EM rounds; one corpus
    scan, everything after on the vocabulary table). Output: the final
    vocabulary (piece, freq, cost_mn), frequency-descending."""
    from backend_big_data_spark.text.unigram import hard_em

    vocab = hard_em(
        _uni_word_counts(spark, sf_dir),
        max_piece_len=_UNI_MAXL,
        vocab_size=_UNI_V,
        rounds=_UNI_ROUNDS,
    )
    return vocab.select(
        "piece", F.col("cnt").alias("freq"), F.col("cost").alias("cost_mn")
    ).orderBy(F.desc("freq"), "piece")


@register("doc_unigram_token_stats", oracle=_uni_stats_oracle())
def doc_unigram_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application, unigram-LM side: encode the corpus with
    the learned unigram vocabulary (`text/unigram.py::viterbi_segment`
    over the DISTINCT-word table, occurrence weights rejoined — the
    corpus is never re-segmented per occurrence) and report compression
    by word-length bucket: occurrence-weighted characters, tokens, and
    total Viterbi cost in milli-nats (the cost column certifies the DP
    values themselves, not just the segmentation shapes)."""
    from backend_big_data_spark.text.unigram import hard_em, viterbi_segment

    wc = _uni_word_counts(spark, sf_dir)
    vocab = hard_em(
        wc, max_piece_len=_UNI_MAXL, vocab_size=_UNI_V, rounds=_UNI_ROUNDS
    )
    seg = viterbi_segment(wc, vocab, max_piece_len=_UNI_MAXL)
    bucket = (
        F.when(F.length("word") <= 3, "1-3")
        .when(F.length("word") <= 6, "4-6")
        .when(F.length("word") <= 9, "7-9")
        .otherwise("10+")
    )
    return (
        seg.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count("*").alias("distinct_words"),
            F.sum("n").alias("occurrences"),
            F.sum(F.length("word").cast("long") * F.col("n")).alias("chars"),
            F.sum(F.size("pieces").cast("long") * F.col("n")).alias(
                "unigram_tokens"
            ),
            F.sum(F.col("total_cost") * F.col("n")).alias("cost_mn"),
        )
        .orderBy("len_bucket")
    )


# ---------------------------------------------------------------------------
# Maintained-index IVF serving (the ANN member of the incremental family)
# ---------------------------------------------------------------------------


def _ivf_maintained_oracle() -> str:
    """The scratch IVF oracle VERBATIM (`plans/extended.py::ann_ivf_topk`):
    the maintained path is a result-invariant re-blocking — assignment at
    admission instead of query time — so the same SQL certifies it. The
    module import guarantees the source oracle is registered first."""
    from backend_big_data_spark.plans import extended  # noqa: F401
    from backend_big_data_spark.plans.registry import ORACLES

    return ORACLES["ann_ivf_topk"]


@register("ann_ivf_maintained_topk", oracle=_ivf_maintained_oracle())
def ann_ivf_maintained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN through the MAINTAINED-index path
    (`similarity/ivf_serve.py`): inverted lists are assigned once at
    admission (`assign_lists` — the column the streaming embedding sink
    stores as ``cluster``) and the query path probes the stored ids with
    one broadcast join; the corpus is never re-scored against the coarse
    quantizer. Same fixed deterministic quantizer, same output contract,
    same oracle as `ann_ivf_topk` — the gate certifies the re-blocking
    is result-invariant."""
    from backend_big_data_spark.similarity.ivf_serve import (
        assign_lists,
        ivf_maintained_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cvec = F.col("embedding").cast("array<double>")
    fixed = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"), cvec.alias("centroid")
    )
    assigned = assign_lists(emb, fixed)
    return ivf_maintained_topk(
        assigned, emb.filter(F.col("vec_id") < 10), fixed, k=5, nprobe=3
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility eval: BPE vs unigram head-to-head
# ---------------------------------------------------------------------------


def _fertility_oracle() -> str:
    """Composite oracle: the BPE k-step merge chain and the unigram
    EM + encode chain spliced under ONE shared toks/wc corpus prelude
    (CTE names are disjoint apart from toks/wc by construction), joined
    word-for-word. The fertility ratios are BIGINT floor divisions of
    exact token sums — the eval-harness discipline: both tokenizers'
    oracles certify their encodings, this one certifies the COMPARISON."""
    from backend_big_data_spark.plans.round7b import _BPE_MERGES, _bpe_ctes

    enc_r = _UNI_ROUNDS + 1
    return (
        _UNI_CORPUS
        + _bpe_ctes(_BPE_MERGES, include_corpus=False)
        + ",\n"
        + _uni_ctes(_UNI_ROUNDS, include_corpus=False)
        + _uni_round(enc_r, _UNI_MAXL, _UNI_V)
        + f""",
bpe_enc AS MATERIALIZED (
  SELECT replace(st, chr(31), '') AS word,
         (len(st) - len(replace(st, chr(31), ''))) // 2 AS toks, n
  FROM it{_BPE_MERGES}),
uni_enc AS MATERIALIZED (
  SELECT word, CAST(COUNT(piece) AS BIGINT) AS toks
  FROM seg{enc_r} WHERE piece IS NOT NULL GROUP BY 1),
j AS MATERIALIZED (
  SELECT b.word, b.n, b.toks AS bpe_toks, u.toks AS uni_toks
  FROM bpe_enc b JOIN uni_enc u USING (word))
SELECT {_UNI_BUCKET} AS len_bucket,
       CAST(SUM(n) AS BIGINT) AS occurrences,
       CAST(SUM(len(word) * n) AS BIGINT) AS chars,
       CAST(SUM(bpe_toks * n) AS BIGINT) AS bpe_tokens,
       CAST(SUM(uni_toks * n) AS BIGINT) AS unigram_tokens,
       CAST((SUM(len(word) * n) * 1000) // SUM(bpe_toks * n) AS BIGINT)
         AS bpe_chars_per_tok_mil,
       CAST((SUM(len(word) * n) * 1000) // SUM(uni_toks * n) AS BIGINT)
         AS uni_chars_per_tok_mil
FROM j GROUP BY 1 ORDER BY 1"""
    )


@register("tokenizer_fertility_eval", oracle=_fertility_oracle())
def tokenizer_fertility_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval harness for the tokenizer family: train BOTH tokenizers on
    the same corpus (BPE 12 merges, unigram 2 EM rounds), encode the
    vocabulary with each, and compare fertility (chars per token,
    milli-units, BIGINT floor division) by word-length bucket — the
    readout that decides which tokenizer a pipeline should ship. Every
    term is an exact integer; the oracle replays both training chains
    end-to-end, so a regression in EITHER tokenizer hash-fails this
    row as well as its own."""
    from backend_big_data_spark.text.bpe import apply_bpe, learn_bpe
    from backend_big_data_spark.text.unigram import hard_em, viterbi_segment

    wc = pin_single_evaluation(_uni_word_counts(spark, sf_dir))
    merges = [
        (r.left_sym, r.right_sym)
        for r in learn_bpe(wc, num_merges=12).orderBy("step").collect()
    ]
    bpe = apply_bpe(wc, merges).select(
        "word", "n", F.size("syms").cast("long").alias("bpe_toks")
    )
    vocab = hard_em(
        wc, max_piece_len=_UNI_MAXL, vocab_size=_UNI_V, rounds=_UNI_ROUNDS
    )
    uni = viterbi_segment(wc, vocab, max_piece_len=_UNI_MAXL).select(
        "word", F.size("pieces").cast("long").alias("uni_toks")
    )
    j = bpe.join(uni, "word")
    bucket = (
        F.when(F.length("word") <= 3, "1-3")
        .when(F.length("word") <= 6, "4-6")
        .when(F.length("word") <= 9, "7-9")
        .otherwise("10+")
    )
    return (
        j.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.sum("n").alias("occurrences"),
            F.sum(F.length("word").cast("long") * F.col("n")).alias("chars"),
            F.sum(F.col("bpe_toks") * F.col("n")).alias("bpe_tokens"),
            F.sum(F.col("uni_toks") * F.col("n")).alias("unigram_tokens"),
        )
        .select(
            "len_bucket",
            "occurrences",
            "chars",
            "bpe_tokens",
            "unigram_tokens",
            F.expr("chars * 1000L div bpe_tokens").alias("bpe_chars_per_tok_mil"),
            F.expr("chars * 1000L div unigram_tokens").alias(
                "uni_chars_per_tok_mil"
            ),
        )
        .orderBy("len_bucket")
    )


# ---------------------------------------------------------------------------
# Community modularity: the quality gate for the LPA labels
# ---------------------------------------------------------------------------

_MOD_SCALE = 1_000_000_000


def _modularity_oracle(k: int = _LPA_ITERS, scale: int = _MOD_SCALE) -> str:
    """Extends the LPA replay chain with Newman weighted modularity in
    fixed point: per community c, ``contrib_fp = (scale·in_c) // m −
    ((scale·tot_c) // (2m) · tot_c) // (2m)`` — every step BIGINT floor
    division in the SAME nesting order both engines, so the replay is
    exact. (Bound: scale·m must fit in BIGINT — fine through m ≈ 9·10⁹;
    a production run at larger total weight would widen to DECIMAL(38).)"""
    lpa = _lpa_oracle(k)
    chain = lpa[: lpa.rindex("\nSELECT")]
    return (
        chain
        + f""",
deg AS MATERIALIZED (
  SELECT a AS node, CAST(SUM(w) AS BIGINT) AS deg FROM sym GROUP BY 1),
mm AS MATERIALIZED (SELECT CAST(SUM(w) AS BIGINT) AS m FROM und),
inw AS MATERIALIZED (
  SELECT la.label AS community, CAST(SUM(u.w) AS BIGINT) AS in_w
  FROM und u
  JOIN l{k} la ON la.node = u.a
  JOIN l{k} lb ON lb.node = u.b AND lb.label = la.label
  GROUP BY 1),
comm AS MATERIALIZED (
  SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
  FROM l{k} GROUP BY 1),
tot AS MATERIALIZED (
  SELECT la.label AS community, CAST(SUM(d.deg) AS BIGINT) AS tot_deg
  FROM l{k} la JOIN deg d ON d.node = la.node GROUP BY 1)
SELECT c.community AS community, c.n_nodes,
       CAST(COALESCE(i.in_w, 0) AS BIGINT) AS internal_w, t.tot_deg,
       CAST(({scale} * COALESCE(i.in_w, 0)) // mm.m
            - (({scale} * t.tot_deg) // (2 * mm.m) * t.tot_deg) // (2 * mm.m)
            AS BIGINT) AS contrib_fp
FROM comm c
JOIN tot t ON t.community = c.community
LEFT JOIN inw i ON i.community = c.community
CROSS JOIN mm
ORDER BY c.community"""
    )


def _supply_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted supply graph both community queries share:
    repeat-purchase customer—supplier edges (purchase count ≥
    ``_LPA_MIN_W``) plus unit-weight supplier—nation location edges."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    purchases = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _LPA_MIN_W)
    )
    located = sup.select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
        F.lit(1).cast("long").alias("w"),
    )
    return purchases.unionByName(located)


@register("community_modularity", oracle=_modularity_oracle())
def community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate for the LPA communities (the eval-harness pattern:
    every algorithm ships with an oracle-checked readout of how good its
    output is): Newman weighted modularity per community over the same
    supply graph, in fixed point — (community, n_nodes, internal_w,
    tot_deg, contrib_fp) where ``sum(contrib_fp)/1e9`` is the graph's
    modularity Q. A community with negative contribution is worse than
    random — the signal to stop propagating or re-weight."""
    from backend_big_data_spark.operators.graph import label_propagation

    edges = _supply_graph(spark, sf_dir)
    labels = label_propagation(edges, weight="w", iterations=_LPA_ITERS)

    # identical normalization to the operator's internal one: undirected
    # (least, greatest), self-loops dropped, parallel edges summed
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    und = pin_single_evaluation(und)
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.sum("w").alias("deg"))
    m = und.agg(F.sum("w").alias("m"))

    la = labels.select(F.col("node").alias("a"), F.col("community").alias("ca"))
    lb = labels.select(F.col("node").alias("b"), F.col("community").alias("cb"))
    inw = (
        und.join(la, "a")
        .join(lb, "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.sum("w").alias("in_w"))
    )
    comm = labels.groupBy(F.col("community")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    tot = (
        labels.join(deg, "node")
        .groupBy("community")
        .agg(F.sum("deg").alias("tot_deg"))
    )
    s = F.lit(_MOD_SCALE).cast("long")
    return (
        comm.join(tot, "community")
        .join(inw, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            F.coalesce("in_w", F.lit(0)).cast("long").alias("internal_w"),
            "tot_deg",
            (
                F.expr(f"{_MOD_SCALE}L * coalesce(in_w, 0L) div m")
                - F.expr(
                    f"({_MOD_SCALE}L * tot_deg div (2L * m)) * tot_deg"
                    " div (2L * m)"
                )
            ).alias("contrib_fp"),
        )
        .orderBy("community")
    )


@register("supplier_communities", oracle=_lpa_oracle())
def supplier_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the weighted supply graph:
    repeat-purchase customer—supplier edges (purchase count ≥
    ``_LPA_MIN_W`` — see the threshold note above) plus unit-weight
    supplier—nation location edges, undirected. Four synchronous
    label-propagation rounds (`operators/graph.py::label_propagation` —
    deterministic (weight DESC, label ASC) argmax, one keyed shuffle per
    round). Output: every node with its community label, ordered by
    node."""
    from backend_big_data_spark.operators.graph import label_propagation

    edges = _supply_graph(spark, sf_dir)
    return label_propagation(edges, weight="w", iterations=_LPA_ITERS).orderBy(
        "node"
    )
