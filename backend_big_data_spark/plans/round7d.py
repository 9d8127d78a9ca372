"""Round-7 additions III: community detection over the supply graph.

Completes the graph-operator family as first-class registry rows:
connected components answer reachability (dedup clustering), PageRank
answers centrality (corpus quality prior), label propagation answers
COMMUNITY structure — the standard link-graph curation prior for
grouping sources/domains before mixture balancing. The reference engine
(CiccioRomeo/backend-big-data) has no iterative graph operator; this row
belongs to the additive training-data-pipeline capability set.

Determinism/oracle strategy: the published LPA is randomized (random
update order, random tie-break); `operators/graph.py::label_propagation`
pins the engine-portable contract — synchronous rounds, integer vote
weights, (weight DESC, label ASC) argmax, FIXED iteration count — so a
k-step MATERIALIZED CTE chain (the `round7c._pagerank_oracle` device)
replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

_LPA_ITERS = 4


def _lpa_oracle(k: int = _LPA_ITERS) -> str:
    """Replay of `operators/graph.py::label_propagation` on the supply
    graph as a k-step MATERIALIZED CTE chain. Vote sums are BIGINT
    (exact); the per-node argmax is `row_number() OVER (ORDER BY v DESC,
    label)` — the same (−weight, label) ordering as the Spark side's
    ``min_by`` struct."""
    parts = [
        """WITH raw AS MATERIALIZED (
  SELECT 'c' || o_custkey AS x, 's' || l_suppkey AS y,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1, 2
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


def _uni_ctes(rounds: int, maxl: int = _UNI_MAXL, v: int = _UNI_V) -> str:
    """WITH-prefix replaying `text/unigram.py::hard_em` through
    ``cost{rounds}``: the corpus word table, the occurrence-weighted
    substring seed (all singles + top-``v`` multis under the
    (count DESC, piece ASC) order), milli-nat fixed-point costs, then
    ``rounds`` Viterbi-EM rounds. ``ln`` is the single cross-engine
    double (≤1-ulp wobble vs a 1e-3 quantization grid — the FPGrowth
    minSupport contract); every comparison downstream is BIGINT."""
    parts = [
        r"""WITH RECURSIVE toks AS MATERIALIZED (
  SELECT string_split_regex(trim(text), '\s+') AS t FROM documents),
wc AS MATERIALIZED (
  SELECT u.w AS word, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks, LATERAL unnest(t) AS u(w) WHERE u.w <> '' GROUP BY 1),
subs AS MATERIALIZED (
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


@register("supplier_communities", oracle=_lpa_oracle())
def supplier_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the weighted supply graph: customer—
    supplier edges weighted by purchase count (orders ⋈ lineitem,
    count per pair) plus unit-weight supplier—nation location edges,
    undirected. Four synchronous label-propagation rounds
    (`operators/graph.py::label_propagation` — deterministic
    (weight DESC, label ASC) argmax, one keyed shuffle per round).
    Output: every node with its community label, ordered by node."""
    from backend_big_data_spark.operators.graph import label_propagation

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
    )
    located = sup.select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
        F.lit(1).cast("long").alias("w"),
    )
    edges = purchases.unionByName(located)
    return label_propagation(edges, weight="w", iterations=_LPA_ITERS).orderBy(
        "node"
    )
