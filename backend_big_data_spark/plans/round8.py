"""Round-8 additions: set-similarity record linkage and Kneser-Ney LM.

Two new operator families plus the tokenizer trio's completion:

- `operators/setsimjoin.py` — prefix-filtered token-set joins (Jaccard
  symmetric + containment asymmetric): the whole-word complement of the
  round-7 edit-distance linkage. Thresholds are exact rationals, every
  comparison BIGINT cross-multiplication, so the evidence columns hash
  exactly against a brute-force DuckDB twin.
- `text/kneser_ney.py` — interpolated Kneser-Ney bigram model carried
  as exact BIGINT fractions (D = 3/4 makes every term rational); the
  scoring query quantizes per-bigram log-probs to the repo's
  fixed-point convention before order-independent integer sums.
- `text/bpe.py::learn_wordpiece` — WordPiece merge learning (BPE's
  skeleton, likelihood-gain selection), completing the BPE / unigram-LM
  / WordPiece tokenizer-training trio.

Reference scope note: the reference engine (CiccioRomeo/backend-big-data)
has none of these; they belong to the additive training-data-pipeline
capability set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# token-set similarity joins over part names
# ---------------------------------------------------------------------------

#: record string for the linkage queries: name + brand + type — the same
#: enrichment the fuzzy-join queries use (`round7c._entities`), because
#: the bare p_name column has only 64 distinct values (every match would
#: be an exact-duplicate name and the output would be all quadratic
#: duplicate mass). 1789 of 2000 records are distinct at sf0.01.
_REC = "p_name || ' ' || p_brand || ' ' || p_type"

#: DuckDB token-set expression matching `setsimjoin.ws_tokens`
_TOKS = (
    f"list_distinct(list_filter(string_split_regex({_REC}, '\\s+'),"
    " x -> x <> ''))"
)

#: Sizing-rule caps ARMED in the registered all-pairs linkage queries —
#: the production discipline demonstrated, not just documented: the exact
#: prefix candidate bound is computed BEFORE the join and the query
#: refuses (SetSimCandidateBlowup) rather than run quadratic. Values are
#: ~4× the measured sf0.1 bounds (Jaccard 52.1M, containment 16.0M — the
#: fixed-vocabulary synthetic corpus grows its bound ~quadratically in
#: sf), so every gate scale passes while the closed-vocabulary
#: adversarial corpus trips (tests/test_setsimjoin.py::
#: TestRegisteredCapsRefuseAdversarial).
JACCARD_CANDIDATE_CAP = 200_000_000
CONTAINMENT_CANDIDATE_CAP = 64_000_000

_JACCARD_ORACLE = f"""
WITH t AS (
  SELECT CAST(p_partkey AS BIGINT) AS id, {_TOKS} AS toks FROM part
), s AS (
  SELECT id, toks, len(toks) AS sz FROM t WHERE len(toks) > 0
)
SELECT a.id AS left_id, b.id AS right_id,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_cnt,
       CAST(a.sz + b.sz - len(list_intersect(a.toks, b.toks)) AS BIGINT)
         AS union_cnt
FROM s a JOIN s b
  ON a.id < b.id
 AND greatest(a.sz, b.sz) * 3 <= least(a.sz, b.sz) * 5
WHERE len(list_intersect(a.toks, b.toks)) * 5
      >= (a.sz + b.sz - len(list_intersect(a.toks, b.toks))) * 3
ORDER BY left_id, right_id
"""


@register("part_token_jaccard_match", oracle=_JACCARD_ORACLE)
def part_token_jaccard_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set record linkage: part records (name + brand + type)
    whose distinct-token Jaccard is ≥ 3/5
    (`operators/setsimjoin.token_jaccard_join` — global rarity-ordered
    prefix filter + length filter + exact ``array_intersect`` verify
    with integer cross-multiplied threshold; pair dedup after the
    verify). The oracle is the brute-force all-pairs twin with only the
    result-invariant length filter — the blocking must be
    result-invariant.

    Scale note: output size tracks the corpus' TRUE duplicate mass —
    on a fixed-vocabulary synthetic corpus that mass grows
    quadratically (every engine would emit the same pairs); production
    ER runs this as its candidate-pair stage and feeds a cluster/argmax
    winner step (`doc_corpus_dedup_best`'s shape) rather than
    materializing all pairs — and the registered form ARMS the sizing
    rule (`JACCARD_CANDIDATE_CAP`), so a corpus whose candidate bound
    leaves the gate regime refuses instead of running quadratic."""
    from backend_big_data_spark.operators.setsimjoin import token_jaccard_join

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("s"),
    )
    return (
        token_jaccard_join(
            part, part, t_num=3, t_den=5,
            candidate_cap=JACCARD_CANDIDATE_CAP,
        )
        .where(F.col("left_id") < F.col("right_id"))
        .orderBy("left_id", "right_id")
    )


_CONTAIN_ORACLE = f"""
WITH t AS (
  SELECT CAST(p_partkey AS BIGINT) AS id, {_TOKS} AS toks FROM part
), s AS (
  SELECT id, toks, len(toks) AS sz FROM t WHERE len(toks) > 0
)
SELECT a.id AS probe_id, b.id AS base_id,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_cnt,
       CAST(a.sz AS BIGINT) AS probe_sz
FROM s a JOIN s b ON a.id <> b.id
WHERE len(list_intersect(a.toks, b.toks)) * 5 >= a.sz * 4
ORDER BY probe_id, base_id
"""


@register("part_token_containment_match", oracle=_CONTAIN_ORACLE)
def part_token_containment_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment linkage: (probe, base) part pairs where
    ≥ 4/5 of the probe's distinct tokens appear in the base
    (`operators/setsimjoin.token_containment_join` — probe-side prefix
    filter only, base joins through its full token table; complete by
    pigeonhole). The "my record is mostly inside yours" direction that
    Jaccard's symmetric union denominator misses. The registered form
    ARMS the sizing rule (`CONTAINMENT_CANDIDATE_CAP`)."""
    from backend_big_data_spark.operators.setsimjoin import (
        token_containment_join,
    )

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("s"),
    )
    return (
        token_containment_join(
            part, part, t_num=4, t_den=5,
            candidate_cap=CONTAINMENT_CANDIDATE_CAP,
        )
        .where(F.col("probe_id") != F.col("base_id"))
        .orderBy("probe_id", "base_id")
    )


# ---------------------------------------------------------------------------
# WordPiece merge learning
# ---------------------------------------------------------------------------

_WP_MERGES = 8


def _wp_ctes(k: int = _WP_MERGES) -> str:
    """Shared WITH-prefix replaying `text/bpe.py::learn_wordpiece` as a
    k-step CTE chain — the BPE oracle's state encoding (chr(31)-wrapped
    symbols, merge = ``replace``; see `round7b._bpe_oracle`) plus
    per-step symbol totals ``u{i}`` so the argmax ranks by the
    fixed-point likelihood score
    floor(1000·(ln cnt − ln ucnt_l − ln ucnt_r) + 0.5) with the same
    (score DESC, l, r) tie-break. ``it{k}`` is the fully-merged
    vocabulary, reused by the stats oracle as the encoded corpus."""
    d = "chr(31)"
    dd = f"{d}||{d}"
    parts = [
        r"WITH toks AS MATERIALIZED (SELECT"
        r" string_split_regex(trim(text), '\s+') AS t"
        " FROM documents),",
        "wc AS MATERIALIZED (SELECT u.w AS word, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM toks, LATERAL unnest(t) AS u(w) WHERE u.w <> '' GROUP BY 1),",
        f"it0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', {d} || '\\1' || {d},"
        " 'g') AS st, n FROM wc)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
s{i} AS MATERIALIZED (SELECT st, n,
         string_split(substr(st, 2, len(st) - 2), {dd}) AS syms
         FROM it{i - 1}),
p{i} AS MATERIALIZED (SELECT syms[u.pos] AS l, syms[u.pos + 1] AS r,
         CAST(SUM(n) AS BIGINT) AS cnt
         FROM s{i}, LATERAL unnest(range(1, len(syms))) AS u(pos)
         GROUP BY 1, 2),
u{i} AS MATERIALIZED (SELECT syms[u.pos] AS sym, CAST(SUM(n) AS BIGINT) AS ucnt
         FROM s{i}, LATERAL unnest(range(1, len(syms) + 1)) AS u(pos)
         GROUP BY 1),
b{i} AS MATERIALIZED (SELECT p.l, p.r, p.cnt,
         CAST(floor((ln(p.cnt) - ln(ul.ucnt) - ln(ur.ucnt)) * 1000 + 0.5)
              AS BIGINT) AS score_fp
         FROM p{i} p
         JOIN u{i} ul ON ul.sym = p.l
         JOIN u{i} ur ON ur.sym = p.r
         ORDER BY score_fp DESC, p.l, p.r LIMIT 1),
it{i} AS MATERIALIZED (SELECT replace(st, {d}||b.l||{d}||{d}||b.r||{d},
                 {d}||b.l||b.r||{d}) AS st, n FROM it{i - 1}, b{i} b)"""
        )
    return "\n".join(parts)


def _wp_oracle(k: int = _WP_MERGES) -> str:
    steps = "\nUNION ALL\n".join(
        f"SELECT CAST({i - 1} AS INTEGER) AS step, l AS left_sym,"
        f" r AS right_sym, l || r AS merged, score_fp,"
        f" cnt AS pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return _wp_ctes(k) + f"\nSELECT * FROM (\n{steps}\n) ORDER BY step"


@register("doc_wordpiece_merges", oracle=_wp_oracle())
def doc_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, WordPiece selection rule: learn the first 8
    merges ranked by likelihood gain count(l,r)/(count(l)·count(r))
    (`text/bpe.py::learn_wordpiece`) — merging what co-occurs more than
    its parts predict, vs BPE's raw-count argmax. Completes the trained
    tokenizer trio (BPE / unigram-LM / WordPiece) over the same corpus
    scan. Output: (step, left_sym, right_sym, merged, score_fp,
    pair_count) in learning order."""
    from backend_big_data_spark.plans.round7b import _word_counts
    from backend_big_data_spark.text.bpe import learn_wordpiece

    wc = _word_counts(spark, sf_dir)
    return learn_wordpiece(wc, num_merges=_WP_MERGES).orderBy("step")


def _wp_stats_oracle(k: int = _WP_MERGES) -> str:
    """WordPiece tokenization-stats oracle: same delimiter-count
    reading of ``it{k}`` as `round7b._bpe_stats_oracle` (token count per
    word = half the delimiter count; stripping delimiters recovers the
    word), over the WordPiece merge chain. Assumes the corpus yields all
    k merges (holds at every gate sf — `doc_wordpiece_merges` returns
    exactly k rows)."""
    return _wp_ctes(k) + f""",
enc AS MATERIALIZED (SELECT replace(st, chr(31), '') AS word,
     (len(st) - len(replace(st, chr(31), ''))) // 2 AS toks, n
     FROM it{k})
SELECT CASE WHEN len(word) <= 3 THEN '1-3' WHEN len(word) <= 6 THEN '4-6'
            WHEN len(word) <= 9 THEN '7-9' ELSE '10+' END AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS distinct_words,
       CAST(SUM(n) AS BIGINT) AS occurrences,
       CAST(SUM(len(word) * n) AS BIGINT) AS chars,
       CAST(SUM(toks * n) AS BIGINT) AS wp_tokens
FROM enc GROUP BY 1 ORDER BY 1"""


@register("doc_wordpiece_token_stats", oracle=_wp_stats_oracle())
def doc_wordpiece_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece application: learn the 8-merge vocabulary, encode the
    corpus with it (`text/bpe.py::apply_bpe` — the merge-application
    fold is selection-rule-agnostic, so the BPE encoder applies the
    WordPiece merge list unchanged), and report compression by
    word-length bucket — the direct comparison row against
    `doc_bpe_token_stats` on the same corpus."""
    from backend_big_data_spark.plans.round7b import _word_counts
    from backend_big_data_spark.text.bpe import apply_bpe, learn_wordpiece

    wc = _word_counts(spark, sf_dir)
    merges = [
        (r.left_sym, r.right_sym)
        for r in learn_wordpiece(wc, num_merges=_WP_MERGES)
        .orderBy("step")
        .collect()
    ]
    enc = apply_bpe(wc, merges)
    bucket = (
        F.when(F.length("word") <= 3, "1-3")
        .when(F.length("word") <= 6, "4-6")
        .when(F.length("word") <= 9, "7-9")
        .otherwise("10+")
    )
    return (
        enc.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("distinct_words"),
            F.sum("n").alias("occurrences"),
            F.sum(F.length("word") * F.col("n")).alias("chars"),
            F.sum(F.size("syms") * F.col("n")).cast("long").alias("wp_tokens"),
        )
        .orderBy("len_bucket")
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram model + document scoring
# ---------------------------------------------------------------------------

#: shared CTE prefix: bigram occurrences and the exact-rational KN model
_KN_CTES = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{2,}') AS t
  FROM documents
), occ0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> {'w1': t[i], 'w2': t[i + 1]})) AS s
  FROM toks WHERE len(t) >= 2
), occ AS (
  SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM occ0
), c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM occ GROUP BY 1, 2
), c1 AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1plus_fw
  FROM c12 GROUP BY 1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_w2 FROM c12 GROUP BY 1
), ct AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS cont_total FROM c12
), model AS (
  SELECT c12.w1, c12.w2, c12.c12,
         CAST(greatest(4 * c12.c12 - 3, 0) * ct.cont_total
              + 3 * c1.n1plus_fw * cont.cont_w2 AS BIGINT) AS kn_num,
         CAST(4 * c1.c1 * ct.cont_total AS BIGINT) AS kn_den
  FROM c12 JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN ct
)"""

_KN_MODEL_ORACLE = (
    _KN_CTES
    + """
SELECT w1, w2, c12, kn_num, kn_den
FROM model ORDER BY c12 DESC, w1, w2 LIMIT 25
"""
)


@register("doc_kn_bigram_model", oracle=_KN_MODEL_ORACLE)
def doc_kn_bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram model over the document corpus
    (`text/kneser_ney.py::kn_bigram_model` — discounted bigram term +
    distinct-continuation unigram term, carried as an exact BIGINT
    fraction; D = 3/4). Output: the 25 most frequent bigrams with their
    raw count and KN probability numerator/denominator — integer
    columns end to end, so the hash compare is exact."""
    from backend_big_data_spark.text.kneser_ney import kn_bigram_model

    docs = load_table(spark, sf_dir, "documents")
    return kn_bigram_model(docs).orderBy(
        F.desc("c12"), "w1", "w2"
    ).limit(25)


_KN_NLL_ORACLE = (
    _KN_CTES
    + """
, scored AS (
  SELECT o.doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         -SUM(CAST(floor((ln(m.kn_num) - ln(m.kn_den)) * 10000 + 0.5)
                   AS BIGINT)) AS nll_fp
  FROM occ o JOIN model m ON o.w1 = m.w1 AND o.w2 = m.w2
  GROUP BY 1
)
SELECT CASE WHEN n_bigrams <= 20 THEN 'a:1-20'
            WHEN n_bigrams <= 60 THEN 'b:21-60'
            ELSE 'c:61+' END AS size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
       CAST(SUM(nll_fp) AS BIGINT) AS total_nll_fp
FROM scored GROUP BY 1 ORDER BY 1
"""
)


@register("doc_kn_perplexity", oracle=_KN_NLL_ORACLE)
def doc_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KN-smoothed corpus quality readout: per-document NLL under the
    self-trained Kneser-Ney bigram model (`text/kneser_ney.kn_doc_nll`
    — per-bigram log-probs quantized to 1e-4 nats before the
    order-independent integer per-doc sum), aggregated by document size
    bucket. The KN counterpart of `doc_bigram_perplexity`'s add-k model
    — the pair quantifies how much probability mass smoothing choice
    moves on the same corpus."""
    from backend_big_data_spark.text.kneser_ney import kn_doc_nll

    docs = load_table(spark, sf_dir, "documents")
    nll = kn_doc_nll(docs)
    bucket = (
        F.when(F.col("n_bigrams") <= 20, "a:1-20")
        .when(F.col("n_bigrams") <= 60, "b:21-60")
        .otherwise("c:61+")
    )
    return (
        nll.groupBy(bucket.alias("size_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("total_bigrams"),
            F.sum("nll_fp").alias("total_nll_fp"),
        )
        .orderBy("size_bucket")
    )


_BEST_MATCH_ORACLE = f"""
WITH t AS (
  SELECT CAST(p_partkey AS BIGINT) AS id, {_TOKS} AS toks FROM part
), s AS (
  SELECT id, toks, len(toks) AS sz FROM t WHERE len(toks) > 0
), p AS (
  SELECT a.id AS probe_id, b.id AS base_id,
         CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_cnt,
         CAST(a.sz + b.sz - len(list_intersect(a.toks, b.toks)) AS BIGINT)
           AS union_cnt
  FROM s a JOIN s b ON a.id <> b.id
  WHERE len(list_intersect(a.toks, b.toks)) * 5
        >= (a.sz + b.sz - len(list_intersect(a.toks, b.toks))) * 3
), r AS (
  SELECT probe_id, base_id, inter_cnt, union_cnt,
         CAST(row_number() OVER (
           PARTITION BY probe_id
           ORDER BY (inter_cnt * 4294967296) // union_cnt DESC, base_id
         ) AS INTEGER) AS rank
  FROM p WHERE union_cnt < 65536
)
SELECT probe_id, base_id, rank, inter_cnt, union_cnt
FROM r WHERE rank <= 1 ORDER BY probe_id
"""


@register("part_token_best_match", oracle=_BEST_MATCH_ORACLE)
def part_token_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-match entity resolution: for every part record its single
    most-similar other record by distinct-token Jaccard (floor 3/5),
    via `operators/setsimjoin.token_jaccard_topk` — the linear-output
    production shape (|probe|·k rows regardless of the corpus'
    duplicate mass; the all-pairs forms materialize that mass).
    Ranking is exact fraction order through the 2^32-scaled integer
    key; ties break on base id, so the winner is engine-portable."""
    from backend_big_data_spark.operators.setsimjoin import (
        token_jaccard_topk,
    )

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("s"),
    )
    return token_jaccard_topk(
        part, part, k=1, floor_num=3, floor_den=5, exclude_same_id=True
    ).orderBy("probe_id")


@register("part_token_jaccard_indexed", oracle=_JACCARD_ORACLE)
def part_token_jaccard_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same token-set linkage task through the INCREMENTAL path
    (`operators/setsimjoin.token_jaccard_join_indexed` — the probe's
    rarest-token prefixes broadcast against a pre-built master token
    index ranked by the index's own frequencies; the master is never
    re-tokenized; this is the probe the streaming sink
    `streaming/setsim_ingest.py` runs per micro-batch). Same brute-force
    oracle as `part_token_jaccard_match`: both paths are
    result-invariant blockings of the same join."""
    from backend_big_data_spark.operators.setsimjoin import (
        token_index,
        token_jaccard_join_indexed,
    )

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("s"),
    )
    idx = token_index(part)
    freq = idx.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        # broadcast_probe=False: THIS query's probe is the full corpus —
        # a corpus-sized prefix broadcast is the one shape the indexed
        # probe must never take at scale (the sink's batch-sized probes
        # keep the default broadcast)
        token_jaccard_join_indexed(
            part, idx, part, 3, 5, index_freq=freq, broadcast_probe=False
        )
        .where(F.col("probe_id") < F.col("master_id"))
        .select(
            F.col("probe_id").alias("left_id"),
            F.col("master_id").alias("right_id"),
            "inter_cnt",
            "union_cnt",
        )
        .orderBy("left_id", "right_id")
    )
