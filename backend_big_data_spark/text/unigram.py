"""Unigram-LM tokenizer — distributed Viterbi segmentation + hard-EM.

The unigram language-model tokenizer behind SentencePiece (public
algorithm: Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates"), re-expressed
Spark-first with a deterministic, engine-replayable contract — the
tokenizer-family complement of `text/bpe.py` (BPE grows a vocabulary
bottom-up by merging; unigram starts from a large seed and PRUNES under a
probabilistic model, segmenting with Viterbi):

1. ONE corpus scan builds the (word, n) frequency table — everything
   after operates on the vocabulary (the same working-set collapse as
   BPE: even web-scale corpora have vocabularies in the tens of
   millions, a few GB).
2. Seed vocabulary: every substring of length ≤ ``max_piece_len`` of the
   corpus words, occurrence-weighted; the top ``vocab_size`` multi-char
   pieces by (count DESC, piece ASC) — a distributed top-k
   (TakeOrderedAndProject, never a global sort) — plus ALL single
   characters so every word stays coverable.
3. Piece costs are −ln(freq/total) quantized to BIGINT **milli-nats**
   via ``floor``: every Viterbi comparison downstream is exact integer
   arithmetic, bit-identical across engines and reduction orders. The
   only cross-engine float is ``ln`` itself, whose ≤1-ulp wobble would
   have to straddle a 1e-3 quantization boundary to change a cost — the
   same IEEE-double-quantization contract the FPGrowth oracle uses for
   its minSupport threshold.
4. Viterbi segmentation is a JVM ``aggregate`` fold per distinct word:
   ``best[e] = min over candidate pieces (s,e] of best[s] + cost``, then
   a backtrack fold choosing at each end position the candidate
   minimizing ``(total, start, piece)`` — fully deterministic, no
   Python on the data path. Candidates come from exploding each word's
   ≤ ``len·max_piece_len`` substrings and broadcast-joining the vocab.
5. Hard-EM (Viterbi-EM) rounds: the E-step counts occurrence-weighted
   piece usage in the Viterbi segmentations; the M-step keeps the top
   ``vocab_size`` multi-char pieces by (count DESC, piece ASC), keeps
   every single character (count floored at 1 for coverage), and
   re-costs. Kudo's soft-EM differs only in the E-step estimator
   (forward-backward expected counts); Viterbi-EM is the standard hard
   variant and is exactly replayable in ANSI SQL (recursive-CTE DP —
   see `plans/round7d.py`).

Scale notes (100 TB): the corpus is read exactly once; seed explosion,
candidate generation, DP folds and EM rounds all run over the
vocabulary table with the vocab itself broadcast (it is top-k-bounded
by construction). One shuffle per EM round (the usage groupBy); lineage
truncated per round. Encoding a corpus at serving time is the same
candidate-join + fold over DISTINCT words with weights rejoined — the
corpus is never re-segmented per occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation

#: cost quantization: milli-nats per unit (floor(-1000·ln p))
COST_SCALE = 1000.0

DEFAULT_MAX_PIECE_LEN = 4
DEFAULT_VOCAB_SIZE = 24
DEFAULT_EM_ROUNDS = 2

#: DP cost of an unreachable position: finite (see viterbi_segment's
#: docstring for why not NULL) but too large for any real path to reach
#: while leaving BIGINT headroom for the per-step additions above it.
_UNCOVERABLE = 1 << 62


def _substrings(word_counts: DataFrame, max_piece_len: int) -> DataFrame:
    """(word, n) → (word, n, s, e, piece): every substring of length
    1..max_piece_len, with 0-based start ``s`` and exclusive end ``e``."""
    return (
        word_counts.select(
            "word",
            "n",
            F.explode(F.sequence(F.lit(0), F.length("word") - 1)).alias("s"),
        )
        .select(
            "word",
            "n",
            "s",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("word") - F.col("s")),
                )
            ).alias("l"),
        )
        .select(
            "word",
            "n",
            "s",
            (F.col("s") + F.col("l")).alias("e"),
            F.col("word").substr(F.col("s") + 1, F.col("l")).alias("piece"),
        )
    )


def piece_costs(counts: DataFrame) -> DataFrame:
    """(piece, cnt) → (piece, cnt, cost): fixed-point unigram costs,
    ``floor(−1000·ln(cnt/total))`` as BIGINT milli-nats. The total is the
    current vocabulary's count sum (1-row broadcast cross join)."""
    tot = counts.agg(F.sum("cnt").alias("tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.floor(
            F.lit(-COST_SCALE)
            * F.log(F.col("cnt").cast("double") / F.col("tot").cast("double"))
        )
        .cast("long")
        .alias("cost"),
    )


def seed_counts(
    word_counts: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
) -> DataFrame:
    """Seed vocabulary counts: all single characters plus the top
    ``vocab_size`` multi-char substrings by (occurrence-weighted count
    DESC, piece ASC) — orderBy+limit compiles to a distributed top-k."""
    subs = (
        _substrings(word_counts, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
    )
    singles = subs.filter(F.length("piece") == 1)
    multi = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(vocab_size)
    )
    return singles.unionByName(multi)


def viterbi_segment(
    word_counts: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
) -> DataFrame:
    """Segment every distinct word under ``vocab`` (piece, cnt, cost):
    (word, n, pieces array<string>, total_cost bigint).

    DP and backtrack are ``aggregate`` folds over the word's positions;
    the argmin at each end position orders candidates by
    ``(best[start]+cost, start, piece)`` — exact BIGINT comparisons,
    deterministic across engines. A vocabulary from the seed/EM steps
    covers every character, but for an EXTERNALLY supplied vocabulary an
    uncoverable word surfaces as a row with NULL ``total_cost`` (and
    NULL ``pieces``), never a silent drop: the words frame is
    left-joined back after the candidate join (a word sharing no
    substring with vocab would otherwise lose its row), and unreachable
    DP positions carry an explicit ``_UNCOVERABLE`` BIGINT sentinel —
    not a NULL, which Spark's higher-order-function codegen can read
    back as 0 downstream of the fold (observed: the same aggregate
    yields [0, NULL] shown directly but [0, 0] through a later
    element_at), and which array_sort would order before real costs in
    the backtrack argmin."""
    words = word_counts.select("word", "n")
    matched = (
        _substrings(words, max_piece_len)
        .join(F.broadcast(vocab.select("piece", "cost")), "piece")
        .groupBy("word")
        .agg(
            F.collect_list(F.struct("s", "e", "piece", "cost")).alias("cands"),
        )
    )
    cands = words.join(matched, "word", "left").withColumn(
        "cands",
        F.coalesce(
            F.col("cands"),
            F.expr(
                "CAST(array() AS "
                "array<struct<s:int,e:int,piece:string,cost:bigint>>)"
            ),
        ),
    )
    best = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.array(F.lit(0).cast("long")),
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.coalesce(
                    F.array_min(
                        F.transform(
                            F.filter(F.col("cands"), lambda c: c["e"] == e),
                            lambda c: F.element_at(acc, c["s"] + 1) + c["cost"],
                        )
                    ),
                    F.lit(_UNCOVERABLE),
                )
            ),
        ),
    )
    with_best = cands.withColumn("best", best)

    def _chosen(st):
        """Argmin candidate ending at st.pos by (total, start, piece) —
        referenced twice per step; textually identical subtrees, so
        codegen's common-subexpression elimination shares the work.
        ``try_element_at``: a position no vocab piece ends at has zero
        candidates — NULL (surfacing as the NULL-total contract row)
        instead of an ANSI array-index error."""
        return F.try_element_at(
            F.array_sort(
                F.transform(
                    F.filter(F.col("cands"), lambda c: c["e"] == st["pos"]),
                    lambda c: F.struct(
                        (F.element_at(F.col("best"), c["s"] + 1) + c["cost"]).alias(
                            "tot"
                        ),
                        c["s"].alias("s"),
                        c["piece"].alias("p"),
                    ),
                )
            ),
            F.lit(1),
        )

    walk = F.aggregate(
        F.sequence(F.lit(1), F.length("word")),
        F.struct(
            F.length("word").cast("int").alias("pos"),
            F.expr("CAST(array() AS array<string>)").alias("pieces"),
        ),
        lambda st, _: F.when(st["pos"] <= 0, st).otherwise(
            F.struct(
                _chosen(st)["s"].cast("int").alias("pos"),
                F.concat(F.array(_chosen(st)["p"]), st["pieces"]).alias("pieces"),
            )
        ),
    )
    total = F.element_at(F.col("best"), F.length("word") + 1)
    covered = total < F.lit(_UNCOVERABLE)
    return with_best.select(
        "word",
        "n",
        # an uncovered word end means the DP never spanned the word;
        # the backtrack walk is then meaningless, so NULL both outputs
        F.when(covered, walk["pieces"]).alias("pieces"),
        F.when(covered, total).alias("total_cost"),
    )


def hard_em(
    word_counts: DataFrame,
    max_piece_len: int = DEFAULT_MAX_PIECE_LEN,
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    rounds: int = DEFAULT_EM_ROUNDS,
) -> DataFrame:
    """Learn a unigram vocabulary: seed, then ``rounds`` Viterbi-EM
    rounds. Returns (piece, cnt, cost) — ``cnt`` is the final E-step's
    occurrence-weighted usage (seed counts if rounds=0), single-char
    counts floored at 1 so coverage never dies."""
    wc = pin_single_evaluation(word_counts)
    vocab = pin_single_evaluation(
        piece_costs(seed_counts(wc, max_piece_len, vocab_size))
    )
    singles = _substrings(wc, 1).select("piece").distinct()
    for _ in range(rounds):
        seg = viterbi_segment(wc, vocab, max_piece_len)
        used = (
            seg.select(F.explode("pieces").alias("piece"), "n")
            .groupBy("piece")
            .agg(F.sum("n").alias("cnt"))
        )
        kept_singles = (
            singles.join(used, "piece", "left")
            .select(
                "piece", F.greatest(F.coalesce("cnt", F.lit(0)), F.lit(1)).alias("cnt")
            )
        )
        kept_multi = (
            used.filter(F.length("piece") > 1)
            .orderBy(F.desc("cnt"), "piece")
            .limit(vocab_size)
        )
        vocab = pin_single_evaluation(
            piece_costs(kept_singles.unionByName(kept_multi))
        )
    return vocab


def segment_word_ref(word: str, costs: dict[str, int]) -> tuple[list[str], int]:
    """Driver-side plain-Python twin of :func:`viterbi_segment` for one
    word: (pieces, total_cost) under integer piece costs, identical
    ``(total, start, piece)`` argmin tie-break — what the tests diff the
    distributed folds against."""
    L = len(word)
    best = [0] + [None] * L
    for e in range(1, L + 1):
        opts = [
            best[s] + costs[word[s:e]]
            for s in range(e)
            if word[s:e] in costs and best[s] is not None
        ]
        best[e] = min(opts) if opts else None
    pieces: list[str] = []
    pos = L
    while pos > 0:
        tot, s, p = min(
            (best[s] + costs[word[s:pos]], s, word[s:pos])
            for s in range(pos)
            if word[s:pos] in costs and best[s] is not None
        )
        pieces.insert(0, p)
        pos = s
    return pieces, best[L]


__all__ = [
    "COST_SCALE",
    "DEFAULT_EM_ROUNDS",
    "DEFAULT_MAX_PIECE_LEN",
    "DEFAULT_VOCAB_SIZE",
    "hard_em",
    "piece_costs",
    "seed_counts",
    "segment_word_ref",
    "viterbi_segment",
]
