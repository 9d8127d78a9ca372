"""BPE merge learning (`text/bpe.py`).

The load-bearing claims: (1) the distributed `aggregate`-fold merge is
exactly the classic greedy left-to-right non-overlapping merge (diffed
against the plain-Python reference encoder on adversarial inputs),
(2) `learn_bpe` reproduces a hand-computable golden on a fixed corpus,
(3) tie-breaks are deterministic, (4) the loop stops early when the
vocabulary runs out of pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.text.bpe import (
    apply_bpe,
    learn_bpe,
    merge_pair,
    segment_word,
)


def _learn(spark, rows, k):
    wc = spark.createDataFrame(rows, "word string, n long")
    return [tuple(r) for r in learn_bpe(wc, num_merges=k).collect()]


class TestMergeFold:
    # Adversarial words x merge lists: overlap runs, merged-symbol
    # adjacency, merges that can't apply, multi-char symbols.
    CASES = [
        ("aaaa", [("a", "a")]),
        ("aaaaa", [("a", "a")]),
        ("aaa", [("a", "a"), ("aa", "a")]),
        ("abab", [("a", "b"), ("ab", "ab")]),
        ("aab", [("a", "b")]),
        ("banana", [("a", "n"), ("an", "an"), ("b", "an")]),
        ("xyz", [("q", "r")]),
        ("a", [("a", "a")]),
        ("mississippi", [("s", "s"), ("i", "ss"), ("p", "p")]),
    ]

    def test_fold_matches_reference_encoder(self, spark):
        words = [w for w, _ in self.CASES]
        merges = sorted({m for _, ms in self.CASES for m in ms})
        df = apply_bpe(
            spark.createDataFrame([(w,) for w in words], "word string"),
            merges,
        )
        got = {r.word: list(r.syms) for r in df.collect()}
        for w in words:
            assert got[w] == segment_word(w, merges), (w, merges)

    def test_single_merge_column_expr(self, spark):
        df = spark.createDataFrame([("aaaa",), ("aab",)], "word string")
        syms = F.filter(F.split("word", "(?!^)"), lambda c: c != F.lit(""))
        out = {
            r.word: list(r.m)
            for r in df.select(
                "word", merge_pair(syms, "a", "a").alias("m")
            ).collect()
        }
        assert out["aaaa"] == ["aa", "aa"]  # non-overlapping, no cascade
        assert out["aab"] == ["aa", "b"]


class TestLearnBpe:
    def test_golden_small_corpus(self, spark):
        # corpus: low*5  lower*2  newest*6  widest*3  (Sennrich-style
        # example, no end-of-word sentinel).
        rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        got = _learn(spark, rows, 4)
        # pair counts step 0: es=9, st=9, lo=7, ... argmax tie (es, st)
        # breaks lexicographically: ("e","s") < ("s","t").
        assert got[0] == (0, "e", "s", "es", 9)
        assert got[1] == (1, "es", "t", "est", 9)
        assert got[2] == (2, "l", "o", "lo", 7)
        # after lo: low*7 → ow=7 beats ne/ew/we... (ne=6, wi/id/de=3+...)
        assert got[3] == (3, "lo", "w", "low", 7)

    def test_tie_break_deterministic(self, spark):
        # two pairs with equal counts — lexicographic (l, r) wins.
        rows = [("zy", 4), ("ab", 4)]
        got = _learn(spark, rows, 1)
        assert got[0] == (0, "a", "b", "ab", 4)

    def test_early_exhaustion(self, spark):
        # single-char words have no adjacent pairs after one merge.
        rows = [("aa", 3), ("b", 9)]
        got = _learn(spark, rows, 10)
        assert got == [(0, "a", "a", "aa", 3)]

    def test_segment_with_learned_merges(self, spark):
        rows = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = [(l, r) for _, l, r, _, _ in _learn(spark, rows, 4)]
        assert segment_word("lowest", merges) == ["low", "est"]
        assert segment_word("newest", merges) == ["n", "e", "w", "est"]


class TestWordPiece:
    """`learn_wordpiece`: BPE's skeleton with the likelihood-gain
    selection rule — checked against a plain-Python reference learner
    and on a corpus crafted so WordPiece and BPE pick DIFFERENT pairs."""

    @staticmethod
    def _ref_learn(word_counts, k):
        import math
        from collections import Counter

        words = [(list(w), n) for w, n in word_counts]
        out = []
        for step in range(k):
            pairs: Counter = Counter()
            syms: Counter = Counter()
            for ws, n in words:
                for a, b in zip(ws, ws[1:]):
                    pairs[(a, b)] += n
                for s in ws:
                    syms[s] += n
            if not pairs:
                break
            scored = {
                (a, b): math.floor(
                    (math.log(c) - math.log(syms[a]) - math.log(syms[b]))
                    * 1000
                    + 0.5
                )
                for (a, b), c in pairs.items()
            }
            best = min(scored, key=lambda p: (-scored[p], p[0], p[1]))
            a, b = best
            out.append((step, a, b, a + b, scored[best], pairs[best]))
            merged = []
            for ws, n in words:
                acc = []
                for s in ws:
                    if acc and acc[-1] == a and s == b:
                        acc[-1] = a + b
                    else:
                        acc.append(s)
                merged.append((acc, n))
            words = merged
        return out

    def test_matches_reference_learner(self, spark):
        from backend_big_data_spark.text.bpe import learn_wordpiece

        rows = [
            ("banana", 5),
            ("bandana", 3),
            ("ananas", 2),
            ("cabana", 4),
            ("nab", 7),
            ("zz", 1),
        ]
        wc = spark.createDataFrame(rows, "word string, n long")
        got = [tuple(r) for r in learn_wordpiece(wc, num_merges=6).collect()]
        assert got == self._ref_learn(rows, 6)

    def test_selection_differs_from_bpe(self, spark):
        """'e'+'r' is the most FREQUENT pair but both symbols are
        everywhere; 'q'+'u' is rarer as a pair but its parts only ever
        co-occur — WordPiece must pick (q, u) first while BPE picks the
        raw-count winner."""
        from backend_big_data_spark.text.bpe import learn_wordpiece

        rows = [
            ("erer", 10),   # 'er' pair count 20, e/u counts high
            ("ere", 10),
            ("rere", 5),
            ("qu", 4),      # q and u appear ONLY together
        ]
        wc = spark.createDataFrame(rows, "word string, n long")
        wp = [tuple(r)[1:3] for r in learn_wordpiece(wc, num_merges=1).collect()]
        bp = [tuple(r)[1:3] for r in learn_bpe(wc, num_merges=1).collect()]
        assert wp == [("q", "u")]
        assert bp != wp

    def test_early_exhaustion(self, spark):
        from backend_big_data_spark.text.bpe import learn_wordpiece

        wc = spark.createDataFrame([("ab", 1)], "word string, n long")
        got = [tuple(r) for r in learn_wordpiece(wc, num_merges=5).collect()]
        # one merge possible ('a','b'), then single symbols remain
        assert len(got) == 1 and got[0][1:4] == ("a", "b", "ab")
