"""Ed-Join fuzzy join (`operators/fuzzyjoin.py`).

The load-bearing claim is RESULT-INVARIANCE of the blocking: prefix
filtering on the k·q+1 globally-rarest grams plus exact verify must
equal brute force. The corpus here is adversarial for that claim:
heavy gram repetition (periodic strings), a stopword gram shared by
everything, clusters of strings within distance 1-2 of each other, and
pairs just OVER the threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.operators.fuzzyjoin import (
    edit_distance_join,
    edit_distance_join_indexed,
    gram_index,
    qgrams,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


LEFT = [
    "abcabcabcabc",  # periodic — duplicate grams
    "abcabcabcab",  # 1 deletion from above
    "xbcabcabcabc",  # 1 substitution
    "the zzz common prefix one",
    "the zzz common prefix two",  # shares the frequent 'the zzz...' grams
    "the zzz common prefix twoX",
    "qqqqqqqqqqqq",
    "entirely different string",
]
RIGHT = [
    "abcabcabcabc",
    "abcabcabcabcabc",  # 3 insertions — just over k=2
    "the zzz common prefix twa",
    "the zzz common prefix two",
    "qqqqqqqqqqqq",
    "qqqqqqqqqqq",  # 1 deletion
    "unrelated payload here",
]


def _brute(k):
    return sorted(
        (i, j, _lev(a, b))
        for i, a in enumerate(LEFT)
        for j, b in enumerate(RIGHT)
        if _lev(a, b) <= k
    )


class TestEditDistanceJoin:
    def _run(self, spark, k, q=3):
        ldf = spark.createDataFrame(list(enumerate(LEFT)), "id int, s string")
        rdf = spark.createDataFrame(list(enumerate(RIGHT)), "id int, s string")
        out = edit_distance_join(ldf, rdf, max_dist=k, q=q).collect()
        return sorted((r.left_id, r.right_id, r.edit_dist) for r in out)

    def test_matches_brute_force_k2(self, spark):
        assert self._run(spark, 2) == _brute(2)

    def test_matches_brute_force_k1(self, spark):
        assert self._run(spark, 1) == _brute(1)

    def test_matches_brute_force_q2(self, spark):
        assert self._run(spark, 2, q=2) == _brute(2)

    def test_indexed_variant_matches_brute_force(self, spark):
        # the one-sided prefix probe against a pre-built gram index must
        # be result-invariant too (completeness holds for ANY left-gram
        # ranking, so batch-local frequency is safe)
        ldf = spark.createDataFrame(list(enumerate(LEFT)), "id int, s string")
        rdf = spark.createDataFrame(list(enumerate(RIGHT)), "id int, s string")
        for k in (1, 2):
            out = edit_distance_join_indexed(
                ldf, gram_index(rdf), rdf, max_dist=k
            ).collect()
            got = sorted((r.left_id, r.right_id, r.edit_dist) for r in out)
            assert got == _brute(k), k

    def test_self_join_shape(self, spark):
        df = spark.createDataFrame(list(enumerate(LEFT)), "id int, s string")
        out = edit_distance_join(df, df, max_dist=2).collect()
        got = {(r.left_id, r.right_id) for r in out}
        # every identity pair survives (distance 0)
        assert {(i, i) for i in range(len(LEFT))} <= got
        # symmetric
        assert {(b, a) for a, b in got} == got


class TestQgrams:
    def test_positional_grams(self, spark):
        df = spark.createDataFrame([("abcd",), ("ab",), ("abc",)], "s string")
        got = {
            r.s: list(r.g)
            for r in df.select("s", qgrams(F.col("s"), 3).alias("g")).collect()
        }
        assert got["abcd"] == ["abc", "bcd"]
        assert got["abc"] == ["abc"]
        assert got["ab"] == []  # shorter than q → empty (caller filters)
