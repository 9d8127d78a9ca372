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

import pytest

from backend_big_data_spark.operators.fuzzyjoin import (
    FuzzyJoinCandidateBlowup,
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


# shared-vocabulary regime: every string is a 2-word combination over a
# 4-word closed vocabulary, so even the globally-rarest q=3 grams are
# dense on both sides and the prefix equi-join fans out superlinearly —
# the exact adversarial regime the sizing rule exists to detect
_VOCAB = ["red", "blue", "green", "gold"]
_SHARED = [f"{a} {b}" for a in _VOCAB for b in _VOCAB]


def _brute_pairs(left, right, k):
    return sorted(
        (i, j, _lev(a, b))
        for i, a in enumerate(left)
        for j, b in enumerate(right)
        if _lev(a, b) <= k
    )


class TestSizingRule:
    def _frames(self, spark):
        ldf = spark.createDataFrame(
            list(enumerate(_SHARED)), "id int, s string"
        )
        rdf = spark.createDataFrame(
            list(enumerate(_SHARED)), "id int, s string"
        )
        return ldf, rdf

    def test_blowup_raises_naming_the_regime(self, spark):
        ldf, rdf = self._frames(spark)
        with pytest.raises(FuzzyJoinCandidateBlowup) as ei:
            edit_distance_join(ldf, rdf, max_dist=2, q=3, candidate_cap=100)
        msg = str(ei.value)
        assert "shared-vocabulary" in msg and "candidate_cap=100" in msg

    def test_escalation_caps_growth_and_preserves_brute_force(self, spark):
        ldf, rdf = self._frames(spark)
        # q=3 exceeds the cap (previous test); succeeding here proves the
        # escalated q brought the candidate bound UNDER the same cap —
        # capped growth — while the result stays exactly brute force
        out = edit_distance_join(
            ldf,
            rdf,
            max_dist=2,
            q=3,
            candidate_cap=100,
            escalate_q_to=6,
        ).collect()
        got = sorted((r.left_id, r.right_id, r.edit_dist) for r in out)
        assert got == _brute_pairs(_SHARED, _SHARED, 2)

    def test_escalation_refuses_short_strings(self, spark):
        # escalating past the shortest string would silently lose its
        # grams (incomplete join) — the rule must raise instead
        rows = [(0, "abcd"), (1, "abce"), (2, "abcf"), (3, "abcg")]
        df = spark.createDataFrame(rows, "id int, s string")
        with pytest.raises(FuzzyJoinCandidateBlowup) as ei:
            edit_distance_join(
                df, df, max_dist=1, q=3, candidate_cap=1, escalate_q_to=9
            )
        assert "cannot escalate" in str(ei.value)

    def test_uncapped_default_unchanged(self, spark):
        ldf, rdf = self._frames(spark)
        out = edit_distance_join(ldf, rdf, max_dist=2).collect()
        got = sorted((r.left_id, r.right_id, r.edit_dist) for r in out)
        assert got == _brute_pairs(_SHARED, _SHARED, 2)


class TestRegisteredCapRefusesAdversarial:
    def test_registered_cap_trips_on_shared_vocab_corpus(self, spark):
        """The cap ARMED in the registered `part_fuzzy_match`
        (plans/round7c.FUZZY_CANDIDATE_CAP) must refuse a
        shared-vocabulary corpus whose exact prefix bound exceeds it —
        6.5k identical strings expose 6 grams each, bound 6·6500² ≈
        2.5e8 > 2.0e8, tripped by one gram-count aggregate, never the
        quadratic join."""
        from pyspark.sql import functions as F

        from backend_big_data_spark.plans.round7c import FUZZY_CANDIDATE_CAP

        df = spark.range(6_500).select(
            F.col("id"), F.lit("abcdefgh").alias("s")
        )
        with pytest.raises(FuzzyJoinCandidateBlowup) as ei:
            edit_distance_join(
                df, df, max_dist=2, q=3, candidate_cap=FUZZY_CANDIDATE_CAP
            )
        assert "shared-vocabulary" in str(ei.value)


class TestMaintainedIndexFreq:
    def test_index_freq_table_matches_on_the_fly_ranking(self, spark):
        # maintained (gram, cnt) rows — here deliberately SPLIT across
        # partial frames like per-batch sidecar dirs — must produce the
        # exact result of the on-the-fly index aggregate
        ldf = spark.createDataFrame(list(enumerate(LEFT)), "id int, s string")
        rdf = spark.createDataFrame(list(enumerate(RIGHT)), "id int, s string")
        idx = gram_index(rdf)
        half1 = idx.filter(F.col("id") < 3).groupBy("gram").count()
        half2 = idx.filter(F.col("id") >= 3).groupBy("gram").count()
        freq = half1.unionByName(half2).withColumnRenamed("count", "cnt")
        for k in (1, 2):
            via_freq = edit_distance_join_indexed(
                ldf, idx, rdf, max_dist=k, index_freq=freq
            ).collect()
            on_the_fly = edit_distance_join_indexed(
                ldf, idx, rdf, max_dist=k, rank_by_index_freq=True
            ).collect()
            key = lambda rows: sorted(
                (r.left_id, r.right_id, r.edit_dist) for r in rows
            )
            assert key(via_freq) == key(on_the_fly) == _brute(k)


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
