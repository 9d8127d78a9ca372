"""Token-set similarity joins (`operators/setsimjoin.py`).

Same load-bearing claim as the fuzzy join: the blocking (global-order
prefix filter + length filter) must be RESULT-INVARIANT — output equals
brute force. The corpus is adversarial for that: a stopword token in
every record, heavy token skew, sets of different sizes straddling the
length filter, and pairs exactly AT the threshold (integer
cross-multiplication must not wobble on boundaries).
"""

from __future__ import annotations

import itertools

from backend_big_data_spark.operators.setsimjoin import (
    token_containment_join,
    token_jaccard_join,
    ws_tokens,
)

ROWS = [
    (0, "the red blue green gold"),
    (1, "the red blue green plum"),      # jaccard 4/6 with 0
    (2, "the red blue green gold"),      # exact dup of 0
    (3, "the red blue"),                 # subset of 0 (containment)
    (4, "the puce"),                     # shares only the stopword
    (5, "red red red the gold blue green"),  # dup tokens; set == row 0
    (6, "the lime aqua teal snow"),
    (7, "lime aqua teal snow extra the words here now"),  # contains 6
    (8, ""),                             # empty
    (9, "the"),                          # single stopword
]


def _toks(s):
    return set(t for t in s.split() if t)


def _brute_jaccard(rows, t_num, t_den):
    out = []
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        ta, tb = _toks(a), _toks(b)
        if not ta or not tb:
            continue
        inter = len(ta & tb)
        union = len(ta | tb)
        if inter * t_den >= union * t_num:
            out.append((i, j, inter, union))
    return sorted(out)


def _brute_containment(rows, t_num, t_den):
    out = []
    for (i, a) in rows:
        for (j, b) in rows:
            if i == j:
                continue
            ta, tb = _toks(a), _toks(b)
            if not ta or not tb:
                continue
            inter = len(ta & tb)
            if inter * t_den >= len(ta) * t_num:
                out.append((i, j, inter, len(ta)))
    return sorted(out)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string")


class TestTokenJaccardJoin:
    def test_matches_brute_force(self, spark):
        df = _df(spark, ROWS)
        for t_num, t_den in ((3, 5), (1, 2), (4, 5)):
            got = sorted(
                (r.left_id, r.right_id, r.inter_cnt, r.union_cnt)
                for r in token_jaccard_join(df, df, t_num, t_den)
                .where("left_id < right_id")
                .collect()
            )
            assert got == _brute_jaccard(ROWS, t_num, t_den), (t_num, t_den)

    def test_two_sided_r_times_s(self, spark):
        left = _df(spark, ROWS[:5])
        right = _df(spark, ROWS[5:])
        got = sorted(
            (r.left_id, r.right_id, r.inter_cnt, r.union_cnt)
            for r in token_jaccard_join(left, right, 3, 5).collect()
        )
        want = sorted(
            (i, j, len(_toks(a) & _toks(b)), len(_toks(a) | _toks(b)))
            for i, a in ROWS[:5]
            for j, b in ROWS[5:]
            if _toks(a) and _toks(b)
            and len(_toks(a) & _toks(b)) * 5 >= len(_toks(a) | _toks(b)) * 3
        )
        assert got == want

    def test_identity_pairs_survive_self_join(self, spark):
        df = _df(spark, ROWS)
        got = {
            (r.left_id, r.right_id)
            for r in token_jaccard_join(df, df, 9, 10).collect()
        }
        # every non-empty set matches itself at jaccard 1
        assert {(i, i) for i, s in ROWS if _toks(s)} <= got

    def test_empty_sets_match_nothing(self, spark):
        df = _df(spark, ROWS)
        out = token_jaccard_join(df, df, 1, 10).collect()
        ids = {r.left_id for r in out} | {r.right_id for r in out}
        assert 8 not in ids and 9 in ids  # 9 has one token, 8 has none


class TestTokenContainmentJoin:
    def test_matches_brute_force(self, spark):
        df = _df(spark, ROWS)
        for t_num, t_den in ((4, 5), (3, 5), (1, 1)):
            got = sorted(
                (r.probe_id, r.base_id, r.inter_cnt, r.probe_sz)
                for r in token_containment_join(df, df, t_num, t_den)
                .where("probe_id != base_id")
                .collect()
            )
            assert got == _brute_containment(ROWS, t_num, t_den), (t_num, t_den)

    def test_salted_verify_is_result_identical(self, spark, monkeypatch):
        """The hot-key salting path (armed cap + fan-out over threshold —
        the closed-vocabulary regime): forcing the threshold to 0 makes
        every armed join salt, and the result must equal both the
        unsalted plan and brute force — pairs meet exactly once per
        shared (tid, salt-of-base)."""
        from backend_big_data_spark.operators import setsimjoin

        monkeypatch.setattr(setsimjoin, "_SALT_FAN_THRESHOLD", 0)
        monkeypatch.setattr(setsimjoin, "_SALT_MIN_PREFIX_ROWS", 0)
        df = _df(spark, ROWS)
        got = sorted(
            (r.probe_id, r.base_id, r.inter_cnt, r.probe_sz)
            for r in token_containment_join(
                df, df, 4, 5, candidate_cap=10_000
            )
            .where("probe_id != base_id")
            .collect()
        )
        assert got == _brute_containment(ROWS, 4, 5)

    def test_asymmetry(self, spark):
        """Row 3 ('the red blue') is fully inside row 0 but not vice
        versa at t=1: containment must be directional."""
        df = _df(spark, ROWS)
        got = {
            (r.probe_id, r.base_id)
            for r in token_containment_join(df, df, 1, 1)
            .where("probe_id != base_id")
            .collect()
        }
        assert (3, 0) in got and (0, 3) not in got


class TestPositionalAdversarial:
    """Randomized + positional-adversarial invariance (added r12 while
    evaluating PPJoin's positional filter — measured 0 % prune on
    rarity-ordered prefixes and REJECTED, see the module docstring;
    the corpora built to stress it are kept as standing brute-force
    gates): records sharing rare tokens LATE in one array and EARLY in
    the other, true matches whose shared tokens span both ends, and
    pairs exactly at the threshold — any future candidate-pruning
    change must keep all of these byte-identical to brute force."""

    def _rand_rows(self, n=60, seed=7):
        import random

        rng = random.Random(seed)
        vocab = [f"t{i:02d}" for i in range(30)]
        rows = []
        for i in range(n):
            sz = rng.randint(1, 12)
            rows.append((i, " ".join(rng.sample(vocab, sz))))
        return rows

    def test_jaccard_equals_brute_force_randomized(self, spark):
        rows = self._rand_rows()
        df = _df(spark, rows)
        for t_num, t_den in ((3, 5), (4, 5), (1, 2)):
            got = sorted(
                (r.left_id, r.right_id, r.inter_cnt, r.union_cnt)
                for r in token_jaccard_join(df, df, t_num, t_den)
                .where("left_id < right_id")
                .collect()
            )
            assert got == _brute_jaccard(rows, t_num, t_den), (t_num, t_den)

    def test_containment_equals_brute_force_randomized(self, spark):
        rows = self._rand_rows(seed=11)
        df = _df(spark, rows)
        for t_num, t_den in ((4, 5), (2, 3)):
            got = sorted(
                (r.probe_id, r.base_id, r.inter_cnt, r.probe_sz)
                for r in token_containment_join(df, df, t_num, t_den)
                .where("probe_id != base_id")
                .collect()
            )
            assert got == _brute_containment(rows, t_num, t_den), (
                t_num,
                t_den,
            )

    def test_match_via_late_base_position_survives(self, spark):
        """Probe fully contained in a base whose copy of the probe's
        tokens sits at the TAIL of the base's rarity order — the exact
        geometry a positional filter prunes hardest; the match must
        survive any candidate-pruning scheme."""
        rows = [
            (0, "x1 x2 x3 x4"),  # probe
            # base: shares all four probe tokens; its many hapax tokens
            # (unique → rarest) fill the head of its sorted array, so
            # the shared tokens sit at the tail — but t·|probe| = 4 of 4
            # still must match (containment 1/1).
            (1, "x1 x2 x3 x4 u1 u2 u3 u4 u5 u6"),
        ]
        # make x1..x4 COMMON (high count → late in the global order)
        rows += [(10 + i, "x1 x2 x3 x4") for i in range(8)]
        df = _df(spark, rows)
        got = {
            (r.probe_id, r.base_id)
            for r in token_containment_join(df, df, 1, 1)
            .where("probe_id != base_id")
            .collect()
        }
        assert (0, 1) in got


class TestWsTokens:
    def test_distinct_and_empty_dropped(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("a  b a",), ("",), ("  ",)], "s string"
        )
        got = [
            sorted(r.t)
            for r in df.select(ws_tokens(F.col("s")).alias("t")).collect()
        ]
        assert got == [["a", "b"], [], []]


class TestTokenJaccardTopk:
    def _brute_topk(self, rows, k, fn, fd):
        from fractions import Fraction

        best = {}
        for i, a in rows:
            cands = []
            for j, b in rows:
                if i == j:
                    continue
                ta, tb = _toks(a), _toks(b)
                if not ta or not tb:
                    continue
                inter, union = len(ta & tb), len(ta | tb)
                if inter * fd >= union * fn:
                    cands.append((-Fraction(inter, union), j, inter, union))
            cands.sort()
            best[i] = [
                (i, j, r + 1, inter, union)
                for r, (_, j, inter, union) in enumerate(cands[:k])
            ]
        return sorted(p for ps in best.values() for p in ps)

    def test_matches_brute_force_winners(self, spark):
        from backend_big_data_spark.operators.setsimjoin import (
            token_jaccard_topk,
        )

        df = _df(spark, ROWS)
        for k in (1, 2):
            got = sorted(
                (r.probe_id, r.base_id, r.rank, r.inter_cnt, r.union_cnt)
                for r in token_jaccard_topk(
                    df, df, k=k, floor_num=1, floor_den=5, exclude_same_id=True
                ).collect()
            )
            assert got == self._brute_topk(ROWS, k, 1, 5), k

    def test_scaled_key_orders_exact_fractions(self, spark):
        """3/5 vs 4/7 differ by 1/35 — the 2^32-scaled floor key must
        rank 3/5 (0.6) above 4/7 (0.571) even though both pass a 1/2
        floor; naive fixed-point at small scales would collide."""
        from backend_big_data_spark.operators.setsimjoin import (
            token_jaccard_topk,
        )

        rows = [
            (0, "a b c d e"),
            (1, "a b c x y"),      # inter 3, union 7 → 3/7 with 0... 
            (2, "a b c d q"),      # inter 4, union 6 → 2/3 with 0
            (3, "a b c d e f g"),  # inter 5, union 7 → 5/7 with 0
        ]
        df = _df(spark, rows)
        got = {
            r.probe_id: (r.base_id, r.inter_cnt, r.union_cnt)
            for r in token_jaccard_topk(
                df, df, k=1, floor_num=1, floor_den=5, exclude_same_id=True
            ).collect()
        }
        # probe 0's best: 3 (5/7 ≈ .714) beats 2 (4/6 ≈ .667) beats 1
        assert got[0] == (3, 5, 7)


class TestDenseIds:
    def test_order_faithful_and_injective_across_partitions(self, spark):
        """`_dense_ids` (range-partition + sortWithinPartitions +
        monotonically_increasing_id) must assign ids that are strictly
        increasing in (cnt ASC, token ASC) order — the only property the
        join semantics use (prefix = smallest ids = rarest tokens;
        equality for the intersection). 240 tokens with heavily
        duplicated counts (the hapax-skew shape) across 8 shuffle
        partitions exercises the cross-partition monotonicity."""
        import random

        from backend_big_data_spark.operators.setsimjoin import _dense_ids

        rng = random.Random(907)
        vocab = [(f"tok{i:04d}", rng.choice([1, 1, 1, 2, 3, 7])) for i in range(240)]
        rng.shuffle(vocab)
        freq = spark.createDataFrame(vocab, "token string, cnt long")
        got = {r.token: r.tid for r in _dense_ids(freq).collect()}
        assert len(got) == len(vocab)
        assert len(set(got.values())) == len(vocab)  # injective
        ranked = sorted(((c, t) for t, c in vocab))
        tids = [got[t] for _, t in ranked]
        assert tids == sorted(tids)  # order-faithful in (cnt, token)

    def test_unarmed_join_deterministic_over_persisted_input(self, spark):
        """The UNARMED joins consume `_ranked_sets` (and its
        monotonically_increasing_id token ids) from two side-filter
        branches with no pin — safe because both subtrees are
        byte-identical below the filter, so AQE plans them identically
        (see the `_dense_ids` docstring; this is the
        `operators/windows.py` r11 mid-divergence hazard audited for
        this family). Regression: results over a PERSISTED input must
        be run-to-run stable and equal the unpersisted truth — if a
        future engine version breaks branch-identical planning, this
        is the test that catches it."""
        import random

        from pyspark.sql import functions as F

        from backend_big_data_spark.operators.setsimjoin import (
            token_jaccard_join,
        )

        rng = random.Random(1311)
        words = [f"w{i}" for i in range(40)]
        rows = [
            (i, " ".join(rng.sample(words, rng.randint(3, 8))))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "id long, s string")

        def pairs(frame):
            return sorted(
                tuple(r)
                for r in token_jaccard_join(frame, frame, 3, 5)
                .where(F.col("left_id") < F.col("right_id"))
                .collect()
            )

        truth = pairs(df)
        assert truth, "fixture must produce matching pairs"
        p = df.persist()
        p.count()
        try:
            assert pairs(p) == truth
            assert pairs(p) == truth  # second evaluation, same cache
        finally:
            p.unpersist()

    def test_empty_vocabulary(self, spark):
        from backend_big_data_spark.operators.setsimjoin import _dense_ids

        freq = spark.createDataFrame([], "token string, cnt long")
        assert _dense_ids(freq).collect() == []

    def test_no_partitionless_window_in_plan(self, spark):
        """The scale guarantee itself: no setsim plan may contain a
        WindowExec with an empty partition spec (the one-task global
        sort hazard). Every window must be partitioned — `_dense_ids`'s
        by the range-partition id, the top-k ranking's by probe id."""
        from backend_big_data_spark.operators.setsimjoin import (
            _dense_ids,
            token_containment_join,
            token_jaccard_join,
            token_jaccard_topk,
        )

        def window_specs(df):
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            return [
                line
                for line in plan.splitlines()
                if "Window" in line.split("[")[0]
            ]

        def assert_all_partitioned(specs):
            # partitioned window spec prints as
            #   Window [funcs], [partition cols], [order cols]
            # partition-less drops the middle bracket group; any window
            # here must carry the probe-id partition (the id assignment
            # itself uses no window at all).
            for s in specs:
                assert "left_id#" in s, s

        freq = spark.createDataFrame(
            [("a", 1), ("b", 2)], "token string, cnt long"
        )
        assert window_specs(_dense_ids(freq)) == []

        df = _df(spark, ROWS)
        assert window_specs(token_jaccard_join(df, df, 3, 5)) == []
        assert window_specs(token_containment_join(df, df, 4, 5)) == []
        topk_specs = window_specs(
            token_jaccard_topk(df, df, k=1, floor_num=1, floor_den=5)
        )
        assert any("left_id#" in s for s in topk_specs)
        assert_all_partitioned(topk_specs)


class TestTopkOversizeRaises:
    def test_union_at_2_16_raises_not_drops(self, spark):
        """A pair whose union reaches 2^16 tokens must RAISE (the
        ranking key is only collision-free below 2^16) rather than
        silently vanish from the ranking. Tested on the production key
        EXPRESSION (`_topk_rank_key` — the exact column
        `token_jaccard_topk` ranks by) over a synthetic pairs frame: an
        end-to-end trigger needs ≥32k-token sets, whose prefix explode
        materializes gigabytes before the guard is ever evaluated."""
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

        from backend_big_data_spark.operators.setsimjoin import (
            _topk_rank_key,
        )

        ok = spark.createDataFrame(
            [(3, 5), (65535, 65535)], "inter_cnt long, union_cnt long"
        )
        got = sorted(
            r.k for r in ok.select(_topk_rank_key().alias("k")).collect()
        )
        assert got == [(3 * (1 << 32)) // 5, 1 << 32]

        bad = spark.createDataFrame(
            [(3, 5), (40000, 65536)], "inter_cnt long, union_cnt long"
        )
        with pytest.raises(
            (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException),
            match="token_jaccard_topk",
        ):
            bad.select(_topk_rank_key().alias("k")).collect()


class TestRegisteredCapsRefuseAdversarial:
    """The caps ARMED in the registered queries (plans/round8.py) must
    refuse a closed-vocabulary corpus whose exact candidate bound
    exceeds them — with the bound computed BEFORE the candidate join, so
    the refusal costs one vocabulary-sized aggregate, never the
    quadratic join itself."""

    def test_jaccard_cap(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from backend_big_data_spark.operators.setsimjoin import (
            SetSimCandidateBlowup,
            token_jaccard_join,
        )
        from backend_big_data_spark.plans.round8 import JACCARD_CANDIDATE_CAP

        # 16k single-token records: every prefix is that token, so the
        # bound is 16000² = 2.56e8 > 2.0e8 — tripped by 16k rows, not by
        # materializing 2.56e8 candidates.
        df = spark.range(16_000).select(
            F.col("id"), F.lit("red").alias("s")
        )
        with pytest.raises(SetSimCandidateBlowup):
            token_jaccard_join(
                df, df, 3, 5, candidate_cap=JACCARD_CANDIDATE_CAP
            )

    def test_containment_cap(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from backend_big_data_spark.operators.setsimjoin import (
            SetSimCandidateBlowup,
            token_containment_join,
        )
        from backend_big_data_spark.plans.round8 import (
            CONTAINMENT_CANDIDATE_CAP,
        )

        df = spark.range(9_000).select(F.col("id"), F.lit("red").alias("s"))
        with pytest.raises(SetSimCandidateBlowup):
            token_containment_join(
                df, df, 4, 5, candidate_cap=CONTAINMENT_CANDIDATE_CAP
            )


class TestSetSimSizingRule:
    def test_blowup_raises_and_cap_passes(self, spark):
        """A closed-vocabulary corpus (every record drawn from 4 tokens)
        must trip a tight candidate cap with the regime named; a
        generous cap runs to completion with brute-force-equal output."""
        import pytest

        from backend_big_data_spark.operators.setsimjoin import (
            SetSimCandidateBlowup,
        )

        vocab = ["red", "blue", "green", "gold"]
        rows = [
            (i, f"{a} {b}")
            for i, (a, b) in enumerate(
                (a, b) for a in vocab for b in vocab if a != b
            )
        ]
        df = _df(spark, rows)
        with pytest.raises(SetSimCandidateBlowup) as ei:
            token_jaccard_join(df, df, 1, 2, candidate_cap=10)
        assert "closed-vocabulary" in str(ei.value)
        got = sorted(
            (r.left_id, r.right_id, r.inter_cnt, r.union_cnt)
            for r in token_jaccard_join(df, df, 1, 2, candidate_cap=10_000)
            .where("left_id < right_id")
            .collect()
        )
        assert got == _brute_jaccard(rows, 1, 2)
