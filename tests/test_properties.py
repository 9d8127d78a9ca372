"""Property-based tests (SURVEY.md §5.2): pagination partitions the ordered
result exactly, union+dedup idempotence, argmax-of-struct equals
sort-desc-first, minhash estimate bounds. Hypothesis drives the inputs;
example counts are capped because each example is a Spark job."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from backend_big_data_spark.operators.aggregates import argmax_per_group
from backend_big_data_spark.operators.windows import paginate

_settings = settings(max_examples=8, deadline=None)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),          # id (may repeat)
        st.integers(min_value=-5, max_value=5),          # group key
        st.integers(min_value=-1000, max_value=1000),    # value
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy, page_size=st.integers(min_value=1, max_value=7))
@_settings
@pytest.mark.slow
def test_pagination_partitions_ordered_result(spark, rows, page_size):
    df = spark.createDataFrame(rows, "id long, grp long, val long").dropDuplicates(["id"])
    expected = [r.id for r in df.orderBy("id").collect()]
    got: list[int] = []
    page = 1
    while True:
        chunk = [r.id for r in paginate(df, ["id"], page, page_size).collect()]
        if not chunk:
            break
        got.extend(chunk)
        page += 1
    assert got == expected  # concatenated pages == total order, no gaps/dups


@given(rows=rows_strategy)
@_settings
def test_union_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "id long, grp long, val long")
    once = df.unionByName(df).dropDuplicates(["id"])
    twice = once.unionByName(once).dropDuplicates(["id"])
    assert sorted(r.id for r in once.collect()) == sorted(
        r.id for r in twice.collect()
    )
    assert once.count() == df.select("id").distinct().count()


@given(rows=rows_strategy)
@_settings
def test_argmax_struct_equals_sort_desc_first(spark, rows):
    df = spark.createDataFrame(rows, "id long, grp long, val long")
    got = {
        r.grp: (r.win_val, r.win_id)
        for r in argmax_per_group(
            df,
            group_by=["grp"],
            order_cols=[F.col("val"), F.col("id")],
            payload={"win_val": F.col("val"), "win_id": F.col("id")},
        ).collect()
    }
    want = {}
    for rid, grp, val in rows:
        cur = want.get(grp)
        if cur is None or (val, rid) > cur:
            want[grp] = (val, rid)
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=12, max_size=60
        ),
        min_size=2,
        max_size=6,
    )
)
@_settings
def test_minhash_estimates_bounded_and_canonical(spark, texts):
    from backend_big_data_spark.text.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = doc_shingles(df)
    pairs = lsh_candidate_pairs(minhash_signatures(sh, 8), 8, 2).collect()
    for r in pairs:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.doc_a < r.doc_b          # canonical orientation, no dupes
    keys = [(r.doc_a, r.doc_b) for r in pairs]
    assert len(keys) == len(set(keys))


grid_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),                # source
        st.integers(min_value=0, max_value=250),         # bucket
        st.integers(min_value=1, max_value=20),          # n_docs
        st.integers(min_value=1, max_value=5000),        # toks
    ),
    min_size=1,
    max_size=25,
)


@given(cells=grid_strategy)
@_settings
def test_calibration_threshold_is_optimal(spark, cells):
    """The chosen threshold keeps >= 70% of tokens, AND is the HIGHEST
    such threshold: raising it to the next occupied bucket must break
    the budget. Verified against a driver-side brute force."""
    from backend_big_data_spark.plans.round6c import calibration_from_grid

    grid = (
        spark.createDataFrame(
            cells, "source string, bucket long, n_docs long, toks long"
        )
        .groupBy("source", "bucket")
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("toks").alias("toks"))
    )
    out = calibration_from_grid(grid).collect()
    tstar = out[0].threshold_bucket
    assert all(r.threshold_bucket == tstar for r in out)
    hist: dict[int, int] = {}
    for _, bucket, _, toks in cells:
        hist[bucket] = hist.get(bucket, 0) + toks
    total = sum(hist.values())
    kept = sum(t for b, t in hist.items() if b >= tstar)
    assert 10 * kept >= 7 * total  # budget met
    higher = sorted(b for b in hist if b > tstar)
    if higher:
        kept_next = sum(t for b, t in hist.items() if b >= higher[0])
        assert 10 * kept_next < 7 * total  # minimal overshoot
    # per-source sums agree with the brute force
    for r in out:
        want = sum(t for s, b, _, t in cells if s == r.source and b >= tstar)
        assert r.kept_tokens == want


@given(
    hashes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    flips=st.lists(st.integers(min_value=0, max_value=63), max_size=3),
)
@_settings
def test_dhash_banding_lossless_radius3(spark, hashes, flips):
    """Banded blocking finds EVERY pair within Hamming distance 3 —
    including a crafted pair built by flipping <= 3 bits of an existing
    hash — matching a brute-force scan exactly."""
    from backend_big_data_spark.multimodal.phash import hamming_near_dup_pairs

    crafted = hashes[0]
    for bit in set(flips):
        crafted ^= 1 << bit
    crafted &= (1 << 64) - 1  # two's-complement wrap to signed 64-bit
    crafted = crafted - (1 << 64) if crafted >= (1 << 63) else crafted
    vals = list(dict.fromkeys(hashes + [crafted]))
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(vals)], "media_id long, dhash long"
    )
    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in hamming_near_dup_pairs(df, max_distance=3).collect()
    }
    want = {}
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            d = bin((vals[i] ^ vals[j]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(i, j)] = d
    assert got == want


@given(
    n_tokens=st.integers(min_value=12, max_value=40),
    ins_pos=st.integers(min_value=0, max_value=39),
    seed=st.integers(min_value=0, max_value=10**6),
)
@_settings
def test_cdc_chunks_resynchronize_property(spark, tmp_path_factory, n_tokens, ins_pos, seed):
    """For ANY document and ANY single-token insertion, every CDC chunk
    that does not contain the edit survives verbatim — dup token mass
    between original and edited copy >= 2 * (total chunk tokens outside
    the edited chunk), computed by replicating the chunking in Python."""
    import hashlib
    import os

    from backend_big_data_spark.plans.all_plans import QUERIES

    def is_boundary(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8 == 0

    def chunks_of(toks):
        out, cur = [], []
        for t in toks:
            if is_boundary(t) and cur:
                out.append(cur)
                cur = []
            cur.append(t)
        if cur:
            out.append(cur)
        return out

    rng = __import__("random").Random(seed)
    toks = [f"s{seed}_t{i}_{rng.randint(0, 9)}" for i in range(n_tokens)]
    pos = min(ins_pos, n_tokens)
    ins = f"s{seed}_ins"
    edited = toks[:pos] + [ins] + toks[pos:]
    base_chunks = [" ".join(c) for c in chunks_of(toks)]
    edit_chunks = [" ".join(c) for c in chunks_of(edited)]
    shared = set(base_chunks) & set(edit_chunks)
    expect_dup = sum(
        len(c.split())
        for chunk_list in (base_chunks, edit_chunks)
        for c in chunk_list
        if c in shared and base_chunks.count(c) + edit_chunks.count(c) > 1
    )
    d = str(tmp_path_factory.mktemp("cdc_prop"))
    spark.createDataFrame(
        [(1, " ".join(toks), "a"), (2, " ".join(edited), "a")],
        "doc_id long, text string, source string",
    ).write.parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["doc_cdc_chunk_dups"](spark, d).collect()[0]
    assert out.dup_chunk_tokens >= expect_dup
    assert out.total_tokens == 2 * n_tokens + 1


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["red", "blue", "gold", "plum", "teal", "gray", "the", "x"]
            ),
            min_size=0,
            max_size=6,
        ).map(" ".join),
        min_size=2,
        max_size=12,
    ),
    t=st.sampled_from([(1, 2), (3, 5), (2, 3)]),
)
@_settings
def test_token_jaccard_join_equals_brute_force(spark, texts, t):
    """Property form of the set-sim result-invariance claim: on random
    small-vocab corpora (heavy skew, empty strings, duplicate tokens)
    the prefix-filtered join equals brute-force Jaccard at every
    threshold — blocking must never change the answer."""
    from backend_big_data_spark.operators.setsimjoin import (
        token_jaccard_join,
    )

    t_num, t_den = t
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.left_id, r.right_id, r.inter_cnt, r.union_cnt)
        for r in token_jaccard_join(df, df, t_num, t_den)
        .where("left_id < right_id")
        .collect()
    )
    want = []
    for (i, a), (j, b) in __import__("itertools").combinations(rows, 2):
        ta, tb = set(a.split()) - {""}, set(b.split()) - {""}
        if not ta or not tb:
            continue
        inter, union = len(ta & tb), len(ta | tb)
        if inter * t_den >= union * t_num:
            want.append((i, j, inter, union))
    assert got == sorted(want)


tokens_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abcdef", min_size=1, max_size=4),  # key
        st.integers(min_value=0, max_value=3),               # shard
    ),
    min_size=1,
    max_size=60,
)


@given(toks=tokens_strategy, width=st.sampled_from([2, 8, 64]))
@_settings
@pytest.mark.slow
def test_cms_never_underestimates_and_merges_losslessly(spark, toks, width):
    """CM sketch invariants on arbitrary multisets at arbitrary widths:
    every estimate ≥ the true count (cells only accumulate non-negative
    mass), and per-shard sketches merged by cell sum equal the
    single-pass sketch (additivity) — so estimates from the merged
    sketch are identical too."""
    from backend_big_data_spark.operators.cms import (
        cms_cells,
        cms_estimate,
        cms_merge,
    )

    df = spark.createDataFrame(toks, "tok string, shard int")
    exact = {
        r["tok"]: r["n"]
        for r in df.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    direct = cms_cells(df.select("tok"), F.col("tok"), width=width)
    probes = df.select("tok").distinct()
    est = {
        r["tok"]: r["cms_est"]
        for r in cms_estimate(direct, probes, "tok", width=width).collect()
    }
    assert all(est[t] >= n for t, n in exact.items())
    sharded = cms_cells(
        df, F.col("tok"), width=width, group_cols=["shard"]
    )
    merged = cms_merge(sharded.drop("shard"))
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )
