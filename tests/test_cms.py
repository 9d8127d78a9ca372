"""Count-Min sketch family: operator algebra (determinism, overcount
bound direction, weighted-build equivalence, merge closure, grouped
form) and the streaming sidecar's lifecycle (batch ≡ direct, replay
idempotence, negate-delta erasure parity through compaction, crash
windows, over-erasure raise, geometry pinning)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.operators.cms import (
    cms_cells,
    cms_estimate,
    cms_merge,
)
from backend_big_data_spark.sources import fsutil

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tok_frame(spark, ids):
    """(doc_id, tok) rows — doc i carries (i % 3) + 1 tokens."""
    rows = [
        (i, WORDS[(i + j) % len(WORDS)])
        for i in ids
        for j in range(i % 3 + 1)
    ]
    return spark.createDataFrame(rows, "doc_id long, tok string")


def _exact(toks):
    return toks.groupBy("tok").agg(F.count("*").cast("long").alias("n"))


def _probe_all(spark):
    return spark.createDataFrame([(w,) for w in WORDS], "tok string")


def test_cms_exact_at_wide_width_overestimates_at_narrow(spark):
    toks = _tok_frame(spark, range(40)).select("tok")
    exact = {r["tok"]: r["n"] for r in _exact(toks).collect()}
    # width far beyond 5 distinct tokens: collisions are possible but the
    # MIN over 4 independent rows recovers the exact count for this tiny
    # vocabulary with near-certainty; assert the CM guarantee (never
    # under) and exactness at width 4096.
    wide = cms_cells(toks, F.col("tok"), width=4096)
    est_w = {
        r["tok"]: r["cms_est"]
        for r in cms_estimate(
            wide, _probe_all(spark), "tok", width=4096
        ).collect()
    }
    assert est_w == exact
    # width 2 forces collisions: still never an underestimate
    narrow = cms_cells(toks, F.col("tok"), width=2)
    est_n = {
        r["tok"]: r["cms_est"]
        for r in cms_estimate(
            narrow, _probe_all(spark), "tok", width=2
        ).collect()
    }
    assert all(est_n[w] >= exact[w] for w in WORDS)


def test_cms_deterministic_across_partitionings(spark):
    toks = _tok_frame(spark, range(40)).select("tok")
    a = cms_cells(toks.repartition(7), F.col("tok"), width=64)
    b = cms_cells(toks.coalesce(1), F.col("tok"), width=64)
    assert _rows(a) == _rows(b)


def test_cms_weighted_build_equals_raw(spark):
    toks = _tok_frame(spark, range(40)).select("tok")
    raw = cms_cells(toks, F.col("tok"), width=64)
    pre = cms_cells(
        _exact(toks), F.col("tok"), weight=F.col("n"), width=64
    )
    assert _rows(raw) == _rows(pre)


def test_cms_merge_closure(spark):
    toks = _tok_frame(spark, range(40))
    direct = cms_cells(toks.select("tok"), F.col("tok"), width=64)
    sharded = cms_cells(
        toks.withColumn("__s", (F.col("doc_id") % 4).cast("int")),
        F.col("tok"),
        width=64,
        group_cols=["__s"],
    )
    merged = cms_merge(sharded.drop("__s"))
    assert _rows(direct) == _rows(merged)


def test_cms_grouped_estimates(spark):
    toks = _tok_frame(spark, range(40)).withColumn(
        "g", (F.col("doc_id") % 2).cast("int")
    )
    cells = cms_cells(
        toks, F.col("tok"), width=4096, group_cols=["g"]
    )
    probes = (
        _probe_all(spark)
        .crossJoin(spark.createDataFrame([(0,), (1,)], "g int"))
        .select("g", "tok")
    )
    est = cms_estimate(cells, probes, "tok", width=4096, group_cols=["g"])
    exact = {
        (r["g"], r["tok"]): r["n"]
        for r in toks.groupBy("g", "tok").agg(
            F.count("*").cast("long").alias("n")
        ).collect()
    }
    for r in est.collect():
        assert r["cms_est"] == exact.get((r["g"], r["tok"]), 0)


def test_cms_unseen_key_estimate_zero_at_wide_width(spark):
    toks = _tok_frame(spark, range(40)).select("tok")
    cells = cms_cells(toks, F.col("tok"), width=4096)
    probe = spark.createDataFrame([("never-seen",)], "tok string")
    [row] = cms_estimate(cells, probe, "tok", width=4096).collect()
    assert row["cms_est"] == 0


def test_cms_estimate_join_broadcasts(spark):
    toks = _tok_frame(spark, range(40)).select("tok")
    cells = cms_cells(toks, F.col("tok"), width=64)
    plan = cms_estimate(
        cells, _probe_all(spark), "tok", width=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --- streaming sidecar -------------------------------------------------


def _sidecar(spark, tmp_path, name="cms"):
    from backend_big_data_spark.streaming.cms_ingest import cms_ingest_sink

    sdir = str(tmp_path / name)
    sink = cms_ingest_sink(sdir, "tok", width=64)
    for b in range(3):
        sink(
            _tok_frame(spark, range(b * 10, b * 10 + 10)).select("tok"), b
        )
    return sdir


def test_cms_sidecar_matches_direct(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import read_cms_cells

    sdir = _sidecar(spark, tmp_path)
    direct = cms_cells(
        _tok_frame(spark, range(30)).select("tok"), F.col("tok"), width=64
    )
    assert _rows(read_cms_cells(spark, sdir)) == _rows(direct)


def test_cms_sidecar_replay_idempotent(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import (
        cms_ingest_sink,
        read_cms_cells,
    )

    sdir = _sidecar(spark, tmp_path)
    before = _rows(read_cms_cells(spark, sdir))
    sink = cms_ingest_sink(sdir, "tok", width=64)
    sink(_tok_frame(spark, range(10, 20)).select("tok"), 1)  # replay b=1
    assert _rows(read_cms_cells(spark, sdir)) == before


def test_cms_sidecar_geometry_pinned(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import cms_ingest_sink

    sdir = _sidecar(spark, tmp_path)
    other = cms_ingest_sink(sdir, "tok", width=128)
    with pytest.raises(ValueError, match="geometry"):
        other(_tok_frame(spark, [99]).select("tok"), 3)


def test_cms_post_erasure_parity_through_compaction(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import (
        compact_cms_cells,
        read_cms_cells,
        retract_from_cms_cells,
    )

    sdir = _sidecar(spark, tmp_path)
    folded = compact_cms_cells(spark, sdir, keep_latest=1)
    assert folded, "fold must have work: 3 batch deltas"
    erased_ids = [3, 11, 12, 25]
    res = retract_from_cms_cells(
        spark, sdir, _tok_frame(spark, erased_ids).select("tok"), "tok"
    )
    assert res["dir"] == "delta=-1" and res["cells_negated"] > 0
    surviving = _tok_frame(
        spark, [i for i in range(30) if i not in erased_ids]
    ).select("tok")
    direct = cms_cells(surviving, F.col("tok"), width=64)
    assert _rows(read_cms_cells(spark, sdir)) == _rows(direct)
    # estimates served from maintained state match the rebuilt sketch
    est_m = cms_estimate(
        read_cms_cells(spark, sdir), _probe_all(spark), "tok", width=64
    )
    est_d = cms_estimate(direct, _probe_all(spark), "tok", width=64)
    assert _rows(est_m) == _rows(est_d)


def test_cms_erasure_crash_window_rolls_forward(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import read_cms_cells

    sdir = _sidecar(spark, tmp_path)
    neg = cms_cells(
        _tok_frame(spark, [0, 1]).select("tok"), F.col("tok"), width=64
    ).withColumn("n", -F.col("n"))
    neg.write.mode("overwrite").parquet(f"{sdir}/_erasing_1")
    fsutil.write_text_atomic(
        spark,
        f"{sdir}/_erase_journal.json",
        json.dumps({"dir": "delta=-1", "tmp": "_erasing_1"}),
    )
    maintained = read_cms_cells(spark, sdir)  # recovery on entry
    assert not fsutil.exists(spark, f"{sdir}/_erase_journal.json")
    direct = cms_cells(
        _tok_frame(spark, range(2, 30)).select("tok"), F.col("tok"), width=64
    )
    assert _rows(maintained) == _rows(direct)


def test_cms_erasure_precommit_crash_rolls_back(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import read_cms_cells

    sdir = _sidecar(spark, tmp_path)
    cms_cells(
        _tok_frame(spark, [0, 1]).select("tok"), F.col("tok"), width=64
    ).withColumn("n", -F.col("n")).write.mode("overwrite").parquet(
        f"{sdir}/_erasing_1"
    )
    maintained = read_cms_cells(spark, sdir)
    direct = cms_cells(
        _tok_frame(spark, range(30)).select("tok"), F.col("tok"), width=64
    )
    assert _rows(maintained) == _rows(direct)
    assert not fsutil.exists(spark, f"{sdir}/delta=-1")


def test_cms_over_erasure_raises(spark, tmp_path):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from backend_big_data_spark.streaming.cms_ingest import (
        read_cms_cells,
        retract_from_cms_cells,
    )

    sdir = _sidecar(spark, tmp_path)
    never = spark.createDataFrame(
        [("omega",)] * 50, "tok string"
    )  # 50 hits on cells that never saw this mass
    retract_from_cms_cells(spark, sdir, never, "tok")
    with pytest.raises(SparkRuntimeException, match="CmsCellNegative"):
        read_cms_cells(spark, sdir).collect()


def test_cms_retract_without_meta_raises(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import (
        retract_from_cms_cells,
    )

    with pytest.raises(ValueError, match="geometry meta"):
        retract_from_cms_cells(
            spark,
            str(tmp_path / "empty"),
            _tok_frame(spark, [0]).select("tok"),
            "tok",
        )


def test_cms_candidate_log_bounded_and_idempotent(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import (
        cms_candidate_keys,
        cms_ingest_sink,
    )

    sdir = str(tmp_path / "cmsc")
    sink = cms_ingest_sink(sdir, "tok", width=64, candidates_k=2)
    for b in range(3):
        sink(_tok_frame(spark, range(b * 10, b * 10 + 10)).select("tok"), b)
    cands = cms_candidate_keys(spark, sdir)
    n = cands.count()
    assert 0 < n <= 2 * 3  # ≤ k·batches, never vocabulary-sized
    before = _rows(cands)
    sink(_tok_frame(spark, range(10, 20)).select("tok"), 1)  # replay
    assert _rows(cms_candidate_keys(spark, sdir)) == before
    # per-batch top-k is deterministic: heaviest batch token always kept
    batch0 = _tok_frame(spark, range(10)).select("tok")
    top0 = (
        batch0.groupBy("tok").count().orderBy(F.desc("count"), "tok").first()
    )
    assert (top0["tok"],) in before


def test_cms_candidates_grouped_unsupported(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import cms_ingest_sink

    with pytest.raises(ValueError, match="ungrouped"):
        cms_ingest_sink(
            str(tmp_path / "x"), "tok", candidates_k=4, group_cols=["g"]
        )


def test_cms_candidate_log_absent_returns_none(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import (
        cms_candidate_keys,
    )

    sdir = _sidecar(spark, tmp_path, "nocand")
    assert cms_candidate_keys(spark, sdir) is None


def test_cms_grouped_sidecar_matches_direct(spark, tmp_path):
    """Grouped sink: the reader recovers group_cols from the pinned meta
    and merges per-group cells identically to a direct grouped build."""
    from backend_big_data_spark.streaming.cms_ingest import (
        cms_ingest_sink,
        read_cms_cells,
    )

    sdir = str(tmp_path / "cmsg")
    sink = cms_ingest_sink(sdir, "tok", width=64, group_cols=["g"])
    frame = _tok_frame(spark, range(30)).withColumn(
        "g", (F.col("doc_id") % 2).cast("int")
    )
    for b in range(3):
        sink(frame.where(F.col("doc_id") % 3 == b).select("g", "tok"), b)
    direct = cms_cells(
        frame.select("g", "tok"), F.col("tok"), width=64, group_cols=["g"]
    )
    assert _rows(read_cms_cells(spark, sdir)) == _rows(direct)


def test_cms_sink_batches_overlap_safely(spark, tmp_path):
    """Concurrent batch sinks (the guide-§2.6 overlapped-ingest shape the
    round-12 certificate queries use) must not race on the shared
    geometry sidecar: the delta dirs are disjoint, but _ensure_meta's
    first-writer write goes through one fixed tmp path — unserialized,
    two first writers deleted it from under each other (chmod ENOENT).
    Run the three batches from a pool repeatedly and assert the merged
    cells equal a direct build."""
    from concurrent.futures import ThreadPoolExecutor

    from backend_big_data_spark.streaming.cms_ingest import (
        cms_ingest_sink,
        read_cms_cells,
    )

    frame = _tok_frame(spark, range(30)).select("doc_id", "tok")
    direct = _rows(cms_cells(frame.select("tok"), F.col("tok"), width=64))
    for trial in range(3):
        sdir = str(tmp_path / f"cms_conc{trial}")
        sink = cms_ingest_sink(sdir, "tok", width=64)
        with ThreadPoolExecutor(max_workers=3) as pool:
            futures = [
                pool.submit(
                    sink,
                    frame.where(F.col("doc_id") % 3 == b).select("tok"),
                    b,
                )
                for b in range(3)
            ]
            for f in futures:
                f.result()  # raises if any batch hit the meta race
        assert _rows(read_cms_cells(spark, sdir)) == direct
