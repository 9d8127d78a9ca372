"""Streaming entity resolution (`streaming/linkage_ingest.py`).

Covers the family's standard contract: link-vs-admit semantics, the
documented batch-internal compromise, stream ≡ sequential-batch
equivalence, replay idempotency, fold compaction leaving results
unchanged, and the no-Exchange-above-the-index-scan plan guarantee.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.streaming.linkage_ingest import (
    compact_linkage_master,
    link_batch,
    linkage_ingest_sink,
    read_master,
    read_master_grams,
)

B1 = [
    (1, "alpha consolidated mills"),
    (2, "beta containers corp"),
    (3, "alpha consolidated millz"),  # batch-internal NEAR-dup of 1
    (4, "beta containers corp"),  # batch-internal EXACT dup of 2
]
B2 = [
    (10, "alpha consolidated millsx"),  # ed 1 of master 1, ed 2 of master 3
    (11, "gamma fabrication works"),  # novel
    (12, "beta containers korp"),  # ed 1 of master 2
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string")


def _master_rows(spark, mdir):
    return sorted((r.id, r.s) for r in read_master(spark, mdir).collect())


def _links(spark, mdir, batch_id):
    return sorted(
        (r.dirty_id, r.master_id, r.edit_dist)
        for r in spark.read.parquet(f"{mdir}/links/batch={batch_id}").collect()
    )


def _run_two_batches(spark, mdir):
    sink = linkage_ingest_sink(mdir)
    sink(_df(spark, B1), 0)
    sink(_df(spark, B2), 1)


class TestLinkageSink:
    def test_link_admit_semantics(self, spark, tmp_path):
        mdir = str(tmp_path / "m")
        _run_two_batches(spark, mdir)
        # batch 0: empty master → no links; exact dup 4 resolved to 2;
        # near-dup 3 admitted alongside 1 (documented compromise)
        assert _links(spark, mdir, 0) == []
        assert _master_rows(spark, mdir) == sorted(
            [(1, B1[0][1]), (2, B1[1][1]), (3, B1[2][1]), (11, B2[1][1])]
        )
        # batch 1: 10 links to BOTH nearby masters, 12 to its master
        assert _links(spark, mdir, 1) == [(10, 1, 1), (10, 3, 2), (12, 2, 1)]
        # the gram index grew in lockstep with the master
        idx_ids = {r.id for r in read_master_grams(spark, mdir).collect()}
        assert idx_ids == {1, 2, 3, 11}

    def test_replay_idempotent(self, spark, tmp_path):
        mdir = str(tmp_path / "m")
        _run_two_batches(spark, mdir)
        before = (_master_rows(spark, mdir), _links(spark, mdir, 1))
        linkage_ingest_sink(mdir)(_df(spark, B2), 1)  # at-least-once retry
        after = (_master_rows(spark, mdir), _links(spark, mdir, 1))
        assert before == after

    def test_stream_matches_sequential_batches(self, spark, tmp_path):
        from backend_big_data_spark.streaming.linkage_ingest import (
            linkage_ingest_stream,
        )

        in_dir = tmp_path / "in"
        in_dir.mkdir()
        _df(spark, B1).coalesce(1).write.parquet(str(in_dir / "b1"))
        _df(spark, B2).coalesce(1).write.parquet(str(in_dir / "b2"))
        sdir = str(tmp_path / "stream_master")
        stream = (
            spark.readStream.schema("id long, s string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir / "*"))
        )
        q = linkage_ingest_stream(stream, sdir, checkpoint=str(tmp_path / "ck"))
        q.awaitTermination(120)

        tdir = str(tmp_path / "twin_master")
        _run_two_batches(spark, tdir)
        assert _master_rows(spark, sdir) == _master_rows(spark, tdir)
        assert _links(spark, sdir, 1) == _links(spark, tdir, 1)

    def test_compaction_preserves_results(self, spark, tmp_path):
        mdir = str(tmp_path / "m")
        sink = linkage_ingest_sink(mdir)
        sink(_df(spark, B1), 0)
        sink(_df(spark, [(20, "delta shipping lines")]), 1)
        sink(_df(spark, [(21, "epsilon freight group")]), 2)
        before = _master_rows(spark, mdir)
        folded = compact_linkage_master(spark, mdir, keep_latest=1)
        assert folded == [0, 1]
        assert _master_rows(spark, mdir) == before
        # probing after the fold still links correctly against everything
        sink(_df(spark, B2), 3)
        assert _links(spark, mdir, 3) == [(10, 1, 1), (10, 3, 2), (12, 2, 1)]
        # gram index folded in lockstep and still covers all masters
        idx_ids = {r.id for r in read_master_grams(spark, mdir).collect()}
        assert idx_ids == {r[0] for r in _master_rows(spark, mdir)}

    def test_probe_plan_no_exchange_above_index_scan(self, spark, tmp_path):
        """The maintained gram index must feed the broadcast join via a
        map-side scan: no Exchange may hash-partition the index between
        its parquet scan and the first join (the family's no-corpus-
        shuffle discipline, same assertion as the text sink's fp probe).
        """
        mdir = str(tmp_path / "m")
        linkage_ingest_sink(mdir)(_df(spark, B1), 0)
        master = read_master(spark, mdir, exclude_batch=1)
        grams = read_master_grams(spark, mdir, exclude_batch=1)
        out = link_batch(_df(spark, B2), master, grams)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        lines = plan.splitlines()
        scan_lines = [
            i
            for i, ln in enumerate(lines)
            if "Scan parquet" in ln and "gram" in ln
        ]
        assert scan_lines, "gram index scan not found in plan"

        def indent(s):
            return len(s) - len(s.lstrip(" :+-*"))

        import re

        for si in scan_lines:
            ind = indent(lines[si])
            for j in range(si - 1, -1, -1):
                if indent(lines[j]) < ind:
                    txt = lines[j]
                    if "Exchange" in txt:
                        raise AssertionError(
                            f"Exchange above index scan: {txt.strip()}"
                        )
                    if re.search(r"Join|Union", txt):
                        break
                    ind = indent(lines[j])
