"""Streaming entity resolution (`streaming/linkage_ingest.py`).

Covers the family's standard contract: link-vs-admit semantics, the
documented batch-internal compromise, stream ≡ sequential-batch
equivalence, replay idempotency, fold compaction leaving results
unchanged, and the no-Exchange-above-the-index-scan plan guarantee.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from backend_big_data_spark.streaming.linkage_ingest import (
    compact_linkage_master,
    link_batch,
    linkage_ingest_sink,
    read_master,
    read_master_gram_freq,
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

    @pytest.mark.slow
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

    @pytest.mark.slow
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

    def test_gramfreq_sidecar_matches_index_aggregate(self, spark, tmp_path):
        """Admission-maintained per-gram counts, summed across batch
        dirs, must equal the full index's groupBy count exactly — the
        invariant that makes the sidecar-ranked probe bit-identical to
        the on-the-fly aggregate's."""
        mdir = str(tmp_path / "m")
        _run_two_batches(spark, mdir)
        maintained = {
            (r.gram, r.cnt)
            for r in read_master_gram_freq(spark, mdir)
            .groupBy("gram")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        on_the_fly = {
            (r.gram, r["count"])
            for r in read_master_grams(spark, mdir).groupBy("gram").count().collect()
        }
        assert maintained == on_the_fly

    def test_gramfreq_reader_falls_back_when_uncovered(self, spark, tmp_path):
        import shutil

        mdir = str(tmp_path / "m")
        _run_two_batches(spark, mdir)
        shutil.rmtree(f"{mdir}/gramfreq/batch=0")  # pre-sidecar layout
        assert read_master_gram_freq(spark, mdir) is None

    def test_links_identical_with_and_without_freq_sidecar(self, spark, tmp_path):
        mdir = str(tmp_path / "m")
        linkage_ingest_sink(mdir)(_df(spark, B1), 0)
        master = read_master(spark, mdir)
        grams = read_master_grams(spark, mdir)
        gfreq = read_master_gram_freq(spark, mdir)
        assert gfreq is not None
        with_freq = sorted(
            map(tuple, link_batch(_df(spark, B2), master, grams,
                                  master_gram_freq=gfreq).collect())
        )
        without = sorted(
            map(tuple, link_batch(_df(spark, B2), master, grams).collect())
        )
        assert with_freq == without

    def test_compaction_folds_gramfreq_in_lockstep(self, spark, tmp_path):
        mdir = str(tmp_path / "m")
        sink = linkage_ingest_sink(mdir)
        sink(_df(spark, B1), 0)
        sink(_df(spark, [(20, "delta shipping lines")]), 1)
        sink(_df(spark, [(21, "epsilon freight group")]), 2)
        before = {
            (r.gram, r.cnt)
            for r in read_master_gram_freq(spark, mdir)
            .groupBy("gram").agg(F.sum("cnt").alias("cnt")).collect()
        }
        assert compact_linkage_master(spark, mdir, keep_latest=1) == [0, 1]
        after_df = read_master_gram_freq(spark, mdir)
        assert after_df is not None, "folded layout must stay covered"
        after = {
            (r.gram, r.cnt)
            for r in after_df.groupBy("gram").agg(F.sum("cnt").alias("cnt")).collect()
        }
        assert after == before

    def test_freq_ranked_probe_scans_index_once(self, spark, tmp_path):
        """The maintained-freq ranking must remove the probe's aggregate
        over the full (id, gram) index: with ``master_gram_freq`` the
        plan scans the index parquet exactly once (the candidate join);
        the on-the-fly ranking scans it twice (aggregate + join)."""
        mdir = str(tmp_path / "m")
        linkage_ingest_sink(mdir)(_df(spark, B1), 0)
        master = read_master(spark, mdir)
        grams = read_master_grams(spark, mdir)
        gfreq = read_master_gram_freq(spark, mdir)

        import re

        def index_scans(df):
            # the plan truncates file paths, so index scans are told
            # apart by column sets: the (id, gram) index surfaces as
            # [id#,gram#,batch#] (candidate join) or pruned [gram#,batch#]
            # (the on-the-fly frequency aggregate); the gramfreq sidecar
            # carries cnt#, the master strings carry s#
            plan = df._jdf.queryExecution().executedPlan().toString()
            return sum(
                1
                for ln in plan.splitlines()
                if "FileScan parquet" in ln
                and re.search(r"gram#\d+", ln)
                and not re.search(r"cnt#\d+|\bs#\d+", ln)
            )

        from backend_big_data_spark.operators.fuzzyjoin import (
            edit_distance_join_indexed,
        )

        with_freq = edit_distance_join_indexed(
            _df(spark, B2), grams, master, index_freq=gfreq
        )
        on_the_fly = edit_distance_join_indexed(
            _df(spark, B2), grams, master, rank_by_index_freq=True
        )
        # maintained freq: the probe's ONLY contact with the full index
        # is the single candidate-join scan — no aggregate pass over it
        assert index_scans(with_freq) == 1
        # on-the-fly ranking pays a second full-index scan to aggregate
        assert index_scans(on_the_fly) == 2

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


class TestLinkageTopkLinkMode:
    @pytest.mark.slow
    def test_topk_links_are_deterministic_closest(self, spark, tmp_path):
        """topk mode emits each batch record's k CLOSEST masters
        (edit_dist ASC, master_id ASC) while ADMISSION stays identical
        to all-pairs mode — the setsim sink's best-match contract on
        the edit-distance family."""
        mdir = str(tmp_path / "m")
        sink = linkage_ingest_sink(mdir, link_mode="topk", k=1)
        sink(_df(spark, B1), 0)
        sink(_df(spark, B2), 1)
        # record 10 is ed 1 from master 1 and ed 2 from master 3: top-1
        # is master 1 only
        got = sorted(
            (r.dirty_id, r.master_id, r.rank, r.edit_dist)
            for r in spark.read.parquet(f"{mdir}/links/batch=1").collect()
        )
        assert got == [(10, 1, 1, 1), (12, 2, 1, 1)]
        # admission is mode-independent
        adir = str(tmp_path / "a")
        _run_two_batches(spark, adir)
        assert _master_rows(spark, mdir) == _master_rows(spark, adir)

    def test_k2_emits_ranked_runners_up(self, spark, tmp_path):
        mdir = str(tmp_path / "m")
        sink = linkage_ingest_sink(mdir, link_mode="topk", k=2)
        sink(_df(spark, B1), 0)
        sink(_df(spark, B2), 1)
        got = sorted(
            (r.dirty_id, r.master_id, r.rank)
            for r in spark.read.parquet(f"{mdir}/links/batch=1").collect()
        )
        assert got == [(10, 1, 1), (10, 3, 2), (12, 2, 1)]

    def test_bad_mode_raises(self, spark, tmp_path):
        import pytest

        with pytest.raises(ValueError, match="link_mode"):
            linkage_ingest_sink(str(tmp_path / "m"), link_mode="nearest")


class TestGramBucketedFold:
    """Round 12: the BM25 term-bucket fold applied to the gram index —
    bucketed at-rest layout, mixed-layout reader, directory-level probe
    prune, sticky width, layout-preserving erasure."""

    def _probe(self, spark, rows):
        return _df(spark, rows)

    def _seed(self, spark, mdir):
        from backend_big_data_spark.streaming.linkage_ingest import (
            seed_master_batch,
        )

        seed_master_batch(spark, mdir, _df(spark, B1[:2]), 0)
        seed_master_batch(spark, mdir, _df(spark, [B1[2]]), 1)

    def _served(self, spark, mdir, probe):
        from backend_big_data_spark.operators.fuzzyjoin import (
            edit_distance_join_indexed,
        )
        from backend_big_data_spark.streaming.linkage_ingest import (
            probe_master_grams,
        )

        index = probe_master_grams(spark, mdir, probe)
        return sorted(
            (r.left_id, r.right_id, r.edit_dist)
            for r in edit_distance_join_indexed(
                probe,
                index,
                read_master(spark, mdir),
                max_dist=2,
                index_freq=read_master_gram_freq(spark, mdir),
            ).collect()
        )

    def test_bucketed_fold_preserves_links(self, spark, tmp_path):
        """Folding the gram index into the bucketed layout changes only
        the at-rest structure: the pruned probe over it equals the probe
        over the flat layout."""
        mdir = str(tmp_path / "m")
        self._seed(spark, mdir)
        probe = self._probe(spark, B2)
        want = self._served(spark, mdir, probe)
        assert want, "probe must link something"
        compact_linkage_master(spark, mdir, keep_latest=0, gram_buckets=4)
        assert self._served(spark, mdir, probe) == want

    def test_probe_prunes_partitions(self, spark, tmp_path):
        """The probe's bucket set must appear as a PARTITION filter on
        the gram-index scan — a directory-level prune."""
        import contextlib
        import io

        from backend_big_data_spark.streaming.linkage_ingest import (
            probe_master_grams,
        )

        mdir = str(tmp_path / "m")
        self._seed(spark, mdir)
        compact_linkage_master(spark, mdir, keep_latest=0, gram_buckets=4)
        index = probe_master_grams(spark, mdir, self._probe(spark, B2))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            index.explain("formatted")
        plan = buf.getvalue()
        part_lines = [
            line for line in plan.splitlines() if "PartitionFilters" in line
        ]
        assert any("__gb" in line for line in part_lines), part_lines

    @pytest.mark.slow
    def test_mixed_layout_and_sticky_width(self, spark, tmp_path):
        """A batch seeded AFTER the bucketed fold stays flat; the reader
        unions the mixed layout (bulk pruned, tail scanned), and the
        next compaction re-buckets everything at the recorded width."""
        import json as _json

        from backend_big_data_spark.sources import fsutil
        from backend_big_data_spark.streaming.linkage_ingest import (
            seed_master_batch,
        )

        mdir = str(tmp_path / "m")
        self._seed(spark, mdir)
        compact_linkage_master(spark, mdir, keep_latest=0, gram_buckets=4)
        seed_master_batch(
            spark, mdir, _df(spark, [(20, "gamma fabrication works")]), 2
        )  # flat tail
        probe = self._probe(spark, B2)
        got = self._served(spark, mdir, probe)
        assert (11, 20, 0) in got, "flat-tail master must be probe-visible"
        compact_linkage_master(spark, mdir, keep_latest=0)  # sticky width
        meta = _json.loads(
            fsutil.read_text(spark, f"{mdir}/grams/_gram_buckets.json")
        )
        assert meta == {"n_buckets": 4}
        assert self._served(spark, mdir, probe) == got

    @pytest.mark.slow
    def test_retraction_preserves_bucketed_layout(self, spark, tmp_path):
        """Erasure through the bucketed layout: the gram purge rewrites
        the bucketed dir PARTITIONED BY __gb (layout preserved), the
        erased entity's grams are gone, and the probe serves only
        survivors."""
        from backend_big_data_spark.sources import fsutil
        from backend_big_data_spark.streaming.linkage_ingest import (
            seed_master_batch,
        )
        from backend_big_data_spark.streaming.retraction import (
            retract_from_linkage_master,
        )

        mdir = str(tmp_path / "m")
        self._seed(spark, mdir)
        compact_linkage_master(spark, mdir, keep_latest=0, gram_buckets=4)
        seed_master_batch(
            spark, mdir, _df(spark, [(20, "gamma fabrication works")]), 2
        )  # flat tail — erasure must handle the MIXED layout probe
        out = retract_from_linkage_master(spark, mdir, [1])
        assert out["rows_removed"] == 1
        grams = read_master_grams(spark, mdir)
        assert grams.filter(F.col("id") == 1).count() == 0
        sub = fsutil.list_subdirs(spark, f"{mdir}/grams/batch=0", prefix="__gb=")
        assert sub, "gram purge must preserve the bucketed layout"
        got = self._served(spark, mdir, self._probe(spark, B2))
        assert all(m != 1 for _, m, _ in got), "erased master must not link"
        assert (12, 2, 1) in got, "surviving masters still link"
