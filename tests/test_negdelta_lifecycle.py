"""Scripted lifecycle interleavings for the two exactly-subtractable
maintained logs (drift token counts, CMS cells): ingest, at-least-once
REPLAY, journaled negate-delta ERASURE, and compaction FOLD applied in
adversarial orders, with one invariant checked after every step —
maintained state ≡ a from-scratch rebuild over exactly the live
document set. The per-operation crash windows are matrixed elsewhere
(test_erasure_readout_parity.py, test_cms.py); this file covers the
COMPOSITIONS those single-shot tests cannot: erase-then-replay (the
replayed batch re-writes its original delta while the negate delta
stands), fold-then-erase-then-fold (negate rows summing away inside a
folded directory), and multiple sequential erasures (delta=-1, -2, …
id allocation under an already-negative log)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from backend_big_data_spark.operators.cms import cms_cells

WORDS = ["ash", "birch", "cedar", "fir", "oak", "pine", "yew"]


def _docs(spark, ids):
    rows = [
        (i, " ".join(WORDS[(i + j) % len(WORDS)] for j in range(i % 4 + 1)))
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


#: Each script is a list of ops over batches 0/1/2 (10 docs each):
#: ("ingest", b) / ("replay", b) / ("erase", [doc ids]) / ("fold",).
#: Composed to hit the interleavings the single-shot tests don't.
#:
#: Replays stay within the compaction contract (maintenance.py module
#: docstring): a batch may replay only while its directory still exists
#: — ``keep_latest`` spares the newest directory precisely because
#: Structured Streaming replays at most the batches after the last
#: committed checkpoint. Replaying a batch whose directory was folded
#: away double-counts BY DESIGN (verified while building this file);
#: the guard against it is the keep_latest window, not reader-side
#: detection.
SCRIPTS = [
    # erase between original play and replay; then fold everything
    [("ingest", 0), ("ingest", 1), ("erase", [3, 11]), ("replay", 1),
     ("ingest", 2), ("fold",)],
    # fold early, erase with a folded dir in scope, fold again with the
    # negate delta folding through, then replay the newest (unfolded)
    [("ingest", 0), ("ingest", 1), ("fold",), ("erase", [5, 15]),
     ("ingest", 2), ("fold",), ("replay", 2)],
    # sequential erasures (negative id allocation) with replays between
    [("ingest", 0), ("ingest", 1), ("ingest", 2), ("erase", [1]),
     ("erase", [12, 22]), ("replay", 2), ("erase", [7]), ("fold",)],
]


def _batch_ids(i):
    return range(i * 10, i * 10 + 10)


def _live_ids(played, erased):
    live = set()
    for b in played:
        live |= set(_batch_ids(b))
    return sorted(live - erased)


def _run_script(spark, script, ingest, replay, erase, fold, rebuild, read):
    """Drive one script, asserting maintained ≡ rebuild after EVERY op.

    A replayed batch rewrites its own delta from the ORIGINAL batch
    content (at-least-once delivery of the same data); erased docs stay
    erased through replays because the negate delta is a separate
    directory the replay never touches."""
    played: set[int] = set()
    erased: set[int] = set()
    for step, op in enumerate(script):
        if op[0] == "ingest":
            ingest(op[1])
            played.add(op[1])
        elif op[0] == "replay":
            assert op[1] in played
            replay(op[1])
        elif op[0] == "erase":
            erase(list(op[1]))
            erased |= set(op[1])
        else:
            fold()
        live = _live_ids(played, erased)
        assert _rows(read()) == _rows(rebuild(live)), (
            f"maintained state diverged from rebuild after step {step} "
            f"({op}) of {script}"
        )


@pytest.mark.slow
def test_drift_counts_lifecycle_interleavings(spark, tmp_path):
    from backend_big_data_spark.streaming.drift_monitor import (
        retract_from_drift_counts,
        read_corpus_counts,
        token_counts,
    )
    from backend_big_data_spark.streaming.maintenance import (
        compact_drift_counts,
    )

    for si, script in enumerate(SCRIPTS):
        cdir = str(tmp_path / f"dc{si}")

        def ingest(b, cdir=cdir):
            token_counts(_docs(spark, _batch_ids(b))).write.mode(
                "overwrite"
            ).parquet(f"{cdir}/delta={b}")

        _run_script(
            spark,
            script,
            ingest=ingest,
            replay=ingest,
            erase=lambda ids, cdir=cdir: retract_from_drift_counts(
                spark, cdir, _docs(spark, ids)
            ),
            fold=lambda cdir=cdir: compact_drift_counts(
                spark, cdir, keep_latest=1
            ),
            rebuild=lambda live: token_counts(_docs(spark, live)),
            read=lambda cdir=cdir: read_corpus_counts(spark, cdir),
        )


@pytest.mark.slow
def test_cms_cells_lifecycle_interleavings(spark, tmp_path):
    from backend_big_data_spark.streaming.cms_ingest import (
        cms_ingest_sink,
        compact_cms_cells,
        read_cms_cells,
        retract_from_cms_cells,
    )

    def toks(ids):
        return _docs(spark, ids).select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
        )

    for si, script in enumerate(SCRIPTS):
        sdir = str(tmp_path / f"cms{si}")
        sink = cms_ingest_sink(sdir, "tok", width=64)

        _run_script(
            spark,
            script,
            ingest=lambda b: sink(toks(_batch_ids(b)), b),
            replay=lambda b: sink(toks(_batch_ids(b)), b),
            erase=lambda ids: retract_from_cms_cells(
                spark, sdir, toks(ids), "tok"
            ),
            fold=lambda: compact_cms_cells(spark, sdir, keep_latest=1),
            rebuild=lambda live: cms_cells(
                toks(live), F.col("tok"), width=64
            ),
            read=lambda: read_cms_cells(spark, sdir),
        )
