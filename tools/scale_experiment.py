#!/usr/bin/env python
"""Scale-up measurement for the round-4 operator shapes: run the same plan
over 1x / 10x / 50x replicated inputs and report steady-state (min-of-3)
wall times. Results are recorded in PERF.md ("Scale-up measurement").

Replication shifts the entity key per replica (user_id / vec_id / doc_id)
so the per-entity workload stays CONSTANT while volume grows — sessions
per user, probes per shingle, dims per vector don't change, only row
count does. (Naively replicating dedup inputs would replicate the TEXTS
and grow dup clusters quadratically — measuring the data's shape, not the
plan's; those ops keep the lineitem-style experiment instead.)

Usage: python tools/scale_experiment.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402

FACTORS = [1, 10, 50]
RUNS = 3


def replicate(df: DataFrame, key: str, factor: int, key_span: int) -> DataFrame:
    """factor copies, entity key shifted per replica so per-key load is flat."""
    if factor == 1:
        out = df
    else:
        out = df.crossJoin(
            F.broadcast(
                df.sparkSession.range(factor).select(F.col("id").alias("__r"))
            )
        ).withColumn(key, F.col(key) + F.col("__r") * F.lit(key_span)).drop("__r")
    return out.repartition(64).persist()


def timed(fn) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _funnel_count(ev) -> int:
    """The events_funnel_conversion chain inlined over a given frame."""
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1"))
    s2 = (ev.filter(F.col("event_type") == "click").join(s1, "user_id")
          .filter(F.col("ts") > F.col("t1")).groupBy("user_id")
          .agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "purchase").join(s2, "user_id")
          .filter(F.col("ts") > F.col("t2")).groupBy("user_id")
          .agg(F.min("ts").alias("t3")))
    return s1.join(s2, "user_id", "left").join(s3, "user_id", "left").count()


def _scd2_count(ev) -> int:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", F.lead("ts").over(w).alias("valid_to")
    ).count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_experiment")
    spark.sparkContext.setLogLevel("ERROR")

    from backend_big_data_spark.operators.timeseries import (
        fill_date_gaps,
        user_sessions,
    )
    from backend_big_data_spark.similarity.projection import project_embeddings
    from backend_big_data_spark.text.dedup import (
        apply_bloom_prefilter,
        build_shingle_bloom,
        doc_shingles,
    )

    events = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    ev_users = events.agg(F.max("user_id")).collect()[0][0] + 1
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    sh = (
        doc_shingles(docs, persist=False)
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    index = sh.filter(F.col("doc_id") % 5 != 0).persist()
    index.count()
    bloom = build_shingle_bloom(index)

    results: dict[str, list[float]] = {}
    for factor in FACTORS:
        ev = replicate(events, "user_id", factor, ev_users)
        ev.count()
        results.setdefault("sessionize + summarize", []).append(
            timed(lambda: user_sessions(ev).count())
        )
        daily = ev.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        ).agg(F.count("*").alias("event_count"))
        results.setdefault("daily gap-fill", []).append(
            timed(
                lambda: fill_date_gaps(
                    daily, "day", ["event_type"], {"event_count": 0}
                ).count()
            )
        )
        ve = replicate(emb, "vec_id", factor, n_vec)
        ve.count()
        results.setdefault("random projection 64->8", []).append(
            timed(lambda: project_embeddings(ve, out_dims=8, dim=64).count())
        )
        probes = replicate(sh, "doc_id", factor, n_doc)
        probes.count()
        results.setdefault("bloom probe + semi-join", []).append(
            timed(
                lambda: apply_bloom_prefilter(
                    probes, bloom, F.col("shingle")
                ).join(index.select("shingle").distinct(), "shingle", "semi").count()
            )
        )
        # round-4b shapes: funnel chain, SCD2 window, temperature-mix
        # rates, PQ encode. Segment dedup is deliberately absent for the
        # same reason as the dedup ops: replicated TEXTS multiply each
        # segment's document frequency, so "hot" grows with the factor —
        # that measures the replication artifact, not the plan.
        from backend_big_data_spark.similarity.pq import anchor_codebooks, pq_encode  # noqa: PLC0415
        from backend_big_data_spark.text.mixing import temperature_mix  # noqa: PLC0415

        results.setdefault("funnel (3 chained keyed MINs)", []).append(
            timed(lambda: _funnel_count(ev))
        )
        results.setdefault("SCD2 intervals (lead window)", []).append(
            timed(lambda: _scd2_count(ev))
        )
        dd = replicate(docs, "doc_id", factor, n_doc)
        dd.count()
        results.setdefault("temperature mix (rates + hash filter)", []).append(
            timed(lambda: temperature_mix(dd).count())
        )
        cb = anchor_codebooks(ve, m=8, d_sub=8, ksub=16)
        results.setdefault("PQ encode (min-struct argmin)", []).append(
            timed(lambda: pq_encode(ve, cb, m=8, d_sub=8).count())
        )
        # late round-4 shapes: SemDeDup and DSIR. For SemDeDup the centroid
        # count scales WITH the factor and each replica's vectors are pushed
        # far from the other replicas' (offset on dim 0), so per-cluster
        # membership stays flat — otherwise identical replicas would pile
        # into the lowest-id replica's clusters and the within-cluster
        # quadratic term would measure the replication artifact.
        from backend_big_data_spark.similarity.semdedup import semdedup  # noqa: PLC0415
        from backend_big_data_spark.text.dsir import importance_weights  # noqa: PLC0415

        spread = ve.withColumn(
            "embedding",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: x
                + F.when(i == 0, (F.col("vec_id") / n_vec).cast("int") * 1e6)
                .otherwise(F.lit(0.0)),
            ),
        ).withColumn("blk", (F.col("vec_id") / n_vec).cast("int")).persist()
        spread.count()
        cents = spread.filter(F.col("vec_id") % n_vec < 10).select(
            F.col("vec_id").cast("int").alias("cluster"),
            F.col("embedding").alias("centroid"),
            "blk",
        )
        # unblocked assignment is O(n·k) — with k ∝ n it measured 23.5×
        # at 50× (the honest brute-force number); the blocked path keyed
        # on the coarse cell is the scale form.
        results.setdefault(
            "SemDeDup blocked (assign + in-cluster pairs)", []
        ).append(
            timed(
                lambda: semdedup(
                    spread, cents, threshold=0.3, block_col="blk"
                ).count()
            )
        )
        spread.unpersist()
        results.setdefault("DSIR weights (hashed-ngram models)", []).append(
            timed(
                lambda: importance_weights(
                    dd, dd.filter(F.col("lang") == "en")
                ).count()
            )
        )
        # round-5 shape: duplicate-span removal. Verbatim text replication
        # would multiply every k-gram's occurrence count by the factor
        # (everything becomes "duplicated" — the replication artifact), so
        # each replica's TOKENS get a per-replica prefix: within-replica
        # duplicate structure is preserved exactly, cross-replica grams are
        # disjoint, and per-gram df stays flat — the text analog of the
        # entity-key shift.
        from backend_big_data_spark.text.spans import duplicate_span_profile  # noqa: PLC0415

        if factor == 1:
            td = docs.select("doc_id", "text")
        else:
            td = (
                docs.select("doc_id", "text")
                .crossJoin(
                    F.broadcast(
                        spark.range(factor).select(F.col("id").alias("__r"))
                    )
                )
                .select(
                    (F.col("doc_id") + F.col("__r") * n_doc).alias("doc_id"),
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.trim("text"), r"\s+"),
                            lambda t: F.concat(
                                F.col("__r").cast("string"), F.lit("_"), t
                            ),
                        ),
                    ).alias("text"),
                )
            )
        td = td.repartition(64).persist()
        td.count()
        results.setdefault("duplicate-span removal (k-gram mark)", []).append(
            timed(
                lambda: duplicate_span_profile(td, k=8)
                .agg(F.sum("n_removed"))
                .collect()
            )
        )
        td.unpersist()
        ev.unpersist(); ve.unpersist(); probes.unpersist(); dd.unpersist()

    print(f"factors: {FACTORS}  (sf_dir={sf_dir}, min-of-{RUNS})")
    for shape, times in results.items():
        ratio = times[-1] / times[0]
        cells = " | ".join(f"{t:.2f} s" for t in times)
        print(f"| {shape} | {cells} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
