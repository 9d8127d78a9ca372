#!/usr/bin/env python
"""Measure the at-rest size of the embedding representations the ANN
family stores: raw float vectors vs SQ8 codes vs PQ codes (+ the tiny
codebook/quantizer sidecars). Backs PERF.md's compression claims with
parquet bytes actually written, not arithmetic.

    python tools/storage_experiment.py [sf_dir]
"""

from __future__ import annotations

import os
import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F  # noqa: E402


def dir_bytes(path: str) -> int:
    return sum(
        f.stat().st_size
        for f in pathlib.Path(path).rglob("*")
        if f.is_file() and not f.name.startswith(("_", "."))
    )


def main() -> None:
    from backend_big_data_spark.session import get_spark
    from backend_big_data_spark.similarity.ann import _sq8_train
    from backend_big_data_spark.similarity.pq import anchor_codebooks, pq_encode
    from backend_big_data_spark.sources.catalog import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="storage_experiment", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    out = tempfile.mkdtemp(prefix="storage_exp_")
    try:
        # raw: float32 (as shipped) and float64 (the compute form)
        emb.select("vec_id", "embedding").write.parquet(f"{out}/raw_f32")
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).write.parquet(f"{out}/raw_f64")

        # SQ8: per-dim uint8 codes (stored as tinyint array)
        mn_arr, sp_arr = _sq8_train(emb, "embedding", dim=64)
        cvec = F.col("embedding").cast("array<double>")
        codes = F.transform(
            cvec,
            lambda x, i: F.when(
                F.element_at(sp_arr, i + 1) > 0.0,
                F.floor(
                    (x - F.element_at(mn_arr, i + 1))
                    / F.element_at(sp_arr, i + 1)
                    * 255.0
                    + 0.5
                )
                # [0,255] -> signed byte via -128 offset (Spark tinyint is
                # signed; pure storage representation, reversed on read)
                - 128,
            )
            .otherwise(F.lit(-128))
            .cast("tinyint"),
        )
        emb.select("vec_id", codes.alias("codes")).write.parquet(f"{out}/sq8")

        # PQ: m=8 codes of 16 entries each (tinyint per code)
        cb = anchor_codebooks(emb, m=8, d_sub=8, ksub=16)
        pq = pq_encode(emb, cb, m=8, d_sub=8)
        packed = pq.groupBy("vec_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub_id", "code_id"))),
                lambda s: s["code_id"].cast("tinyint"),
            ).alias("codes")
        )
        packed.write.parquet(f"{out}/pq")
        cb.write.parquet(f"{out}/pq_codebook")

        sizes = {
            k: dir_bytes(f"{out}/{k}")
            for k in ("raw_f32", "raw_f64", "sq8", "pq", "pq_codebook")
        }
        print(f"vectors: {n}  (dim=64)")
        for k, v in sizes.items():
            print(f"{k:12s} {v:>12,d} B   {v / n:8.1f} B/vec")
        print(
            f"sq8 vs f32: {sizes['raw_f32'] / sizes['sq8']:.1f}x    "
            f"pq vs f32: {sizes['raw_f32'] / sizes['pq']:.1f}x"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
