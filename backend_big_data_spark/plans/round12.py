"""Round-12 registrations — completing two maintained-state matrices:

- ``lineitem_quantile_by_flag_sidecar`` — the GROUPED quantile-sketch
  sidecar readout: per-group quantiles served from maintained per-batch
  sample rows alone (the last cell of the sketch-family matrix — KMV
  direct/merged/sidecar/windowed ✓, qsketch direct/merged/sidecar ✓,
  grouped direct ✓, grouped sidecar here). `streaming/qsketch_ingest`'s
  sink and `qsketch_merged_readout` both already take ``group_cols``;
  this registers and oracle-gates that path.
- ``part_fuzzy_from_bucketed_index`` — the fuzzy/linkage family's gram
  index folded into a GRAM-BUCKETED directory layout
  (`operators/fuzzyjoin.compact_gram_index`, the BM25 term-bucket fold
  pattern): a probe's directory listing tracks the probe's grams, not
  the index size, and the oracle is the existing brute-force
  Levenshtein twin replayed over the mixed flat+bucketed layout.

Reference parity note: the reference (CiccioRomeo/backend-big-data) has
no sketch or linkage maintenance surface at all — these are additive
LLM-pipeline scope, held to the same oracle discipline as SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.plans.round11 import (
    _H_SQL,
    _KEY_SQL,
    _QS_K,
    _QS_PCTS,
    _key,
)
from backend_big_data_spark.plans.round7c import (
    _FUZZY_ORACLE as _ROUND7C_FUZZY_ORACLE,
)
from backend_big_data_spark.sources.catalog import load_table

_QGROUPED_SIDECAR_ORACLE = f"""
WITH t AS (
  SELECT l_returnflag AS flag, CAST(l_extendedprice AS DOUBLE) AS price,
         {_H_SQL} AS h, {_KEY_SQL} AS k
  FROM lineitem
), direct AS (
  SELECT flag, price, k,
         row_number() OVER (PARTITION BY flag ORDER BY h, k) AS r
  FROM t
), samp AS (
  SELECT flag, price, k,
         row_number() OVER (PARTITION BY flag ORDER BY price, k) AS sr,
         COUNT(*) OVER (PARTITION BY flag) AS s
  FROM direct WHERE r <= {_QS_K}
), marks AS (SELECT unnest([25, 50, 75, 90, 99]) AS pct)
SELECT samp.flag AS l_returnflag, CAST(m.pct AS INTEGER) AS pct,
       samp.price AS est_price, CAST(3 AS BIGINT) AS n_batches
FROM marks m JOIN samp
  ON samp.sr = CAST(ceil(m.pct * samp.s / 100.0) AS BIGINT)
ORDER BY l_returnflag, pct
"""


@register("lineitem_quantile_by_flag_sidecar", oracle=_QGROUPED_SIDECAR_ORACLE)
def lineitem_quantile_by_flag_sidecar(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group quantiles from MAINTAINED state: lineitem arrives as
    three micro-batches (l_orderkey % 3) through the GROUPED
    quantile-sketch sidecar (`streaming/qsketch_ingest.py` with
    ``group_cols=["flag"]``), each batch appending only its per-flag
    k=1024 bottom-k sample rows; the readout merges sample rows ALONE —
    per-group union closure, no fact row rescanned. The oracle computes
    the grouped single-pass sketch over the whole table with NO
    prefilter: hash equality certifies per-(batch, group) sampling +
    lossless per-group merge ≡ the direct grouped sketch — the
    `lineitem_quantile_sidecar` certificate, group-keyed. The shared
    map-side ceiling is sized from the smallest (batch, group) cell's
    exact count (pure BIGINT; a fortiori correct for every cell), and
    cells below the target disarm into the small-set regime.

    Throwaway per-invocation sidecar dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.operators.qsketch import sample_prefilter
    from backend_big_data_spark.streaming.qsketch_ingest import (
        qsketch_ingest_sink,
        qsketch_merged_readout,
        read_qsketch_sidecar,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("price"),
    ).withColumn("b", F.col("l_orderkey") % 3)
    cell_min = int(
        li.groupBy("b", "flag")
        .agg(F.count(F.lit(1)).alias("bn"))
        .agg(F.min("bn").alias("m"))
        .first()["m"]
    )
    sdir = _tempfile.mkdtemp(prefix="qsketch_grouped_sidecar_")
    sink = qsketch_ingest_sink(
        sdir, ["flag"], _key(), F.col("price"), k=_QS_K,
        prefilter=sample_prefilter(cell_min, 4096),
    )
    for b in range(3):
        sink(li.where(F.col("b") == b).drop("b"), b)

    sidecar = read_qsketch_sidecar(spark, sdir)
    n_batches = sidecar.select(F.countDistinct("batch").alias("nb"))
    est = qsketch_merged_readout(
        sidecar.drop("batch"), ["flag"], _QS_PCTS, k=_QS_K,
        est_col="est_price",
    )
    return (
        est.crossJoin(F.broadcast(n_batches))
        .select(
            F.col("flag").alias("l_returnflag"),
            "pct",
            "est_price",
            F.col("nb").cast("long").alias("n_batches"),
        )
        .orderBy("l_returnflag", "pct")
    )


@register("part_fuzzy_from_bucketed_index", oracle=_ROUND7C_FUZZY_ORACLE)
def part_fuzzy_from_bucketed_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintained gram index folded into the GRAM-BUCKETED layout
    (`compact_linkage_master` with ``gram_buckets=8`` — the BM25
    term-bucket fold applied to the fuzzy/linkage family), then the
    standard one-sided fuzzy probe served from the MIXED layout: the
    master seeds in two batches, compaction buckets them, a third batch
    lands flat post-fold, and the probe's index read prunes the
    bucketed bulk to the probe's own grams' buckets at the DIRECTORY
    level (`linkage_ingest.probe_master_grams`; PartitionFilters
    plan-tested in tests/test_linkage_ingest.py) while scanning the
    small flat tail. The oracle is the existing brute-force Levenshtein
    twin (`round7c._FUZZY_ORACLE`) VERBATIM: hash equality certifies
    that the bucketed fold + mixed reader + directory prune is
    result-invariant against the all-pairs ground truth — the
    `doc_bm25_from_bucketed_index` certificate for this family. The
    probe ranks its prefix grams by the maintained ``gramfreq`` sidecar
    (no per-probe index aggregate), and master strings are served from
    the maintained master rows, not re-derived.

    Throwaway per-invocation master dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.operators.fuzzyjoin import (
        edit_distance_join_indexed,
    )
    from backend_big_data_spark.plans.round7c import _corrupt, _entities
    from backend_big_data_spark.streaming.linkage_ingest import (
        compact_linkage_master,
        probe_master_grams,
        read_master,
        read_master_gram_freq,
        seed_master_batch,
    )

    clean = _entities(spark, sf_dir)
    dirty = _corrupt(clean)
    mdir = _tempfile.mkdtemp(prefix="gram_bucketed_")
    for b in range(2):
        seed_master_batch(spark, mdir, clean.where(F.col("id") % 3 == b), b)
    compact_linkage_master(spark, mdir, keep_latest=0, gram_buckets=8)
    seed_master_batch(
        spark, mdir, clean.where(F.col("id") % 3 == 2), 2
    )  # flat post-fold tail

    index = probe_master_grams(spark, mdir, dirty, q=3)
    master = read_master(spark, mdir)
    gfreq = read_master_gram_freq(spark, mdir)
    return (
        edit_distance_join_indexed(
            dirty, index, F.broadcast(master), max_dist=2, q=3,
            index_freq=gfreq,
        )
        .select(
            F.col("left_id").alias("dirty_id"),
            F.col("right_id").alias("clean_id"),
            "edit_dist",
        )
        .orderBy("dirty_id", "clean_id")
    )
