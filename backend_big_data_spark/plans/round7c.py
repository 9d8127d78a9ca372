"""Round-7 additions II: fuzzy record linkage and fixed-point PageRank.

Both are additive training-data-pipeline capabilities (the reference
engine, CiccioRomeo/backend-big-data, has neither a fuzzy join nor an
iterative graph operator): entity resolution against a dirty feed is the
standard step before exact/near dedup can key on an entity id, and
link-graph centrality is the classic web-corpus quality prior.

Determinism/oracle strategy:

- `part_fuzzy_match` derives the dirty feed from the part table itself
  with TWO deterministic character edits (delete at 1 + pk mod len,
  then substitute 'q' at 1 + 7·pk mod len'), so every dirty record is
  within edit distance 2 of its source entity and the whole task is
  replayable in ANSI SQL. The Spark side runs the Ed-Join prefix-filter
  plan (`operators/fuzzyjoin.py`); the oracle brute-forces all pairs
  with a length pre-filter — blocking is result-invariant (completeness
  theorem + exact verify), so both produce identical pairs.
- `supplier_pagerank` runs PageRank entirely in fixed-point BIGINT
  micro-units with floor division at every step, so Spark and DuckDB
  agree bit-for-bit; the oracle replays the iterations as a MATERIALIZED
  CTE chain (same device as `round7b._bpe_ctes`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

_FUZZY_K = 2

#: Sizing-rule cap ARMED in the registered two-sided fuzzy join — ~4× the
#: measured sf0.1 prefix candidate bound (50.8M; sf0.01 is 508k), so every
#: gate scale passes while a shared-vocabulary adversarial corpus refuses
#: BEFORE the candidate join runs. (The indexed twin probes a maintained
#: one-sided index — its production caller is the streaming sink, whose
#: per-batch probe is batch-sized by construction.)
FUZZY_CANDIDATE_CAP = 200_000_000

_FUZZY_ORACLE = """
WITH e AS (
  SELECT p_partkey AS id, p_name || '|' || p_brand || '|' || p_type AS ent
  FROM part
),
d0 AS (SELECT id, ent, 1 + (id % len(ent)) AS pos1 FROM e),
d1 AS (SELECT id,
       substr(ent, 1, pos1 - 1) || substr(ent, pos1 + 1, 100000) AS e2
       FROM d0),
d2 AS (SELECT id, e2, 1 + ((id * 7) % len(e2)) AS pos2 FROM d1),
dirty AS (SELECT id,
          substr(e2, 1, pos2 - 1) || 'q' || substr(e2, pos2 + 1, 100000)
          AS ds FROM d2)
SELECT d.id AS dirty_id, c.id AS clean_id,
       CAST(levenshtein(d.ds, c.ent) AS INTEGER) AS edit_dist
FROM dirty d JOIN e c ON abs(len(d.ds) - len(c.ent)) <= 2
WHERE levenshtein(d.ds, c.ent) <= 2
ORDER BY dirty_id, clean_id
"""


def _entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("id"),
        F.concat_ws("|", "p_name", "p_brand", "p_type").alias("s"),
    )


def _corrupt(clean: DataFrame) -> DataFrame:
    """Two deterministic edits keyed on the id: delete one character,
    then substitute one character with 'q' — edit distance ≤ 2 from the
    source entity by construction."""
    pos1 = F.lit(1) + F.pmod(F.col("id"), F.length("s"))
    deleted = F.concat(
        F.substring(F.col("s"), F.lit(1), pos1 - 1),
        F.col("s").substr(pos1 + 1, F.lit(100000)),
    )
    d = clean.select("id", deleted.alias("s"))
    pos2 = F.lit(1) + F.pmod(F.col("id") * 7, F.length("s"))
    subbed = F.concat(
        F.substring(F.col("s"), F.lit(1), pos2 - 1),
        F.lit("q"),
        F.col("s").substr(pos2 + 1, F.lit(100000)),
    )
    return d.select("id", subbed.alias("s"))


@register("part_fuzzy_match", oracle=_FUZZY_ORACLE)
def part_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: link a deterministically corrupted parts feed
    back to the master part table at edit distance ≤ 2 via the Ed-Join
    prefix-filter plan (`operators/fuzzyjoin.edit_distance_join` — q-gram
    explode, global rarity order, k·q+1-rarest-gram candidate join,
    exact levenshtein verify; no all-pairs stage anywhere). The
    registered form ARMS the sizing rule (`FUZZY_CANDIDATE_CAP` — ~4×
    the measured 50.8M sf0.1 prefix bound): a corpus whose candidate
    bound leaves the gate regime refuses with
    `FuzzyJoinCandidateBlowup` instead of running quadratic
    (tests/test_fuzzyjoin.py::TestRegisteredCapRefusesAdversarial)."""
    from backend_big_data_spark.operators.fuzzyjoin import edit_distance_join

    clean = _entities(spark, sf_dir)
    dirty = _corrupt(clean)
    return (
        edit_distance_join(
            dirty, clean, max_dist=_FUZZY_K, q=3,
            candidate_cap=FUZZY_CANDIDATE_CAP,
        )
        .select(
            F.col("left_id").alias("dirty_id"),
            F.col("right_id").alias("clean_id"),
            "edit_dist",
        )
        .orderBy("dirty_id", "clean_id")
    )


@register("part_fuzzy_match_indexed", oracle=_FUZZY_ORACLE)
def part_fuzzy_match_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same linkage task through the INCREMENTAL path
    (`operators/fuzzyjoin.edit_distance_join_indexed` — the dirty side's
    k·q+1 rarest grams broadcast-probe a pre-built master gram index;
    the master is never re-shingled; this is the probe the streaming
    sink `streaming/linkage_ingest.py` runs per micro-batch). Same
    brute-force oracle as `part_fuzzy_match`: both paths are
    result-invariant blockings of the same join."""
    from backend_big_data_spark.operators.fuzzyjoin import (
        edit_distance_join_indexed,
        gram_index,
    )

    clean = _entities(spark, sf_dir)
    dirty = _corrupt(clean)
    # the probe's parallelism IS the index's partitioning (map-side scan
    # by design). At rest the index is many batch files; built inline
    # from the 2-file part scan it would collapse the whole verify onto
    # 2 tasks, so spread it once. This master-scale probe batch also
    # ranks its prefixes by INDEX frequency (result-invariant — see the
    # operator docstring), which collapses the one-sided fan-out.
    index = gram_index(clean, q=3).repartition(
        spark.sparkContext.defaultParallelism
    )
    # master STRINGS ride broadcast into the candidate verify (1-2 MB
    # here) so the 54M-row candidate stream never shuffles on right_id;
    # with the index-frequency ranking this takes the sf0.1 Spark wall
    # 55 s -> 17 s. At a master size past broadcast range the verify
    # would semi-join-prune the strings to candidate ids first and
    # accept the shuffle.
    return (
        # broadcast_probe stays True even though THIS probe is
        # master-sized: the fuzzy prefix is only k·q+1 = 7 grams per
        # record (140k rows at sf0.1), and the A/B at sf0.1 reads
        # 6-14 s with the broadcast vs 26-30 s without (the unhinted
        # join shuffles the 8M-row gram index instead) — PERF.md r09.
        # Past broadcast range (10⁸+ probe records), callers pass
        # broadcast_probe=False; the setsim twin defaults there because
        # ITS prefix is nearly the whole token table.
        edit_distance_join_indexed(
            dirty, index, F.broadcast(clean), max_dist=_FUZZY_K, q=3,
            rank_by_index_freq=True,
            # broadcast master ⇒ the inline-strings verify applies: the
            # length + levenshtein filters run inside the candidate-join
            # stage instead of after two more 54M-row hash joins (r12)
            inline_strings=True,
        )
        .select(
            F.col("left_id").alias("dirty_id"),
            F.col("right_id").alias("clean_id"),
            "edit_dist",
        )
        .orderBy("dirty_id", "clean_id")
    )


# ---------------------------------------------------------------------------
# Fixed-point PageRank (supply-graph centrality)
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_SCALE = 1_000_000_000


def _pagerank_oracle(k: int = _PR_ITERS, scale: int = _PR_SCALE) -> str:
    """Replay of `operators/pagerank.py` as a k-step MATERIALIZED CTE
    chain (same device as `round7b._bpe_ctes`): every arithmetic step is
    BIGINT floor division, so the replay is exact. DuckDB SUM() emits
    HUGEINT — every aggregate is cast back to BIGINT."""
    parts = [
        f"""WITH edges AS MATERIALIZED (
  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  UNION
  SELECT DISTINCT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outd AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM edges GROUP BY 1),
r0 AS MATERIALIZED (SELECT node, CAST(CAST({scale} AS BIGINT) // n AS BIGINT) AS r
  FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
d{i} AS MATERIALIZED (SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dang
  FROM r{i - 1} r LEFT JOIN outd o ON r.node = o.node
  WHERE o.node IS NULL),
i{i} AS MATERIALIZED (SELECT e.dst AS node,
  CAST(SUM(r.r // o.deg) AS BIGINT) AS in_sum
  FROM r{i - 1} r JOIN outd o ON r.node = o.node
  JOIN edges e ON e.src = r.node GROUP BY 1),
r{i} AS MATERIALIZED (SELECT nd.node,
  CAST((15 * CAST({scale} AS BIGINT)) // (100 * nn.n)
    + (85 * (COALESCE(i.in_sum, 0) + d.dang // nn.n)) // 100 AS BIGINT) AS r
  FROM nodes nd CROSS JOIN nn CROSS JOIN d{i} d
  LEFT JOIN i{i} i ON nd.node = i.node)"""
        )
    return (
        "".join(parts)
        + f"\nSELECT node, r AS rank_fp FROM r{k} ORDER BY rank_fp DESC, node"
    )


@register("supplier_pagerank", oracle=_pagerank_oracle())
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph centrality over the supply graph: customer→supplier
    edges from purchases (orders ⋈ lineitem, distinct pairs) plus
    supplier→nation location edges; nations are dangling sinks whose
    mass redistributes uniformly. Five fixed-point iterations
    (`operators/pagerank.py::pagerank` — BIGINT micro-units, floor
    division everywhere, bit-identical across engines and reduction
    orders). Output: every node with its final rank, descending."""
    from backend_big_data_spark.operators.pagerank import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    purchases = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    located = sup.select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
    ).distinct()
    edges = purchases.unionByName(located).distinct()
    return pagerank(edges, iterations=_PR_ITERS, scale=_PR_SCALE).orderBy(
        F.desc("rank_fp"), "node"
    )
