"""Edit-distance (fuzzy) join — Ed-Join-style q-gram prefix filtering.

Record linkage: join two string tables on Levenshtein distance ≤ k
without an all-pairs comparison (public algorithm: Xiao, Wang & Lin,
"Ed-Join: an efficient algorithm for similarity joins with edit distance
constraints", VLDB 2008; prefix-filtering principle from Chaudhuri,
Ganti & Kaushik, ICDE 2006).

Why it scales — the candidate generator never compares all pairs:

1. Each string of length L yields its L − q + 1 positional q-grams
   (one `transform(sequence(...))` expression — JVM codegen, no Python).
2. One global gram-frequency table over BOTH sides (groupBy — map-side
   combine) defines a total order (count ASC, gram ASC): rarest first.
3. k edits destroy at most k·q grams, so any string pair within edit
   distance k shares at least one of each string's k·q + 1 rarest grams
   (prefix-filtering with overlap bound |Q| − k·q). Each side therefore
   exposes only its k·q + 1 globally-rarest DISTINCT grams to the join —
   skew-robust by construction: high-frequency "stopword" grams are
   never join keys, so no hot gram key can fan out quadratically.
4. Candidates = equi-join of the two prefix tables on the gram, then an
   exact `levenshtein` verify (JVM built-in) with a length pre-filter.
   Blocking is RESULT-INVARIANT: completeness is the theorem in (3),
   precision is the exact verify — output equals brute force.

Requires len(s) ≥ q on both sides (shorter strings have no q-gram;
callers route them through an exact/short-block path).

LENGTH-BANDED JOIN KEY — measured rejection (r12 optimization round,
do not re-try without a new corpus argument): moving the length
pre-filter INTO the candidate join key ((gram, floor(len/w)) with the
streamed side exploding to the ≤2 adjacent buckets, so length-failing
pairs never materialize from the hash probe) was A/B-bracketed on the
54M-candidate sf0.1 probe: current 3.19/3.36 s vs banded 3.46/3.08 s
min-of-3 — a wash. The length filter passes 68 % of candidates on this
corpus (part-name lengths concentrate in a ~10-char range, so a ±2
band excludes little), and the ~1.7× streamed-side bucket explode eats
exactly what the skipped materializations save. Worth re-measuring
only on a corpus whose length distribution is wide relative to
max_dist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation


class FuzzyJoinCandidateBlowup(ValueError):
    """Raised by `edit_distance_join` when ``candidate_cap`` is set and the
    prefix-filter candidate bound exceeds it — the SHARED-VOCABULARY regime
    (a small closed gram vocabulary, e.g. TPC-H's 64 color words, where even
    the globally-rarest grams are dense on both sides and the equi-join
    fans out superlinearly). Detected BEFORE the candidate join runs, from
    the per-gram prefix counts the join already computes. Mitigations, in
    order: pass ``escalate_q_to`` (longer grams shrink per-gram frequency —
    sound whenever every string has len ≥ the escalated q), or block on a
    coarser key first so each block leaves the regime."""


def qgrams(s: Column, q: int = 3) -> Column:
    """Positional q-grams of ``s`` as array<string> (multiset, in order).

    Empty for strings shorter than ``q`` (callers filter those)."""
    return F.when(
        F.length(s) >= q,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - q + 1),
            lambda p: F.substring(s, p, q),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def _prefix_grams(
    named: DataFrame, freq: DataFrame, prefix_len: int
) -> DataFrame:
    """(id, gram) pairs restricted to each id's ``prefix_len`` rarest
    DISTINCT grams under the global (count ASC, gram ASC) order."""
    ranked = named.join(freq, "gram")
    return (
        ranked.groupBy("id")
        .agg(
            F.slice(
                F.array_sort(F.collect_set(F.struct("cnt", "gram"))),
                1,
                prefix_len,
            ).alias("pre")
        )
        .select("id", F.explode("pre.gram").alias("gram"))
    )


def _verify_pairs(
    cand: DataFrame, ls: DataFrame, rs: DataFrame, max_dist: int
) -> DataFrame:
    """Exact verify of (left_id, right_id) candidate pairs — possibly
    WITH duplicates: the pair dedup runs AFTER the verify, over the
    surviving matches, not before it over the raw gram-pair fan-out.
    Measured at sf0.1 (20k×20k parts, shared color-word gram
    vocabulary): distinct over the 36M raw candidate pairs cost more
    than every other stage combined; verifying first shrinks the dedup
    input to ~the match count. The verify itself is the BANDED
    (thresholded) ``levenshtein`` — O(k·len) per pair instead of
    O(len²), returning −1 above ``max_dist``."""
    return (
        cand.join(ls, "left_id")
        .join(rs, "right_id")
        .where(F.abs(F.length("left_s") - F.length("right_s")) <= max_dist)
        .withColumn(
            "edit_dist",
            F.levenshtein("left_s", "right_s", max_dist).cast("int"),
        )
        .where(F.col("edit_dist") >= 0)
        .dropDuplicates(["left_id", "right_id"])
        .select("left_id", "right_id", "left_s", "right_s", "edit_dist")
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    max_dist: int = 2,
    q: int = 3,
    candidate_cap: int | None = None,
    escalate_q_to: int | None = None,
) -> DataFrame:
    """Fuzzy join ``left`` (id, s) × ``right`` (id, s): all pairs with
    ``levenshtein(left.s, right.s) <= max_dist``.

    Returns (left_id, right_id, left_s, right_s, edit_dist). Both inputs
    must have columns ``id`` and ``s`` with len(s) >= q.

    ``candidate_cap`` arms the SIZING RULE: the exact pre-verify fan-out
    of the candidate equi-join, Σ_g |left prefixes exposing g| · |right
    prefixes exposing g|, is computed from the (tiny, already
    materialized) prefix tables before the join runs. Above the cap the
    join escalates to ``q+1`` grams (result-invariant — the prefix
    theorem holds for any q with len(s) ≥ q — so retried up to
    ``escalate_q_to``, provided every string is long enough) and
    otherwise raises :class:`FuzzyJoinCandidateBlowup` naming the regime,
    instead of silently running quadratic.
    """
    prefix_len = max_dist * q + 1
    tagged = left.select(
        F.lit("l").alias("side"), "id", "s"
    ).unionByName(right.select(F.lit("r").alias("side"), "id", "s"))
    grams = tagged.select(
        "side",
        "id",
        F.length("s").alias("slen"),
        F.posexplode(qgrams(F.col("s"), q)).alias("p", "gram"),
    )
    # ONE gram scan feeds both the shared frequency order and both
    # sides' prefix ranking (sides may reuse ids, so the prefix groupBy
    # keys on (side, id)). Prefix rows carry ALL occurrence positions of
    # each chosen gram for the Ed-Join position filter below, plus the
    # string LENGTH (one int — unlike the rejected inline-strings
    # attach, it cannot push the join sides' size estimates past the
    # broadcast threshold) so the length band prunes candidates INSIDE
    # the candidate-join stage, before the verify's id-joins see them.
    freq = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    pre = (
        grams.join(freq, "gram")
        .groupBy("side", "id", "gram")
        .agg(
            F.first("cnt").alias("cnt"),
            F.first("slen").alias("slen"),
            F.collect_list("p").alias("poss"),
        )
        .groupBy("side", "id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("cnt", "gram", "poss"))),
                1,
                prefix_len,
            ).alias("pre"),
            F.first("slen").alias("slen"),
        )
        .select("side", "id", "slen", F.explode("pre").alias("pg"))
        .select(
            "side",
            "id",
            "slen",
            F.col("pg.gram").alias("gram"),
            F.col("pg.poss").alias("poss"),
        )
    )
    # materialized once: BOTH join branches read it (without this the
    # whole gram-scan + ranking subtree executes twice); prefix rows
    # are (k·q+1)·|ids| — tiny next to the inputs
    pre = pin_single_evaluation(pre)
    lp = pre.filter(F.col("side") == "l").select(
        F.col("id").alias("left_id"),
        F.col("slen").alias("l_len"),
        "gram",
        F.col("poss").alias("l_poss"),
    )
    rp = pre.filter(F.col("side") == "r").select(
        F.col("id").alias("right_id"),
        F.col("slen").alias("r_len"),
        "gram",
        F.col("poss").alias("r_poss"),
    )
    if candidate_cap is not None:
        # exact pre-position-filter fan-out of the equi-join below, from
        # two per-gram counts over the checkpointed prefix rows — cost is
        # one pass over (k·q+1)·|ids| rows, nothing touches the inputs
        bound_row = (
            lp.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("nl"))
            .join(rp.groupBy("gram").agg(F.count(F.lit(1)).alias("nr")), "gram")
            .agg(F.coalesce(F.sum(F.col("nl") * F.col("nr")), F.lit(0)).alias("b"))
            .first()
        )
        bound = int(bound_row["b"])
        if bound > candidate_cap:
            min_len = (
                tagged.agg(F.min(F.length("s"))).first()[0]
                if escalate_q_to is not None
                else None
            )
            if escalate_q_to is not None and q < escalate_q_to:
                if min_len is not None and min_len >= q + 1:
                    return edit_distance_join(
                        left,
                        right,
                        max_dist=max_dist,
                        q=q + 1,
                        candidate_cap=candidate_cap,
                        escalate_q_to=escalate_q_to,
                    )
            raise FuzzyJoinCandidateBlowup(
                f"shared-vocabulary gram regime at q={q}: prefix candidate "
                f"bound {bound} exceeds candidate_cap={candidate_cap}"
                + (
                    f" and q cannot escalate past {q} (escalate_q_to="
                    f"{escalate_q_to}, min string length {min_len})"
                    if escalate_q_to is not None
                    else " (no escalate_q_to given)"
                )
                + "; use longer grams (escalate_q_to) or block on a "
                "coarser key first"
            )
    # INLINE-STRINGS VERIFY — measured rejection (r13 optimization
    # round; do not re-try without a new plan argument): attaching both
    # sides' strings to the prefix tables BEFORE the gram equi-join (the
    # r12 indexed-variant win) demoted the candidate join from a
    # BroadcastHashJoin to a SortMergeJoin at sf0.1 — the string attach
    # inflated the join sides' size estimates past
    # autoBroadcastJoinThreshold, so the 50.8M-row fan-out paid two
    # exchanges + sorts instead of streaming map-side (plan diff:
    # plans/r13/part_fuzzy_match_{before,after}.txt at the rejection
    # commit, 6 BHJ/6 Exchange -> 4 BHJ + 2 SMJ/8 Exchange; noop probe
    # 9.0 s -> 16.5 s, same 126,775 rows). The indexed variant wins with
    # inline strings only because its caller ASSERTS broadcastability
    # with an explicit hint; here both sides are corpus-scale by
    # contract, so no such hint is sound. The post-candidate id-joins in
    # _verify_pairs broadcast automatically at gate scale and AQE picks
    # the strategy at real scale — keep them.
    #
    # Ed-Join position filter: k edits shift a surviving occurrence by at
    # most k, so a true match must have SOME occurrence pair of the
    # shared gram within |Δpos| ≤ k. Prefix rows keep every occurrence
    # position, so pruning on min positions alone (unsound) never
    # happens; arrays are per-string-tiny, the check is codegen-local.
    cand = (
        lp.join(rp, "gram")
        .where(F.abs(F.col("l_len") - F.col("r_len")) <= max_dist)
        .where(
            F.exists(
                F.col("l_poss"),
                lambda p: F.exists(
                    F.col("r_poss"),
                    lambda r2: F.abs(p - r2) <= F.lit(max_dist),
                ),
            )
        )
        .select("left_id", "right_id")
    )
    ls = left.select(F.col("id").alias("left_id"), F.col("s").alias("left_s"))
    rs = right.select(F.col("id").alias("right_id"), F.col("s").alias("right_s"))
    return _verify_pairs(cand, ls, rs, max_dist)


def gram_index(df: DataFrame, q: int = 3) -> DataFrame:
    """FULL distinct-gram inverted index of (id, s): one (id, gram) row
    per distinct q-gram of each string — the maintained sidecar the
    one-sided probe (`edit_distance_join_indexed`) joins against."""
    return df.select(
        F.col("id"), F.explode(F.array_distinct(qgrams(F.col("s"), q))).alias("gram")
    )


def edit_distance_join_indexed(
    left: DataFrame,
    right_index: DataFrame,
    right_strings: DataFrame,
    max_dist: int = 2,
    q: int = 3,
    rank_by_index_freq: bool = False,
    index_freq: DataFrame | None = None,
    broadcast_probe: bool = True,
    inline_strings: bool = False,
) -> DataFrame:
    """Fuzzy join ``left`` (id, s) against a PRE-BUILT gram index
    (`gram_index` rows (id, gram)) plus its strings (id, s) — the
    incremental/streaming variant: the right side is never re-shingled.

    ``broadcast_probe`` (default True — the streaming-sink regime, where
    ``left`` is one micro-batch): hint the probe's prefix and string
    frames broadcast so the at-rest index/master is scanned map-side
    with no shuffle. Set False when the probe is MASTER-sized (e.g. the
    registered full-corpus re-link queries): a corpus-sized broadcast
    is an executor-memory ceiling, and AQE picks the join side from
    runtime sizes instead. Results are invariant either way.

    One-sided prefix filtering: any k·q+1 DISTINCT grams of a left
    string serve as its prefix — k edits destroy at most k·q gram
    occurrences, so one chosen gram has a surviving occurrence in any
    right string within distance k, and a surviving gram is a substring
    of that right string, hence present in its FULL gram index.
    Completeness therefore holds for ANY ranking of the left grams; the
    ranking only tunes candidate fan-out. The tiny prefix table is
    broadcast, so the index is scanned map-side — no shuffle of the
    at-rest index.

    Two rankings:

    - default (batch-local frequency): cheap, self-contained, no index
      statistics needed — the streaming sink's choice, where batches
      are small and the probe is already candidate-bounded;
    - ``rank_by_index_freq=True``: rank by each gram's frequency IN THE
      INDEX (absent grams count 0 — they can never be the survivor for
      any true match, see above, so spending prefix slots on them is
      FREE pruning). This directly minimizes Σ index_count(g) over the
      chosen grams, i.e. the candidate volume itself — the right choice
      for large probe batches against a shared-vocabulary master
      (part of the 55 s → 17 s sf0.1 improvement with the query-side
      broadcast hint; at 228 distinct index grams the fan-out floor is
      structural). Costs one aggregate scan over the index per call —
      unless ``index_freq`` supplies the counts.

    ``index_freq``: a MAINTAINED (gram, cnt) table whose summed counts
    equal ``right_index.groupBy("gram").count()`` exactly (the linkage
    sink's ``gramfreq`` sidecar, kept in lockstep at admission) — the
    index-frequency ranking then costs no aggregate over the full index:
    the probe's only contact with the index is the candidate equi-join
    scan itself. Implies ``rank_by_index_freq``. Because the counts are
    exact and the (cnt, gram) order is total, the ranking — and hence
    the result — is bit-identical to the on-the-fly aggregate's.

    ``inline_strings``: carry BOTH sides' strings through the frames
    feeding the candidate equi-join (probe strings onto the prefix
    table, master strings onto the index rows) so the length filter and
    the banded ``levenshtein`` verify run INLINE in the candidate-join
    stage — the post-candidate id-keyed string joins disappear (two
    fewer hash probes per candidate row; measured ~15-20% off the
    verify stage at the sf0.1 54M-candidate regime). Only sound as a
    default-off opt-in because the index×strings attach is a
    master-scale join: callers enable it exactly when the master
    strings are broadcastable (the registered full-corpus re-link
    queries, which already pass ``F.broadcast(master)``); the streaming
    sink's batch≪master regime keeps the default, where the candidate
    stream is batch-bounded and attaching strings after it is the
    cheaper side. Results are invariant either way.

    Returns (left_id, right_id, left_s, right_s, edit_dist)."""
    prefix_len = max_dist * q + 1
    lg = left.select(F.col("id"), F.explode(qgrams(F.col("s"), q)).alias("gram"))
    if rank_by_index_freq or index_freq is not None:
        if index_freq is not None:
            ifreq = index_freq.groupBy("gram").agg(
                F.sum("cnt").cast("long").alias("cnt")
            )
        else:
            ifreq = right_index.groupBy("gram").agg(F.count("*").alias("cnt"))
        # the frequency table is DISTINCT-GRAM-bounded (alphabet^q, q
        # fixed at the call site for this probe path) — broadcast it so
        # the probe's occurrence stream never shuffles for the ranking
        # join (guide §3.1; the static planner can't size the aggregate)
        ranked = lg.join(F.broadcast(ifreq), "gram", "left").select(
            "id", "gram", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
        lp = (
            ranked.groupBy("id")
            .agg(
                F.slice(
                    F.array_sort(F.collect_set(F.struct("cnt", "gram"))),
                    1,
                    prefix_len,
                ).alias("pre")
            )
            .select("id", F.explode("pre.gram").alias("gram"))
            .withColumnRenamed("id", "left_id")
        )
    else:
        freq = lg.groupBy("gram").agg(F.count("*").alias("cnt"))
        lp = _prefix_grams(lg, freq, prefix_len).withColumnRenamed("id", "left_id")
    hint = F.broadcast if broadcast_probe else (lambda df: df)
    ls = left.select(F.col("id").alias("left_id"), F.col("s").alias("left_s"))
    rs = right_strings.select(
        F.col("id").alias("right_id"), F.col("s").alias("right_s")
    )
    if inline_strings:
        # strings ride the candidate join's inputs: the prefix table is
        # probe-tiny either way, and the caller asserts (broadcast hint)
        # that the master strings fit the index-side attach — so the
        # whole verify (length filter + banded levenshtein) runs in the
        # candidate-join stage with no post-candidate id joins
        idx_s = right_index.withColumnRenamed("id", "right_id").join(
            rs, "right_id"
        )
        return (
            hint(lp.join(ls, "left_id"))
            .join(idx_s, "gram")
            .where(F.abs(F.length("left_s") - F.length("right_s")) <= max_dist)
            .withColumn(
                "edit_dist",
                F.levenshtein("left_s", "right_s", max_dist).cast("int"),
            )
            .where(F.col("edit_dist") >= 0)
            .dropDuplicates(["left_id", "right_id"])
            .select("left_id", "right_id", "left_s", "right_s", "edit_dist")
        )
    cand = (
        hint(lp)
        .join(right_index.withColumnRenamed("id", "right_id"), "gram")
        .select("left_id", "right_id")
    )
    return _verify_pairs(cand, hint(ls), rs, max_dist)


__all__ = [
    "FuzzyJoinCandidateBlowup",
    "edit_distance_join",
    "edit_distance_join_indexed",
    "gram_index",
    "qgrams",
]
