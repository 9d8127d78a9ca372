"""Set-similarity (token-set) join — prefix-filtered Jaccard and
containment matching.

Record linkage on token SETS rather than character edits (the
complement of `operators/fuzzyjoin.py`: word order and word count
don't matter, whole-word substitutions do). Public algorithm family:
prefix filtering under a global token order (Chaudhuri, Ganti &
Kaushik, ICDE 2006), all-pairs with length filters (Bayardo, Ma &
Srikant, WWW 2007), PPJoin (Xiao, Wang, Lin & Yu, WWW 2008 — the
positional filter is omitted here; candidates go straight to the exact
verify, so results are invariant either way and only candidate volume
differs).

POSITIONAL FILTER — measured rejection (r12 optimization round, do not
re-try without a new argument): the PPJoin positional bound
min(i,j)+1+min(|x|−1−i, |y|−1−j) ≥ required-overlap was implemented
three ways and A/B-bracketed at sf0.1. It prunes **0.0 % of the 16M
containment candidate rows** (measured directly): under the global
rarity order a probe's rare prefix token sits near the FRONT of every
base array too (the set's other tokens are more common ⇒ larger ids),
so min(i,j) is always small and the tails always long — the bound
never fails on rarity-ordered prefix candidates. Expression shape made
it actively harmful besides: as a stacked ``.where`` Catalyst merged
it into the join condition BEHIND the array_intersect verify (no
short-circuit win), and as a CASE-WHEN guard around the intersect it
measured 7.3 s → 10.3 s (the conditional defeats the join-condition
codegen fast path). ``text/setjoin.py`` keeps its positional filter
for the document-shingle regime (large sets, deep prefixes) where the
geometry differs; here it is pure cost at every tested shape.

Why it scales — no all-pairs stage, and every filter is algebraic:

1. ONE pass tokenizes both sides and builds the global token-frequency
   order (count ASC, token ASC) — rarest first, so hot "stopword"
   tokens are never join keys (the same skew-robustness argument as the
   fuzzy join's gram prefix). The order is then DENSIFIED to integer
   token ids (injective, so integer arrays carry the exact set
   semantics), because the verify below runs tens of candidate
   intersections per emitted pair and long comparisons beat string
   hashing ~2× end-to-end (measured at sf0.1: 97 s → 50 s from int
   coding alone). The id assignment is a VOCABULARY-sized DISTRIBUTED
   ranking (`_dense_ids`: range-partition on the sort key, sort within
   partitions, monotonic ids — one shuffle, fully lazy) — never a
   global single-partition window, which would cap the operator at
   whatever vocabulary one task can sort (the 10⁸–10⁹-token web-corpus
   regime).
2. Jaccard ≥ t implies overlap ≥ ceil(t·|x|) on EACH side (since the
   union is at least either set), so a set only exposes its
   |x| − ceil(t·|x|) + 1 rarest tokens; two qualifying sets must share
   an exposed token (prefix-filter lemma with α = ceil(t·max(|x|,|y|)):
   each exposed prefix is at least the α-prefix). The length filter
   t·max ≤ min prunes cross-size pairs before the verify.
3. Verify is EXACT set algebra on the full token-id arrays, with an
   adaptive kernel: small-set pairs use a nested-scan membership count
   (no per-row hash-set allocation — a further 50 s → 31 s at sf0.1,
   where sets are 4 tokens), large-set pairs fall back to
   ``array_intersect``'s hash build. Thresholds are exact rationals
   (t_num/t_den): every comparison is BIGINT cross-multiplication,
   identical on any engine. Pair dedup runs AFTER the verify over the
   surviving matches (the measured Ed-Join lesson).

Containment (|x∩y| ≥ t·|x|) is the asymmetric variant — "query record
mostly inside a master record" — where only the probe side can be
prefix-filtered (the required overlap depends on |x| alone), so the
right side joins through its FULL token table by pigeonhole: a common
set of size ≥ α must hit one of the probe's first |x| − α + 1 tokens.

Like the fuzzy join, the prefix filter's weak regime is a small CLOSED
vocabulary (every token dense on both sides): candidates — and on
self-similar corpora the TRUE result — then grow quadratically.
``candidate_cap`` arms the sizing rule (the fuzzy join's discipline):
the exact bound Σ_token nl·nr is computed from the prefix tables
before the join and the blowup raises :class:`SetSimCandidateBlowup`
instead of silently running quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation


class SetSimCandidateBlowup(ValueError):
    """Raised by `token_jaccard_join` when ``candidate_cap`` is set and
    the prefix-filter candidate bound Σ_token nl·nr exceeds it — the
    CLOSED-VOCABULARY regime (every token dense on both sides, so even
    the rarest exposed tokens fan out quadratically; on self-similar
    corpora the TRUE result is quadratic too). Unlike the fuzzy join's
    q-escalation there is no result-invariant knob to turn — a longer
    "gram" would change which sets match — so the rule can only refuse:
    raise the threshold, block on a coarser key first, or switch to the
    bounded-output `token_jaccard_topk` form."""


def ws_tokens(s: Column) -> Column:
    """Distinct whitespace-separated tokens of ``s`` (array<string>;
    empty tokens dropped — matches ``string_split_regex(s, '\\s+')``
    + ``list_distinct`` on the SQL side)."""
    return F.array_distinct(
        F.filter(F.split(s, r"\s+"), lambda t: t != F.lit(""))
    )


def _ceil_frac(x: Column, num: int, den: int) -> Column:
    """ceil(num·x/den) in exact integer arithmetic."""
    return F.floor((x * F.lit(num) + F.lit(den - 1)) / F.lit(den)).cast(
        "long"
    )


def _dense_ids(freq: DataFrame) -> DataFrame:
    """(token, tid): integer token ids ORDER-FAITHFUL in (cnt ASC, token
    ASC) — smaller tid ⇔ rarer token — assigned WITHOUT a global
    single-partition sort.

    The naive ``row_number().over(Window.orderBy(...))`` moves the whole
    vocabulary through ONE task (Spark's "No Partition Defined" hazard):
    fine for part names, a hard ceiling for token-set ER over web text
    where the vocabulary is 10⁸–10⁹ tokens. The join semantics need ids
    that are only order-faithful and INJECTIVE — not dense — so the
    one-pass distributed shape suffices:

    1. ``repartitionByRange(cnt, token)`` range-partitions the vocabulary
       on the sort key — partition p's keys all precede partition p+1's,
       and the range partitioner balances ROW COUNTS via sampling, so the
       hapax bucket (typically half the vocabulary, all cnt=1) spreads
       over many partitions instead of landing on one.
    2. ``sortWithinPartitions`` orders each partition's own range — the
       per-task sort is |V|/numPartitions, bounded by config, not data.
    3. ``monotonically_increasing_id`` (partition_id·2³³ + row-number)
       is then globally ascending in (cnt, token) order: ascending within
       each sorted partition, and partition ids follow the range order.
       Non-dense (gaps between partitions) — harmless, the arrays carry
       ids only for ORDER (prefix = rarest) and EQUALITY (intersection).

    No checkpoint, no driver collect, no window — one shuffle of the
    vocabulary, fully lazy (measured: the two-pass dense-rank variant
    spent 2.7 s of fixed jobs at build time; this is one 2.4 s stage
    inside the query itself at a 1M-token vocabulary, PERF.md round 9).
    Order-faithfulness + injectivity asserted in
    tests/test_setsimjoin.py::TestDenseIds.

    Two-branch determinism note (audited round 12 after the
    `operators/windows.py` mid-divergence bug): the UNARMED joins
    consume `_ranked_sets` — and therefore this mid assignment — from
    both the left and right side-filters without a pin. That is safe
    here, unlike the ranking family's counts/data split, because the
    two consuming subtrees are byte-identical below the side filter
    (same scans, same exchanges, same runtime statistics), so AQE makes
    identical re-planning decisions for both evaluations even when the
    exchange is not physically reused — there is no structurally
    DIFFERENT sibling branch whose stats could diverge. The armed paths
    additionally localCheckpoint `sets` (one scan feeds bound + join),
    which pins the ids outright. Persisted-input determinism of the
    unarmed path is a standing regression test
    (tests/test_setsimjoin.py::TestDenseIds::
    test_unarmed_join_deterministic_over_persisted_input); 4
    adversarial sf0.1 trials (persisted input, shuffle partitions
    varied 7..200) reproduced zero divergence on 916k pairs."""
    return (
        freq.repartitionByRange(F.col("cnt"), F.col("token"))
        .sortWithinPartitions("cnt", "token")
        .select("token", F.monotonically_increasing_id().alias("tid"))
    )


def _ranked_sets(tagged: DataFrame) -> DataFrame:
    """(side, id, toks array<long>, sz): token-id arrays ascending in
    the global (count ASC, token ASC) rarity order shared by both sides
    — ascending id IS rarest-first, so the prefix is a ``slice``. One
    token scan feeds the frequency table; the id assignment
    (`_dense_ids` — distributed, no single-partition vocabulary sort) is
    injective, so integer-array intersections equal token-set
    intersections exactly."""
    tok = tagged.select(
        "side", "id", F.explode(ws_tokens(F.col("s"))).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    coded = _dense_ids(freq)
    return (
        tok.join(coded, "token")
        .groupBy("side", "id")
        .agg(F.array_sort(F.collect_list("tid")).alias("toks"))
        .withColumn("sz", F.size("toks").cast("long"))
    )


def _tag(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.select(F.lit("l").alias("side"), "id", "s").unionByName(
        right.select(F.lit("r").alias("side"), "id", "s")
    )


def _prefix(sets: DataFrame, keep: Column) -> DataFrame:
    """Explode each set's first ``keep`` token ids (its rarest) as join
    keys; carries toks/sz for the verify."""
    return sets.select(
        "id",
        "toks",
        "sz",
        F.explode(F.slice("toks", 1, keep)).alias("tid"),
    )


def _inter_size(a: Column, b: Column, sa: Column, sb: Column) -> Column:
    """|a ∩ b| for distinct-element arrays via the native ArrayIntersect
    codegen, unconditionally. The previous "adaptive" form (HOF nested
    scan below 256 comparisons, on the theory that ~16 long compares
    beat a hash-set build) measured 2.8× SLOWER on the 16M-pair
    containment verify at sf0.1 (12.7 s vs 4.6 s): the per-element
    lambda invocation overhead dwarfs the hash build, and
    ``size(filter(...))`` materializes a throwaway array per pair —
    allocation churn that also drove the stage's run-to-run GC variance
    (PERF.md round 10). ``sa``/``sb`` stay in the signature so a future
    engine-version re-measurement can re-introduce dispatch without
    touching call sites."""
    _ = (sa, sb)
    return F.size(F.array_intersect(a, b)).cast("long")


def token_jaccard_join(
    left: DataFrame,
    right: DataFrame,
    t_num: int = 3,
    t_den: int = 5,
    candidate_cap: int | None = None,
) -> DataFrame:
    """All (left.id, right.id) pairs whose distinct-token Jaccard is
    ≥ t_num/t_den. Inputs: (id, s). Returns (left_id, right_id,
    inter_cnt, union_cnt) — integer evidence columns, no floats.

    Sets with zero tokens match nothing (Jaccard undefined/0).

    ``candidate_cap`` arms the sizing rule (the fuzzy join's
    discipline): the exact pre-verify fan-out Σ_token nl·nr is computed
    from the two prefix tables before the equi-join runs; above the cap
    the join raises :class:`SetSimCandidateBlowup` naming the
    closed-vocabulary regime instead of silently running quadratic."""
    sets = _ranked_sets(_tag(left, right)).filter(F.col("sz") > 0)
    if candidate_cap is not None:
        sets = pin_single_evaluation(sets)  # one scan feeds bound + join
    keep = F.greatest(
        F.lit(1), (F.col("sz") - _ceil_frac(F.col("sz"), t_num, t_den) + 1)
    ).cast("int")
    lp = _prefix(sets.filter(F.col("side") == "l"), keep)
    rp = _prefix(sets.filter(F.col("side") == "r"), keep)
    if candidate_cap is not None:
        bound_row = (
            lp.groupBy("tid")
            .agg(F.count(F.lit(1)).alias("nl"))
            .join(rp.groupBy("tid").agg(F.count(F.lit(1)).alias("nr")), "tid")
            .agg(F.coalesce(F.sum(F.col("nl") * F.col("nr")), F.lit(0)).alias("b"))
            .first()
        )
        bound = int(bound_row["b"])
        if bound > candidate_cap:
            raise SetSimCandidateBlowup(
                f"closed-vocabulary token regime: prefix candidate bound "
                f"{bound} exceeds candidate_cap={candidate_cap}; raise the "
                f"threshold, block on a coarser key first, or use "
                f"token_jaccard_topk (bounded output)"
            )
    cand = (
        lp.select(
            F.col("id").alias("left_id"),
            F.col("toks").alias("l_toks"),
            F.col("sz").alias("l_sz"),
            "tid",
        )
        .join(
            rp.select(
                F.col("id").alias("right_id"),
                F.col("toks").alias("r_toks"),
                F.col("sz").alias("r_sz"),
                "tid",
            ),
            "tid",
        )
        # length filter: Jaccard ≥ t forces t·max(|x|,|y|) ≤ min(|x|,|y|)
        .where(
            F.greatest("l_sz", "r_sz") * t_num
            <= F.least("l_sz", "r_sz") * t_den
        )
    )
    inter = _inter_size(
        F.col("l_toks"), F.col("r_toks"), F.col("l_sz"), F.col("r_sz")
    )
    return (
        cand.withColumn("inter_cnt", inter)
        .withColumn("union_cnt", F.col("l_sz") + F.col("r_sz") - F.col("inter_cnt"))
        .where(F.col("inter_cnt") * t_den >= F.col("union_cnt") * t_num)
        .dropDuplicates(["left_id", "right_id"])
        .select("left_id", "right_id", "inter_cnt", "union_cnt")
    )


def _topk_rank_key() -> Column:
    """The top-k ranking key over (inter_cnt, union_cnt): floor(inter ·
    2^32 / union), guarded — a union at or above 2^16 tokens RAISES at
    execution (``raise_error`` inside the expression: no driver-side
    pre-scan job, no silent match loss) because the key is only
    collision-free below 2^16 (see `token_jaccard_topk`)."""
    return (
        F.when(
            F.col("union_cnt") < F.lit(1 << 16),
            F.floor(
                (F.col("inter_cnt") * F.lit(1 << 32)) / F.col("union_cnt")
            ),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("token_jaccard_topk: pair with union of "),
                    F.col("union_cnt"),
                    F.lit(
                        " tokens (>= 65536) — the exact-fraction ranking"
                        " key is only collision-free below 2^16; split"
                        " oversized sets or use token_jaccard_join"
                    ),
                )
            )
        )
        .cast("long")
    )


def token_jaccard_topk(
    probe: DataFrame,
    base: DataFrame,
    k: int = 1,
    floor_num: int = 2,
    floor_den: int = 5,
    exclude_same_id: bool = False,
) -> DataFrame:
    """For each probe record, its ``k`` best Jaccard matches in base
    among pairs with Jaccard ≥ floor_num/floor_den — the production ER
    shape: output is |probe|·k rows no matter how much duplicate mass
    the corpus holds (the all-pairs form's output is the corpus' true
    duplicate mass, which on self-similar corpora is quadratic).

    Ranking is EXACT fraction order without floats: the sort key
    floor(inter·2^32 / union) is order-faithful because two distinct
    Jaccards with unions < 2^16 differ by more than 2^-32 (|i1/u1 −
    i2/u2| ≥ 1/(u1·u2)), so their scaled floors cannot collide. A pair
    whose union reaches 2^16 tokens RAISES (``raise_error`` inside the
    key expression — no driver-side pre-scan job, and no silent match
    loss): split oversized sets or use `token_jaccard_join`. Ties break
    on base id ASC. Returns (probe_id, base_id, rank, inter_cnt,
    union_cnt)."""
    pairs = token_jaccard_join(probe, base, floor_num, floor_den)
    if exclude_same_id:
        pairs = pairs.where(F.col("left_id") != F.col("right_id"))
    w = Window.partitionBy("left_id").orderBy(
        F.desc("__key"), F.asc("right_id")
    )
    return (
        pairs.withColumn("__key", _topk_rank_key())
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            F.col("left_id").alias("probe_id"),
            F.col("right_id").alias("base_id"),
            "rank",
            "inter_cnt",
            "union_cnt",
        )
    )


def token_index(df: DataFrame) -> DataFrame:
    """FULL distinct-token inverted index of (id, s): one (id, token)
    row per distinct token — the maintained sidecar the one-sided probe
    (`token_jaccard_join_indexed`) joins against (the set-similarity
    twin of `fuzzyjoin.gram_index`)."""
    return df.select(
        F.col("id"), F.explode(ws_tokens(F.col("s"))).alias("token")
    )


def token_jaccard_join_indexed(
    probe: DataFrame,
    master_index: DataFrame,
    master_strings: DataFrame,
    t_num: int = 3,
    t_den: int = 5,
    index_freq: DataFrame | None = None,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Jaccard join of ``probe`` (id, s) against a PRE-BUILT token
    index (`token_index` rows (id, token)) plus its strings (id, s) —
    the incremental/streaming variant.

    ``broadcast_probe`` (default True — the streaming-sink regime,
    where ``probe`` is one micro-batch): hint the probe's prefix table
    broadcast so the at-rest index is scanned map-side with no shuffle.
    Set False when the probe is MASTER-sized (the registered
    full-corpus re-link query): a corpus-sized broadcast is an
    executor-memory ceiling; AQE then picks the join side from runtime
    sizes. Results are invariant either way. The maintained index serves
    CANDIDATE GENERATION (the expensive, shuffle-bearing stage: no
    per-probe re-tokenize/re-rank of the master to find who to compare);
    the exact VERIFY then re-derives the candidate masters' token arrays
    from ``master_strings`` in one map-side pass (tokenize is per-row
    codegen; the join keys on master_id and AQE broadcasts whichever
    side is small, so the at-rest master is scanned, not shuffled, in
    the common batch≪master regime).

    One-sided prefix filtering: Jaccard ≥ t implies overlap ≥
    ceil(t·|probe|), and a probe prefix that excludes only
    ceil(t·|probe|) − 1 tokens must, by pigeonhole, share a token with
    any qualifying master set — against the master's FULL index, for
    ANY probe-token ranking (ranking only tunes candidate volume). The
    tiny prefix table is broadcast, so the index is scanned map-side —
    no shuffle of the at-rest index.

    ``index_freq``: a MAINTAINED (token, cnt) table whose summed counts
    equal the index's per-token frequencies (the setsim sink's
    ``tokfreq`` sidecar) — the probe then ranks its prefix by INDEX
    frequency (candidate-volume-minimizing: an index-absent token can
    never be the pigeonhole survivor, so spending prefix slots on rare
    or absent tokens is free pruning) with no aggregate over the full
    index. Without it, batch-local frequency ranking (self-contained).

    Returns (probe_id, master_id, inter_cnt, union_cnt)."""
    tok = token_index(probe)
    if index_freq is not None:
        ifreq = index_freq.groupBy("token").agg(
            F.sum("cnt").cast("long").alias("cnt")
        )
        ranked = tok.join(ifreq, "token", "left").select(
            "id", "token", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
    else:
        freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
        ranked = tok.join(freq, "token")
    psets = ranked.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("cnt", "token"))),
            lambda p: p["token"],
        ).alias("p_toks")
    ).withColumn("p_sz", F.size("p_toks").cast("long"))
    keep = F.greatest(
        F.lit(1),
        (F.col("p_sz") - _ceil_frac(F.col("p_sz"), t_num, t_den) + 1),
    ).cast("int")
    pp = psets.select(
        F.col("id").alias("probe_id"),
        "p_toks",
        "p_sz",
        F.explode(F.slice("p_toks", 1, keep)).alias("token"),
    )
    cand = (F.broadcast(pp) if broadcast_probe else pp).join(
        master_index.withColumnRenamed("id", "master_id"), "token"
    )
    ms = master_strings.select(
        F.col("id").alias("master_id"),
        ws_tokens(F.col("s")).alias("m_toks"),
    ).withColumn("m_sz", F.size("m_toks").cast("long"))
    inter = _inter_size(
        F.col("p_toks"), F.col("m_toks"), F.col("p_sz"), F.col("m_sz")
    )
    return (
        cand.select("probe_id", "master_id", "p_toks", "p_sz")
        .join(ms, "master_id")
        # length filter before the verify (same invariant as two-sided)
        .where(
            F.greatest("p_sz", "m_sz") * t_num
            <= F.least("p_sz", "m_sz") * t_den
        )
        .withColumn("inter_cnt", inter)
        .withColumn(
            "union_cnt", F.col("p_sz") + F.col("m_sz") - F.col("inter_cnt")
        )
        .where(F.col("inter_cnt") * t_den >= F.col("union_cnt") * t_num)
        .dropDuplicates(["probe_id", "master_id"])
        .select("probe_id", "master_id", "inter_cnt", "union_cnt")
    )


#: Mean candidate fan-out per distinct prefix token above which the
#: containment join CONSIDERS salting its verify join (see
#: token_containment_join): ~50k array intersections is a fraction of one
#: task's fair share on any sane partition count, so below it salting only
#: adds replication cost.
_SALT_FAN_THRESHOLD = 50_000

#: Salting additionally requires the probe-prefix table to be too large to
#: broadcast: below this row count Spark plans the verify join as a
#: BroadcastHashJoin (prefix hash table on every core, base tokens stream
#: map-side) — already perfectly parallel whatever the tid skew, and
#: measured 1.5× FASTER than the salted shuffle at sf0.1 (PERF.md round
#: 10: 15.6-19.3 s unsalted vs 22.9-24.9 s salted on the 25-hot-token
#: parts corpus). Salting pays only in the sort-merge regime where a
#: corpus-scale prefix table shuffles on tid and hot ids straggle.
_SALT_MIN_PREFIX_ROWS = 2_000_000

#: Hard ceiling on the salt factor. The salt replicates the probe-prefix
#: table ×salt_n, so salt_n must be bounded independently of cluster
#: width: at the arming minimum (2M prefix rows) a 32-way salt costs a
#: bounded 64M replicated rows, while inheriting
#: spark.sql.shuffle.partitions (200-2000 on a real cluster) would cost
#: 0.4-4B — a cost cliff in exactly the sort-merge regime the salt
#: targets.
_SALT_MAX = 32


def token_containment_join(
    probe: DataFrame,
    base: DataFrame,
    t_num: int = 4,
    t_den: int = 5,
    candidate_cap: int | None = None,
) -> DataFrame:
    """All (probe.id, base.id) pairs with |probe ∩ base| ≥ t·|probe|
    (asymmetric containment — the probe's tokens are mostly inside the
    base record, whatever else the base holds). Returns (probe_id,
    base_id, inter_cnt, probe_sz).

    Only the probe side prefix-filters; the base side joins through its
    full token table (complete by pigeonhole — see module docstring).

    ``candidate_cap`` arms the sizing rule: the exact pre-verify
    fan-out Σ_token n_prefix·n_base is computed from the probe prefix
    and base token tables before the equi-join; above the cap the join
    raises :class:`SetSimCandidateBlowup` instead of silently running
    quadratic (the containment bound is naturally larger than the
    Jaccard form's — the base side exposes ALL its tokens).

    The same pre-join bound detects the HOT-KEY regime short of the cap:
    a closed vocabulary concentrates the candidate mass on a handful of
    token ids (sf0.1 parts: 25 distinct prefix tokens carry 16M pairs).
    When the probe-prefix table is small enough to broadcast that skew is
    harmless — the verify join plans as a BroadcastHashJoin and the
    intersect work parallelizes over the BASE token partitions, whatever
    the tid histogram (the plan golden pins this; salting here was
    measured a 1.5× pessimization). Only when the prefix side ALSO
    outgrows broadcast (``_SALT_MIN_PREFIX_ROWS`` — the corpus-scale
    sort-merge regime, where hot tids really do straggle) does the join
    salt: base tokens key on (tid, hash(base_id) % S), the probe prefix
    replicates ×S, and every (probe, base) pair still meets exactly once
    per shared tid, so the result is identical."""
    sets = _ranked_sets(_tag(probe, base))
    if candidate_cap is not None:
        sets = pin_single_evaluation(sets)  # one scan: bound + join
    ps = sets.filter((F.col("side") == "l") & (F.col("sz") > 0))
    bs = sets.filter((F.col("side") == "r") & (F.col("sz") > 0))
    keep = F.greatest(
        F.lit(1), (F.col("sz") - _ceil_frac(F.col("sz"), t_num, t_den) + 1)
    ).cast("int")
    pp = _prefix(ps, keep).select(
        F.col("id").alias("probe_id"),
        F.col("toks").alias("p_toks"),
        F.col("sz").alias("probe_sz"),
        "tid",
    )
    bt = bs.select(
        F.col("id").alias("base_id"),
        F.col("toks").alias("b_toks"),
        F.col("sz").alias("b_sz"),
        F.explode("toks").alias("tid"),
    )
    salt_n = 0
    if candidate_cap is not None:
        bound_row = (
            pp.groupBy("tid")
            .agg(F.count(F.lit(1)).alias("np"))
            .join(bt.groupBy("tid").agg(F.count(F.lit(1)).alias("nb")), "tid")
            .agg(
                F.coalesce(F.sum(F.col("np") * F.col("nb")), F.lit(0)).alias(
                    "b"
                ),
                F.count(F.lit(1)).alias("n_tids"),
                F.coalesce(F.sum("np"), F.lit(0)).alias("n_prefix"),
            )
            .first()
        )
        bound = int(bound_row["b"])
        n_tids = int(bound_row["n_tids"])
        n_prefix = int(bound_row["n_prefix"])
        if bound > candidate_cap:
            raise SetSimCandidateBlowup(
                f"closed-vocabulary token regime: containment candidate "
                f"bound {bound} exceeds candidate_cap={candidate_cap}; "
                f"raise the threshold or block on a coarser key first"
            )
        if (
            n_tids
            and bound // n_tids > _SALT_FAN_THRESHOLD
            and n_prefix > _SALT_MIN_PREFIX_ROWS
        ):
            # Size the salt from the measured skew (mean per-tid fan over
            # the straggler threshold), hard-capped at _SALT_MAX: the salt
            # replicates the ENTIRE probe-prefix table ×salt_n, and the
            # arming condition already guarantees that table exceeds
            # _SALT_MIN_PREFIX_ROWS — tying salt_n to
            # spark.sql.shuffle.partitions (200-2000 on a real cluster)
            # would make the replication itself the blowup. 32 ways is
            # enough to split any single hot tid across a full executor's
            # worth of tasks; the cap bounds replication at
            # n_prefix × 32 regardless of cluster config.
            try:
                shuffle_n = int(
                    probe.sparkSession.conf.get(
                        "spark.sql.shuffle.partitions", "200"
                    )
                )
            except (TypeError, ValueError):  # e.g. "auto" on some platforms
                shuffle_n = 200
            fan = bound // n_tids
            salt_n = min(
                _SALT_MAX,
                max(2, shuffle_n),
                max(2, fan // max(1, _SALT_FAN_THRESHOLD)),
            )
    join_keys = ["tid"]
    if salt_n:
        pp = pp.withColumn(
            "_salt",
            F.explode(
                F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<int>")
            ),
        )
        bt = bt.withColumn(
            "_salt", F.pmod(F.hash("base_id"), F.lit(salt_n)).cast("int")
        )
        join_keys = ["tid", "_salt"]
    inter = _inter_size(
        F.col("p_toks"), F.col("b_toks"), F.col("probe_sz"), F.col("b_sz")
    )
    return (
        pp.join(bt, join_keys)
        .withColumn("inter_cnt", inter)
        .where(F.col("inter_cnt") * t_den >= F.col("probe_sz") * t_num)
        .dropDuplicates(["probe_id", "base_id"])
        .select("probe_id", "base_id", "inter_cnt", "probe_sz")
    )


__all__ = [
    "SetSimCandidateBlowup",
    "token_containment_join",
    "token_index",
    "token_jaccard_join",
    "token_jaccard_join_indexed",
    "token_jaccard_topk",
    "ws_tokens",
]
