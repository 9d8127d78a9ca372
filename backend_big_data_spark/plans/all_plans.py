"""Import every plan module so the registry is fully populated.

Import order is registration order, and external correctness tooling may
adjudicate only a PREFIX of the registry (a ~50-slot window) — so the
window rotates per round to keep a current certification on every slice:
r02 covered the SURVEY §2 core, r03 the additive documents/dedup/
streaming/ANN scope, r04 the never-checked six + that round's drifted
files, r05 the late-r04 batch, r06 the r05 drift/spill/post-window
backlog (50/50 green — zeroing the never-checked set). Queries outside
the current window rely on their newest prior green row plus the in-repo
oracle-parity pytest; the per-round rotation note below queues what the
next round must lead with.
"""

from backend_big_data_spark.plans import (  # noqa: F401
    relational,
    photo_plans,
    subqueries,
    tpch_extra,
    advanced,
    documents,
    embeddings_events,
    extended,
    ml_plans,
    round4,
    tpch_suite,
    curation,
    round4b,
    round5,
    round5b,
    round6,
    round6b,
    round6c,
    round7,
    round7b,
    round7c,
    round7d,
    round8,
    round9,
    round9b,
    round10,
)
from backend_big_data_spark.plans.registry import ORACLES, QUERIES  # noqa: F401

#: Names pinned to the front of the registry, in order. Everything not named
#: here follows in its original registration order.
#:
#: From round 9 on, the window is GENERATED, not hand-maintained:
#: ``python tools/gen_query_index.py --rotation 50`` reads every
#: CORRECTNESS_r*.json, computes each query's newest fully-green external
#: driver row, and emits never-checked queries first (registration order)
#: then everything else oldest-row-first. The round-10 window below is
#: that output with two adjustments the tool can't know: (a) queries
#: whose implementations or oracle SQL DRIFTED this round are promoted
#: (their prior rows certify the old code), and (b) queries REGISTERED
#: this round get same-round slots appended up front.
_FRONT = [
    # -- (a) round-10 registrations (first driver rows) ---------------------
    "embedding_pca_project",
    "embedding_drift_from_moments",
    "lineitem_price_deciles",
    "doc_bm25_from_index",
    "doc_tfidf_from_index",
    "doc_hybrid_from_index",
    "lineitem_exact_quantiles",
    "events_user_kmv",
    "source_vocab_kmv_overlap",
    "events_user_kmv_merged",
    # -- (b) round-10 drift: implementations or ORACLE SQL changed this
    #        round, so their r07/r09 rows certify old code — the exact-ntile
    #        family was redistributed (plans/round4b.py, tpch_extra.py,
    #        relational.py, operators/windows.py), the margin-family oracles
    #        gained the 0/0 CASE guard and the cov/kcore queries their
    #        ADVICE fixes (plans/round9b.py). All 10 were hash-certified at
    #        sf0.01 AND sf0.1 via tools/driver_sim.py when the change
    #        landed; these slots add the external driver rows.
    "customer_spend_deciles",
    "customer_spend_ranking",
    "embedding_margin_pairs",
    "embedding_margin_pairs_lsh",
    "embedding_margin_link_stream",
    "embedding_cov_incremental",
    "embedding_drift_report",
    "supply_graph_kcore",
    "doc_tfidf_top_terms",
    # -- (c) generated: oldest external rows first (the full r05 block +
    #        the two oldest r06 rows; customer_rfm_segments and
    #        events_power_users_pareto are both stale AND drifted) --------
    "doc_snapshot_diff",
    "events_funnel_conversion",
    "doc_corpus_dedup_best",
    "ann_pq_topk",
    "ann_ivf_pq_topk",
    "doc_prefix_join_pairs",
    "doc_cleaning_pipeline_funnel",
    "doc_dsir_weights",
    "doc_pii_redacted",
    "doc_bigram_perplexity",
    "doc_unimax_mix",
    "embedding_hard_negatives",
    "doc_dsir_resampled",
    "doc_bm25_search",
    "doc_hybrid_search",
    "doc_similar_to_query",
    "embedding_training_triplets",
    "doc_removal_audit",
    "events_retention_cohorts",
    "customer_rfm_segments",
    "events_stickiness_daily",
    "part_pair_lift",
    "embedding_dup_triangles",
    "corpus_token_budget",
    "embedding_dup_degree_hist",
    "doc_gopher_quality",
    "doc_repetition_profile",
    "customer_ltv_cohorts",
    "events_power_users_pareto",
    "corpus_vocab_growth",
    "order_value_histogram",
]
# Round-10 window arithmetic: the r09 staleness backlog was exactly 50
# (38 r05 + 12 r06), but 10 new registrations + 9 drifted promotions
# (incl. doc_tfidf_top_terms, r06-stale AND refactored through the
# shared text/bm25.tfidf_top_terms finisher this round) eat 19 slots,
# so seven r05 rows (nation_supplier_hhi, events_interarrival_profile,
# events_user_lifecycle, events_ab_readout, orders_seasonality_index,
# doc_field_completeness, doc_filter_overlap) and the 12 r06 rows
# (orders_page3, parts_search_union, multimodal_fingerprint ..
# doc_incremental_dedup) slip to round 11 — all unchanged on disk,
# pytest-green, and they lead the r11 generated rotation. Every slipped
# r05 row was dual-scale spot-replayed via driver_sim at round close as
# compensation. QUERIES.md's
# generated "Rotation ceiling" table now projects max-age per window
# size so this trade-off is argued with data.
# Round-11 rotation note: regenerate with
# ``python tools/gen_query_index.py --rotation 50`` once CORRECTNESS_r10
# lands; promote any queries whose implementing files drift after this
# window freezes, and append round-11 registrations up front.


def _reorder() -> None:
    """Rebuild the registry dicts in-place so iteration starts at ``_FRONT``.

    In-place (clear + update) because other modules hold references to these
    dict objects.
    """
    missing = [n for n in _FRONT if n not in QUERIES]
    assert not missing, f"_FRONT names not registered: {missing}"
    q = {n: QUERIES[n] for n in _FRONT}
    q.update({n: f for n, f in QUERIES.items() if n not in q})
    o = {n: ORACLES[n] for n in _FRONT if n in ORACLES}
    o.update({n: s for n, s in ORACLES.items() if n not in o})
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


_reorder()
