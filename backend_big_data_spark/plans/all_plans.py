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
#: then everything else oldest-row-first. The round-9 window below is that
#: output with two adjustments the tool can't know: (a) queries whose
#: implementing files DRIFTED this round are promoted (the setsim pair —
#: `operators/setsimjoin.py` was rewritten to distribute the token-id
#: assignment, so their r08 rows certify the old code), and (b) queries
#: REGISTERED this round get same-round slots appended up front.
_FRONT = [
    # -- (a) round-8 post-window registrations (first driver rows) ----------
    "doc_wordpiece_token_stats",
    "part_token_best_match",
    "part_token_jaccard_indexed",
    # -- (b) round-9 drift: operators/setsimjoin.py rewritten ----------------
    "part_token_jaccard_match",
    "part_token_containment_match",
    # -- (c) round-9 registrations (same-round driver slots; uncommented as
    #        each lands — _reorder() asserts every _FRONT name is registered)
    "part_token_best_match_stream",
    "doc_kn3_trigram_model",
    "doc_kn3_perplexity",
    "doc_kn_incremental_model",
    "doc_kn3_incremental_model",
    "doc_kn_crossfold_perplexity",
    "doc_ccnet_ppl_buckets",
    "doc_kn_stream_scored",
    "part_fuzzy_best_match_stream",
    "embedding_margin_pairs",
    "embedding_margin_pairs_lsh",
    "embedding_trunc_recall",
    "supply_graph_kcore",
    "embedding_covariance",
    "embedding_margin_link_stream",
    "ann_multiprobe_topk",
    "embedding_cov_incremental",
    "embedding_drift_report",
    # -- (d) generated: oldest external rows first (r04 block, then r05) ----
    "pricing_summary",
    "revenue_by_region",
    "revenue_forecast",
    "part_min_price_suppliers",
    "dominant_part_suppliers",
    "customer_spend_deciles",
    "ann_ivf_topk",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_sq8_topk",
    "ann_ivf_sq8_topk",
    "embedding_random_projection",
    "doc_repetition_mix",
    "q4_order_priority",
    "q8_market_share",
    "q13_order_count_distribution",
    "q16_parts_supplier_counts",
    "q22_sales_opportunity",
    "kmeans_embedding_clusters",
    "doc_token_itemsets",
    "q7_volume_shipping",
    "q9_product_profit",
    "q12_shipping_tiers",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "doc_segment_dedup",
    "doc_blocklist_filter",
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
]
# Round-10 rotation note: regenerate with
# ``python tools/gen_query_index.py --rotation 50`` once CORRECTNESS_r09
# lands; promote any queries whose implementing files drift in round 9
# after this window freezes, and append round-10 registrations up front.
# The tool's QUERIES.md now carries a per-query "newest row / age" column
# so staleness is auditable without reading the JSON files.


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
