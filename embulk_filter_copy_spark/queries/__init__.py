"""Query catalog: every implemented operator category from SURVEY.md §2 has
an entry here, as (spark_callable, duckdb_oracle_sql | None) pairs.

Column-name discipline: every computed column is aliased IDENTICALLY in the
Spark plan and the oracle SQL (the driver hash-compares values after sorting
columns by name). Float outputs are rounded on BOTH sides so cross-engine
summation order can't flip a hash.

Registration ORDER is verification policy, not cosmetics: the driver's
correctness harness reports the first 50 registered queries, so queries
that have never had a driver-oracle row (or whose semantics changed this
round) register FIRST, ahead of long-green rows. The local DuckDB parity
suite (`tests/test_queries_vs_duckdb.py`) still checks every entry each
run regardless of position.
"""

from embulk_filter_copy_spark.queries.cdc_queries import QUERIES as CDC_QUERIES
from embulk_filter_copy_spark.queries.pipeline import QUERIES as PIPELINE_QUERIES
from embulk_filter_copy_spark.queries.tpch import QUERIES as TPCH_QUERIES

_MERGED: dict = {}
for m in (CDC_QUERIES, TPCH_QUERIES, PIPELINE_QUERIES):
    dup = set(m) & set(_MERGED)
    assert not dup, f"duplicate query names: {dup}"
    _MERGED.update(m)

# Verification priority (round 5 rotation): the six NEW round-5 queries
# (changelog images, incremental agg view, rollback replay, audit gate,
# shard merge, patch-dup replay) plus the one whose OUTPUT changed
# (text_quality_rules grew six rule columns) register first, followed by
# the 22 rows deprioritized in round 4 — their newest driver rows are from
# round 3, the rotation policy's age limit, so they re-enter the window
# now. Unlisted mid-catalog queries fill the remaining first-50 slots;
# the handful that slip past 50 are round-4 green (one round old) and
# stay covered by the local DuckDB parity suite every run.
_PRIORITY = [
    "cdc_changelog_images",
    "cdc_incremental_agg",
    "cdc_rollback_replay",
    "cdc_audit_gate",
    "cdc_shard_merge_replay",
    "cdc_range_scan",
    "cdc_ddl_replay",
    "cdc_patch_replay_dups",
    "text_quality_rules",
    "text_fingerprint_stats",
    "multimodal_metadata",
    "join_broadcast_segment",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "window_running_revenue",
    "agg_rollup_flags",
    "set_ops_brands",
    "global_topk_lineitems",
    "scalar_battery",
    "json_extract_props",
    "agg_cube_events",
    "cdc_out_of_order_rate",
    "dedup_simhash64_pairs",
    "ann_ivf_joinpath_topk",
    "dedup_jaccard_pairs",
    "window_topk_orders_per_segment",
    "join_range_click_purchase",
    "q5_local_supplier_volume",
    "q3_shipping_priority",
    "dedup_components_star",
    "dedup_minhash_signatures",
]

# Fresh round-4 green rows (CORRECTNESS_r04) yield their first-50 slot to
# the rotation; they remain fully covered by the local parity suite every
# run and rotate back in next round.
_DEPRIORITIZED = [
    "multimodal_features",
    "sample_docs_by_hash",
    "sample_stratified_docs",
    "pack_training_sequences",
    "text_scrub_pii",
    "text_repetition_stats",
    "dedup_incremental_signatures",
    "decontam_ngram_overlap",
    "dedup_span_stats",
    "sample_assign_shards",
    "sample_mixture_weights",
    "text_unigram_logprob",
    "dedup_trim_spans",
    "ann_ivf_kmeans_topk",
    "dedup_embedding_kmeans",
    "dedup_embedding_keep_list",
    "cdc_patch_fold",
    "sample_leakage_safe_split",
    "sample_domain_token_cap",
    "ann_ivf_recall",
    "cdc_temporal_join",
    "pipeline_build_corpus",
]

for n in _PRIORITY + _DEPRIORITIZED:
    assert n in _MERGED, f"unknown query in ordering policy: {n}"

ALL_QUERIES: dict = {}
for n in _PRIORITY:
    ALL_QUERIES[n] = _MERGED[n]
for n, v in _MERGED.items():
    if n not in ALL_QUERIES and n not in _DEPRIORITIZED:
        ALL_QUERIES[n] = v
for n in _DEPRIORITIZED:
    ALL_QUERIES[n] = _MERGED[n]

__all__ = ["ALL_QUERIES"]
