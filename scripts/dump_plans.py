"""Dump formatted physical plans for the headline queries to PLANS.md.

The scale story lives in the physical plans (broadcasts, pushdown,
exchange counts, WindowGroupLimit, Expand) — this artifact makes it
reviewable without re-running anything. Regenerate after plan-shaping
changes: python scripts/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"

# (query, what the plan should show)
HEADLINE = [
    ("pricing_summary", "TPC-H Q1 shape: pushed filters, pruned scan, two-phase agg"),
    ("daily_events", "count-distinct Expand + bounded (date,type) shuffle"),
    ("region_revenue", "dimension broadcasts, fact pre-aggregation"),
    ("table_profile", "one scan + Expand multi-distinct profile"),
    ("dq_assertions", "fused per-table check aggregates + broadcast anti-join FKs"),
    ("value_quantile_sketch", "sketch build/merge aggs; windows only over the bin table"),
    ("value_drift_psi", "one scan, 2-feature explode, bounded (feature,bin) agg, report-sized PSI reduce"),
    ("latest_event_per_user", "single-exchange WindowGroupLimit argmax"),
    ("sessionization", "one user exchange, session_window-free lag/cumsum chain"),
    ("jaccard_near_dups", "PRIMARY: hot-shingle cap before the expansion self-join"),
    ("minhash_near_dups", "PRIMARY: signature shuffle -> band explode -> bucket cap -> equi-join (no cartesian)"),
    ("simhash_near_dups_capped", "count-window bucket cap; its exchange feeds the band self-join"),
    ("minhash_decontamination", "corpus bands vs BROADCAST benchmark bands"),
    # incremental_embedding_dedup is lazily localCheckpointed stage-by-
    # stage (its branches would otherwise re-derive the bucket pipeline
    # — a measured 86-scan plan), so its static explain truncates to
    # the checkpoint tail and isn't reviewable here.
    ("epoch_shuffle", "per-(epoch, shard) windows only — no global sort"),
    ("quality_score_calibration", "per-source percent_rank window — no global sort"),
    ("media_perceptual_dedup", "mapInPandas thumbnail -> two map-side-combinable hash aggs"),
    ("leakage_safe_split", "connected-components composition + pure-projection split"),
    ("embedding_lsh_near_dups", "bucketed self-equi-join (no crossJoin)"),
    ("embedding_pq_topk", "broadcast LUT ADC + shortlist re-rank"),
    ("training_data_selection", "two-phase token budget, no corpus-wide window"),
    ("weighted_sample_docs", "A-Res priorities + TakeOrderedAndProject top-k"),
    ("dsir_importance_weights", "broadcast log-ratio table onto hashed n-gram stream"),
    ("line_dedup_docs", "line-frequency shuffle + anti-join, order-preserving reassembly"),
    ("embedding_decontamination", "corpus LSH cells vs BROADCAST benchmark cells + exact verify"),
    ("event_association_rules", "basket self-join bounded by type domain, broadcast rule assembly"),
    ("stratified_sample_events", "broadcast policy onto one scan — zero exchanges"),
    ("hard_negative_mining", "broadcast anchors x one corpus scan, label filter before window"),
    ("ab_test_cuped", "one user shuffle -> rounded moments -> scalar CUPED algebra"),
    ("daily_value_ewma", "day rollup (exchange reused) + broadcast distinct-lag weights"),
    ("daily_value_cusum", "two cumulative windows over the bounded day table"),
    # round-7 additions
    ("km_time_to_purchase", "two user-keyed aggs on one key; KM windows over the horizon-bounded life table"),
    ("part_copurchase_triangles", "compact-forward: OUT-adjacency arrays (each <= sqrt(2m)) + array_intersect at lowest edges (no wedge relation)"),
    ("purchase_mean_bootstrap_ci", "replicate explode -> B-keyed combinable aggregate; rank window over the B-row table"),
    ("containment_dup_pairs", "same shingle equi-join shape as jaccard (asymmetric ratio only)"),
    ("span_corruption_pairs", "one linear aggregate() fold per row, inline()-expanded once — no Python, no corpus shuffle"),
    ("temperature_sampling_weights", "lang-keyed token agg; normalizing windows over the lang-bounded table"),
    # round-8 additions: the rest of the top-10-by-bench-cost queries,
    # so the most expensive plans are reviewable without rerunning
    ("part_link_prediction", "capped neighbor lists folded into bounded arrays (one shuffle, no self-join); left_anti existing edges; TakeOrderedAndProject top-k"),
    ("part_copurchase_kcore", "checkpointed symmetric edges; per-round survivor semi-joins (broadcastable) + keyed count"),
    ("doc_topic_clusters", "portable Lloyd final-assignment plan (per-round collects are k x (dims+1) scalars, not shown statically)"),
    ("dedup_recall_report", "three pair pipelines over ONE lazily-checkpointed shingle table; report reduces pair KEYS only"),
    ("corpus_build_manifest", "end-to-end funnel: filters -> dedup -> split with no corpus-wide window"),
    ("simhash_near_dups", "56-bit portable fingerprints, 4x14-bit pigeonhole bands, bit_count verify"),
    ("dedup_clusters", "large-star/small-star connected components over banded candidate pairs"),
    ("corpus_release_report", "ONE scan -> Expand multi-distinct -> 9-row report; no joins anywhere"),
    ("classifier_eval_report", "one corpus pass -> doc scores -> 20-row bin windows; integer-lattice AUC"),
    ("kmv_set_operations", "two distinct-hash aggs -> 256-row TakeOrderedAndProject sketches -> semi-join algebra"),
    ("oov_rate_by_lang", "word-count agg -> top-K TakeOrderedAndProject BROADCAST onto the token stream"),
    ("chunk_dedup", "scan -> window explode -> md5 -> ONE hash-keyed groupBy (no joins)"),
    # round-9 additions: the remaining top-cost queries a reader could
    # not inspect without rerunning (#2 and #11 by r8 bench cost)
    ("part_copurchase_communities", "shared edge checkpoint; per-round neighbor-key join + (node,label) count + WindowGroupLimit argmax, fixed rounds"),
    ("part_entity_resolution", "raw+dirty union -> block-df cap (hot blocks dropped pre-join) -> within-block levenshtein -> star-contraction components"),
    # round-9 retrieval family
    ("bm25_topk_docs", "broadcast query terms vs the corpus tf table (inverted-index access); exact-int stats; decimal-summed scores; per-query rank window"),
    ("hybrid_search_rrf", "RRF full-outer join of the BM25 and BUCKETED semantic top-k tables; dense candidates via the session-cached hashed-BoW LSH index (broadcast query buckets), exact TF-cosine re-rank on candidate postings only"),
    ("memorization_span_report", "broadcast benchmark grams; islands window over MATCHED positions only (hit-volume, never corpus-volume)"),
    ("source_ablation_report", "ONE corpus scan -> exact-integer per-source aggregates; ablation by window algebra + a (hash,source) dup correction"),
    # round-9 finale additions
    ("shapley_attribution", "one user-keyed journey window pass; 2^n mask lattice + exact-set rate table joined via broadcasts (bounded algebra)"),
    ("prf_query_expansion", "broadcast feedback-doc list onto the tf table (postings-only); broadcast anti-join excludes original terms; bounded rank window"),
    ("curriculum_data_order", "per-(band, shard) windows only — no corpus-global sort; bounded band-offset cumsum broadcast back"),
    ("zipf_law_fit", "vocab-keyed count -> TakeOrderedAndProject top-K -> 100-row OLS reduce"),
    ("uplift_qini_report", "per-user keyed aggregates -> bounded bucket table -> Qini cumulative window on <= 13 rows"),
    # round-10 additions
    ("target_encoding_oof", "ONE (category, fold) fact aggregate; OOF algebra via windows over the bounded cell table; NULL when a category has no out-of-fold rows"),
    ("pmi_collocations", "two keyed count aggregates + bigram->unigram equi-joins; 1-row totals broadcast; global top-k = TakeOrderedAndProject"),
    ("part_hits_authorities", "two integer mutual-reinforcement rounds, each one keyed equi-join + map-side-combinable sum over the distinct bipartite edge table; top-k = TakeOrderedAndProject, max = 1-row broadcast"),
    ("embedding_drift_report", "one posexplode -> (dim, grp) map-side aggregate; SMD algebra on the 2x64 cell table from rounded sufficient statistics"),
    ("matryoshka_recall_report", "broadcast anchors x widened corpus scan; _let-bound shared products/squares arrays feed all four prefix variants through one inline()"),
    # round-10 second wave
    ("mann_whitney_u", "one events scan -> tie-table aggregate; rank window over the distinct-value table only; 1-row integer algebra"),
    ("ratio_metric_delta_ci", "two shuffles total (per-user grain, then 2 variant rows of integer sufficient statistics); no joins"),
    ("chi_square_independence", "grid rebuilt from broadcast total crosses; windows over the type x variant grid only"),
    ("ipw_treatment_effect", "one stratum-keyed aggregate -> 1-row Hajek fold; single scan"),
    ("fellegi_sunter_weights", "capped ER blocking self-join; 4-field stack -> bounded-key aggregate"),
    ("part_degree_assortativity", "session edge checkpoint -> keyed degree joins -> 1-row moment reduce"),
    ("mmr_diverse_topk", "BM25 arm + candidate-pushdown sim matrix (isin filter reaches the tf scan); greedy runs driver-side on bounded collects"),
    ("doc_pareto_front", "per-length maxima + ONE running-max window over the distinct-length table; equi-join back (skyline without all-pairs dominance)"),
    ("conformal_interval_report", "fold-filtered aggregates off one scan; k-th order statistic via the distinct-residual count table"),
    ("isotonic_calibration_map", "classifier's single keyed shuffle; PAV minimax as interval algebra over the bounded bin table"),
    ("daily_acf", "events -> bounded daily table; 7x broadcast replicate + per-lag lead windows over it"),
    ("quantile_treatment_effects", "per-variant ntile over deterministic order (exact baseline); 10x2 bounds table + broadcast decile join"),
    ("lang_id_confusion", "one scan -> bounded (true, pred) grid; all joins over the language domain"),
    ("part_clustering_coefficient", "triangle pipeline + keyed degree count; LEFT join keeps zero-triangle nodes; band aggregate"),
    ("user_event_overdispersion", "one user-keyed aggregate -> 1-row moment reduce"),
]


def main() -> None:
    from clickstreamtoclickhouse_spark import plans
    from clickstreamtoclickhouse_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", cpus=4, shuffle_partitions=8)
    out = [
        "# PLANS — formatted physical plans for the headline queries",
        "",
        "Generated by `python scripts/dump_plans.py` at sf0.001 (plan",
        "shapes are SF-independent; AQE may still re-plan at runtime —",
        "these are the static plans the cost commentary refers to).",
        "",
    ]
    for name, why in HEADLINE:
        df = plans.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"_{why}_", "", "```", buf.getvalue().rstrip(), "```", ""]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out) + "\n"
    )
    print(f"wrote PLANS.md ({len(HEADLINE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
