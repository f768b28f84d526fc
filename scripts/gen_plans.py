#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of representative
queries. Run after any plan-affecting change:

    python scripts/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PICKS = [
    ("tpch_q1_pricing_summary", "pure scan-agg: predicate pushed to parquet, 6-way partial agg"),
    ("tpch_q3_shipping_priority", "dim broadcast + fact shuffle + TakeOrderedAndProject"),
    ("se_bm25_topk", "filter-first index scan, broadcast idf, top-k short-circuit"),
    ("se_bm25_batch", "one tf scan amortized over a query batch; per-query window top-k"),
    ("se_bm25_topk_unicode", "multilingual index build + score: same broadcast/TakeOrdered shape as the ASCII path"),
    ("text_cjk_bigram_tokens", "\\p{L} tokenize + CJK bigram re-segmentation entirely map-side before one tf agg"),
    ("text_normalize_stats", "NFC pandas_udf + native regexp chain as one Arrow-batched map stage"),
    ("pipeline_curated_docs_multilingual", "NFC + langid routing entirely map-side; then the same gate -> md5 dedup -> LSH near-dup shape as the ASCII curate chain"),
    ("se_bm25_topk_routed", "language-routed index: per-doc stop-list CASE + CJK bigram resegment before the standard tf/idf broadcast score"),
    ("emb_ivf_probe_recall_curve", "ONE ranked ADC assignment fanned to K probe settings via broadcast range join + one n_probe-partitioned window (replaced K scan+topk jobs)"),
    ("dedup_neardup_pairs", "LSH equi-self-join (no cartesian), barriers around expensive projections"),
    ("rel_interval_clicks_before_purchase", "equi hash join with time-range residual (no nested loop)"),
    ("sim_cosine_topk", "map-only fold + TakeOrderedAndProject (no shuffle before top-k)"),
    ("emb_quantization_error", "quantize->dequantize->metrics as ONE map stage, zero Exchange"),
    ("text_gopher_gate", "entire quality rule set in one scan-bandwidth projection"),
    ("dedup_cross_doc_spans", "map-side positional shingles; df-cap + pair join on uniform md5; one (pair,diagonal)-keyed window for span chaining"),
    ("text_lm_perplexity", "bigram counts with map-side partials; vocabulary-bounded model broadcast back onto the corpus bigram stream"),
    ("sim_tfidf_shingle_pairs", "all-pairs via df-capped posting-list equi-join — candidates only through shared features, never a cartesian"),
    ("sim_tfidf_doc_topk", "probe vector broadcast onto term postings; one groupBy(doc) + TakeOrderedAndProject"),
    ("mm_png_resize_stats", "decode->box-resample->encode as one Arrow-batched map stage, no shuffle"),
    ("tpch_q21_waiting_returns", "dual correlated EXISTS decorrelated: one orderkey agg + one keyed join instead of three fact-fact joins"),
    ("tpch_q2_min_cost_supplier", "argmin-per-group: window min reuses the agg's partkey partitioning — one fact shuffle total"),
    ("dedup_prefix_jaccard_pairs", "prefix-filtered exact set join: candidates only through rare-token prefixes, then keyed verify — no cartesian"),
    ("dedup_pagerank_centrality", "3 unrolled integer power-method rounds: src-keyed join + dst-keyed sum per round"),
    ("mm_image_dhash_neardup", "decode+hash as one Arrow-batched map stage; banded equi-self-join (pigeonhole-exact recall), bit_count verify"),
    ("se_hybrid_rrf_topk", "two TakeOrderedAndProject rank lists; windows only over the 50-row lists; full-outer fuse"),
    ("text_cdc_chunks", "boundary detection + chunk emission entirely in whole-stage codegen — one map stage, zero Exchange"),
    ("text_frequent_pairs", "a-priori prune before the pair self-join: broadcast frequent set, fan-out bounded by frequent vocab"),
    ("skew_salted_join_stats", "salted fact + exploded dim: ShuffledHashJoin on (key, salt) — hot key spread over n_salts reducers"),
    ("sample_weighted_pps", "distributed prefix sum: bucket totals -> tiny offsets window -> broadcast back; no global sort"),
    ("events_top3_per_type", "two-phase grouped top-k: bounded per-partition heaps (mapInPandas) shrink the stream before the window"),
    ("dedup_triangle_counts", "ordered wedge equi-join + left-semi close: each triangle once, no cartesian"),
    ("emb_jl_projection", "explode x broadcast sign matrix -> one (vec, dim) grouped exact-decimal sum"),
    ("text_drift_psi", "two vocab-sized aggs + full-outer vocab join; per-token PSI rows, no global float fold"),
    ("layout_zorder_keys", "morton shift/mask entirely in whole-stage codegen; the two ntile sorts are the write-time clustering cost"),
    ("join_bloom_prefilter", "bloom bit test as a map-side filter against a 1-row broadcast words array — fact rows pruned BEFORE the join exchange, no plan-literal blowup"),
    ("src_versioned_diff", "snapshot diff: one null-safe full-outer join on the key; |changes|-sized output from |table|-sized inputs"),
    ("emb_hard_negatives", "LSH-bucket equi-self-join candidates; per-anchor window only over bucket-bounded lists — no cartesian, no global sort"),
    ("text_quality_calibrated", "one map stage for the signal + one percent_rank window by source — the whole calibration is two stages"),
    ("src_versioned_mor_read", "merge-on-read reconcile: keyed window with WindowGroupLimit pruning per partition before the exchange"),
    ("src_versioned_pruned_read", "manifest file skipping: the scan's file list is pre-pruned, then pushed filters prune row groups inside"),
    ("export_shard_assignment", "prefix-sum global index: constant-size offsets window + broadcast join — no table-scale global sort"),
    ("rel_session_spike_overlap", "keyless range join: bin-exploded equi-join + residual; the only BNLJ is the 1-row totals broadcast"),
    ("se_bm25_prf_topk", "two keyed tf passes; feedback docs and expansion terms are LIMITed frames entering broadcast joins"),
    ("split_leakage_safe", "cluster-level split: iterative-CC result left-joined onto docs, then pure map-side hash CASE"),
    ("text_char_entropy", "explode + two keyed aggs; decimal-cast terms make the entropy fold order-independent"),
    ("se_best_passage", "RANGE window over HIT positions only (tiny per-doc state); top-doc semi-join bounds the token explode"),
    ("se_eval_retrieval_metrics", "qrels + rankings from ONE broadcast query fan-out over tf; windows partition per query_id only"),
    ("events_decayed_trending", "one scan, map-side partial agg into |event_type| groups; the anchor ts is a broadcast 1-row frame"),
    ("emb_ivfpq_topk", "probe = cluster IN literals (partition-prunable on the serving layout); per-cell ADC tables are plan literals; one keyed sum + TakeOrderedAndProject"),
    ("emb_ivfpq_batch_topk", "ONE codes scan amortized over the query batch: broadcast (qid,cell,m,code) distance tables join + qid-partitioned window top-k — no per-query plans, no global sort"),
    ("text_blocklist_filter", "entire ban-list policy in one whole-stage-codegen map over the scan — no shuffle, no UDF, no explode"),
    ("approx_equal_count_bins", "sketch cutpoints in one pass + CASE bin assignment as a map stage; the audit agg is N_BINS rows"),
    ("text_intra_doc_scrub", "every stage doc_id-keyed: gram lead, first-occurrence min, covering max, ordered reassembly — state bounded by doc length, one doc_id shuffle"),
    ("approx_cms_word_counts", "D-way explode -> one keyed agg with map-side partials (<= D*W cells per partition); probes broadcast-join the D*W counter table"),
    ("mix_temperature_resample", "|groups|-row derived-rate table broadcast back onto the scan; corpus never shuffles, filter in whole-stage codegen"),
    ("text_lm_stupid_backoff", "model = raw count tables (no renormalization); scoring = two left joins on (v,w)/w + one doc-keyed agg — the shape stupid backoff was invented for"),
    ("rel_asof_forward_next_purchase", "forward as-of via the single-shuffle union-and-carry window (left-first tie order, first-following lookup); no range-join blowup"),
    ("export_byte_budget_shards", "weighted distributed prefix sum: bucket byte totals -> constant-size offsets window -> broadcast back; no table-scale sort"),
    ("dedup_eigenvector_centrality", "per round: one src-keyed join + dst-keyed sum + 1-row max broadcast renormalization — all integer, lineage cut after the loop"),
    ("se_postings_varint_compression", "delta-gap + varint cost as per-row array folds over cached postings — map-only, zero new Exchange"),
    ("dedup_record_linkage_pairs", "two-pass affix blocking: equi-joins on 6-char block keys + integer levenshtein verify — pigeonhole-exact, no cartesian"),
    ("dedup_containment_pairs", "asymmetric prefix filter: A-prefix x B-full-postings equi-join, integer-exact containment verify"),
    ("events_rolling_7d_active_users", "sliding distinct-count via bounded x7 day explode + one (user, report_day) dedup — no per-day rescan, no fact-table window"),
    ("rel_ivm_join_delta", "delta join maintenance: dO|x|C shuffles once; both delta-sided joins broadcast the batch"),
    ("rel_scd2_customer_tier", "gaps-and-islands: two customer-partitioned row_numbers, one keyed agg, one lead — zero self-joins"),
    ("text_word_pmi_pairs", "doc-keyed presence self-join (per-doc-vocab fan-out) -> pair agg pruned by MIN_COOC; idf lookups broadcast"),
    ("se_autocomplete_table", "vocabulary-only prefix explode (<=6x) + per-prefix rank window — never rescans documents"),
    ("pipeline_curated_docs", "CAPPED production curate chain: bucket-size window shares the pair-join's (band, band_hash) Exchange; hot buckets pruned before pair enumeration"),
    ("dedup_lsh_recall_audit", "capped banding vs prefix-filtered exact truth: one pair semi-join + three 1-row aggs combined by broadcast crossJoin"),
    ("ann_ivf_topk", "IVF audit: partition-pruned probe scan + brute top-k TakeOrderedAndProject; verdict folded by 1-row broadcast crossJoins"),
    ("emb_pq_adc_topk", "PQ ADC search: literal distance-table lookups (no join, no float math) -> groupBy sum -> TakeOrderedAndProject(k)"),
    ("export_packed_windows", "context-window packing: monotone-range prefix sum (constant-size offsets window, broadcast back) + bounded sequence() explode — corpus order preserved, never globally sorted"),
    ("skew_key_profile", "one fact-scale keyed count; every ranking/percentile after it runs on the n_keys-row count frame — the audit costs the same shuffle it is sizing"),
    ("mix_curriculum_interleave", "per-source window rank + broadcast |groups| index table + 1-row count crossJoin — a global training order with no global sort"),
    ("approx_kmv_distinct_users", "KMV sketch as a grouped top-K window over distinct (type,user) hashes; estimator arithmetic on the K-row-per-group frame"),
    ("se_maxscore_topk", "MaxScore pruning: ub/suffix/theta machinery on <=|query| rows; corpus work = top-ub term's postings + essential-term semi-join, non-essential postings never scanned"),
    ("events_value_mad", "three keyed passes, each percentile cuts broadcast back onto the scan; outlier boundary compared on round-6 constants"),
    ("dedup_ngram_novelty", "gram-keyed MIN agg + equi-join back on the gram — per-doc redundancy with no candidate pairs, shares the session shingle cache"),
    ("dedup_cluster_survivorship", "keep-longest canonical per near-dup cluster: ONE window pass keyed on component (tiny partitions) yields canonical + member count — no per-cluster argmax join"),
    ("mix_dsir_selection", "DSIR: tokenize scan -> 512-bucket keyed agg -> broadcast log-ratio table back -> per-doc integer sum; threshold is a 1-row percentile crossJoin — nothing corpus-sized sorted"),
    ("export_length_buckets", "padding audit: map-only token count + 21-branch CASE bucket (no float log2, no lookup join) -> groupBy on <=22 keys + 1-row broadcast totals"),
    ("se_chunk_retrieval_recall", "RAG audit: two shared-machinery BM25 searches (doc + chunk index, both session-cached), parent map = integer div (no join), overlap = per-query semi-join on tiny top-k frames"),
    ("events_cuped_adjusted", "CUPED: one scan -> per-user integer cents sums -> 2-row variant agg + 1-row global agg broadcast; all float math on final scalars only"),
    ("dq_benford_orders", "Benford: scan-agg over a 9-value integer-cents first-digit key + 1-row total broadcast; expectations are constant literals, no log10 in either engine"),
    ("approx_quantile_sample", "quantile sketch: TakeOrderedAndProject(K) by md5 hash (never a global sort), percentile on the K-row sample, rank audit = one conditional agg keyed by 4 labels"),
    ("events_watermark_sizing", "watermark what-if: arrival-order running max via bucketed two-level prefix pattern (per-hour maxima + constant-size cumulative window broadcast back) — no global-order window over the stream"),
    ("approx_kmv_merge_audit", "mergeability proof: two half-sketches (grouped top-K windows on filtered scans) + K-row-per-group merge window + anti-join identity check — every frame after the scans is K-rows-per-group"),
    ("sample_stratified_exact", "exact allocation: one stratum-keyed shuffle, rank window within strata, integer-rational keep bound in whole-stage codegen"),
    ("privacy_rr_frequency", "local DP: per-user seeded coin arithmetic entirely in codegen on the user-keyed agg; 1-row debias fold"),
    ("text_zipf_slope", "corpus health probe: token-count agg + TakeOrderedAndProject(100); OLS on the 100-row frame with order-independent decimal accumulators"),
    # round-9 picks: the distributed-rank adopters (the window must be
    # keyed on (group, _db), never the group alone), the rewritten
    # skew profile (no per-key rank window at all), and the new ops.
    ("mix_curriculum_interleave", "per-source curriculum rank via distributed_rank: row_number window keyed (source, _db); offsets frame broadcast back; no whole-source sort"),
    ("sample_stratified_exact", "md5-rank allocation via distributed_rank: window keyed (lang, _db); buckets past ceil(n/5) pruned BEFORE the window"),
    ("skew_key_profile", "count-value histogram formulation: one keyed count, tiny ordered window over distinct count values, TakeOrderedAndProject(10) for top-10 share — no per-key rank"),
    ("export_global_order_rank", "global ROW_NUMBER without a global sort: value-range buckets, window keyed _db only"),
    ("mix_token_budget_fill", "priority-order budget fill: two-level prefix sum — running sums keyed (source, _b), ordered window only over the totals frame"),
    ("text_heaps_vocab_growth", "vocabulary growth: one tokenize scan, per-word MIN(bucket) agg, conditional checkpoint counts; no windows, no sorts"),
    ("sample_aes_weighted_topn", "A-ES weighted reservoir: pure map + TakeOrderedAndProject(150); no shuffle beyond the top-n reduction"),
    ("sim_centroid_outliers", "mislabel audit: posexplode scan -> broadcast centroid table -> per-vector keyed agg -> broadcast |labels|-row cutoff"),
    ("events_bootstrap_ci", "Poisson bootstrap: 2*B conditional integer sums on ONE scan (no replicate join, no window), percentile over the 32-row replicate frame"),
    ("events_did_estimate", "DiD: per-user conditional sums keyed on user_id, 2-row cell agg, 1-row broadcast fold"),
    ("se_static_pruning_recall", "static pruning audit: all-postings score join, per-term max joined back on the uniform word key, two TakeOrderedAndProject top-k's"),
    ("sim_tiered_rerank_recall", "two-tier serving: truncated-space TakeOrdered(50) shortlist, broadcast semi-join back, full-dim re-rank on 50 rows"),
    ("privacy_dp_quantile", "discretized-EM median: bin histogram (value-range bounded), prefix window over the bin frame, Gumbel argmax TakeOrdered(1)"),
    ("mix_epoch_schedule", "epoch recipe as multiplicities: broadcast recipe join + map-only hash compare, zero shuffle"),
    ("privacy_dp_mean", "clip+Laplace DP mean: one user-keyed agg, 1-row release arithmetic"),
    ("mix_loo_source_ablation", "leave-one-out via algebraic subtraction: one per-source agg + broadcast global fold, nothing recomputed per source"),
    ("text_tokenizer_fertility", "fertility audit: regex/byte counts ride the corpus scan, one lang-keyed agg, guarded ratio arithmetic on the tiny result"),
    ("ann_ivf_append_assign", "no-retrain append: batch encode is map-only against literal frozen centroids/codebooks — no Join, no Window, no Exchange before the output"),
    ("ann_ivf_append_drift_audit", "two map-only encode passes + cluster-keyed aggs + an 8-row broadcast join; all distortion sums exact integers"),
    # round-10 (session 2)
    ("events_ohlc_hourly", "OHLC in ONE hash agg: min_by/max_by on a packed exact (ts, event_id) sort key — no window, no per-(type,hour) sort"),
    ("events_acf_lags", "heavy work is one keyed count agg; the lag window runs over the calendar-bounded hourly frame; decimal-cast lag products"),
    ("events_seasonal_naive_mase", "forecast errors as calendar equi-joins on (type, hour-k) — keyed shuffles, gap-correct, no per-type sort"),
    ("dedup_bfs_contamination_hops", "frontier-only BFS: per round one src-keyed join of the NEW wavefront + keyed min; settled nodes never re-propagate"),
    ("se_ltr_features", "broadcast query fan-out over cached tf + one (query,doc) keyed agg — no window: training rows are unranked"),
    ("layout_zonemap_prune_audit", "file assignment via the no-partition distributed rank; zones + rollup are two keyed aggs; zero files written"),
    ("privacy_t_closeness_audit", "two histogram aggs + broadcast band-domain zero-fill; window partitions bounded by |bands|; integer cumsums"),
    ("mm_wav_spectral_bins", "real decode + per-row DFT folds: one Arrow-batched map stage + codegen arithmetic, zero Exchange"),
    ("events_cusum_changepoint", "one keyed count agg over events; CUSUM + argmax as integer windows over the calendar-bounded hourly frame"),
    ("text_lm_kneser_ney", "KN model = three keyed aggs over bigram types (vocab-bounded); scoring = two left joins, no window"),
    ("export_shard_integrity_manifest", "prefix-sum shard assignment + ONE keyed agg; the additive digest fold needs no per-shard sort to verify"),
    ("events_ab_power_mde", "one scan -> user-keyed cents agg -> 2-row variant fold -> 1-row release; z-quantiles are shared Python literals"),
    # round-10 (session 3)
    ("events_survival_km", "KM curve: two user-keyed aggs; risk-set suffix sum + product fold run over the horizon-bounded curve frame only"),
    ("events_ks_variant", "KS ECDF: per-cents counts, then the two-level bucket prefix sum — offsets window over $10 buckets, in-bucket cumsum partitioned"),
    ("events_bh_fdr", "BH step-up: one type-keyed integer-moment agg; rank/step windows over the |event_type|-row frame; baked quantile literals"),
    ("events_holt_forecast", "Holt fold: one hour-keyed cents agg -> sorted array in a 1-row frame -> single aggregate() pass; zero joins"),
    ("sample_kfold_balance", "fold x source cells in one keyed agg; expected counts via a source-partitioned window over the k*|sources| cell frame"),
    ("se_bm25f_topk", "BM25F: ONE posexplode (field = position predicate), term-filtered before the (doc,word) agg; idf broadcast from the cached index; TakeOrderedAndProject"),
    ("dedup_personalized_pagerank", "restart PageRank: same per-round src-keyed join + dst sum as PageRank; per-node teleport base joined from a broadcast seed frame"),
    ("events_conformal_anomaly", "conformal thresholds: calendar equi-join scores; rank windows partition per event_type over calendar-bounded frames"),
    ("events_median_ci", "median order-stat CI: rank selection via cumulative counts over the value-grid-bounded distinct-cents table — no global sort"),
    ("text_quality_quantile_normalized", "quantile normalization: two distributed_rank passes (source RANK, global ROW_NUMBER) + ONE equi-join on the exact integer index"),
    ("emb_mutual_nn_pairs", "mutual-NN: bucket equi-join candidates, groupBy struct-argmax (no window), reversed-key left-semi self-join"),
    ("emb_label_silhouette", "silhouette: posexplode joined to ALL centroids on pos (|labels|-bounded fan-out), decimal-sum dots, per-label fold"),
    ("text_association_rules", "a-priori pair join re-directed: union of both directions + two broadcast joins on the frequent vocab; top-50 on rounded confidence"),
    ("src_versioned_vacuum_audit", "VACUUM dry-run: reclaimable-file set difference drives two lazy counts — kept snapshot scan + planned-file scan"),
    ("export_rebalance_audit", "rebalance churn: both placements as map-only md5 arithmetic, one 1-row aggregate, stack to two scheme rows"),
    ("text_source_keyness", "keyness: one tokenize pass; totals are bounded broadcasts onto the sources x vocab cells; per-source window over vocab-bounded rows"),
    ("text_oov_rate", "OOV: top-V vocab as TakeOrdered broadcast; flag is a broadcast left join; one source-keyed agg"),
    ("text_word_burstiness", "burstiness: per-(word,doc) tf agg -> per-word integer moments; zero-docs handled algebraically; TakeOrdered(20)"),
    # round-11 picks
    ("mm_video_decode_stats", "MJPEG-in-AVI pixel decode: mux -> demux+per-frame JPEG decode as chained Arrow-batched map stages, zero Exchange"),
    ("emb_pq_refine_recall_audit", "three bounded PQ trains; ADC tables as plan literals; per-query dists via one vec_id-keyed agg; windows partition by the 8-query dimension"),
    ("decontam_bloom_prefilter", "benchmark-shingle Bloom as a 1-row broadcast; corpus shingles pruned map-side BEFORE the df-cap and eval join exchanges"),
    ("emb_training_triplets", "mutual-NN x hard-negative composition: two bucket equi-joins, groupBy struct-argmax/min picks — no window over the corpus, no new scan"),
    ("text_mixed_lang_chunks", "len/256-bounded explode + marker-array intersects in codegen + one doc-keyed agg; no joins"),
    ("text_ccnet_ppl_buckets", "per-source tercile: distributed_rank's bucket prefix sum (no whole-source sort) + integer CASE label + |sources|x3 rollup"),
    ("export_span_corruption", "denoising examples: doc-length-bounded posexplode + doc-keyed lag/prefix windows + ONE agg reassembling input/target strings; no joins"),
    ("pipeline_dataset_card", "datasheet row: tokenize scan + session-cached curation stages; 1-row aggs fused by broadcast crossJoins — no corpus-wide shuffle beyond the chain"),
]


def _minhash_bands_persisted(spark, sf_dir):
    """Build-scale variant: stage barriers are persisted parquet
    intermediates (SPARK_GRAFT_PERSIST_DIR) — the plan must show NO
    corpus-wide Exchange, just scan -> project."""
    import tempfile

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.dedup import minhash_bands

    tmp = tempfile.mkdtemp(prefix="plans_persist_")
    return minhash_bands(load_table(spark, sf_dir, "documents"), persist_dir=tmp)


def _kmeans_assignment_stage(spark, sf_dir):
    """The hot inner stage of the Lloyd loop (the registry query
    returns a checkpointed result whose plan is just an RDD scan, so
    PLANS.md shows the stage that actually matters: nearest-centroid
    assignment against literal centroids — zero Exchange, zero
    Join)."""
    from pyspark.sql import functions as F

    from searchengine_spark.io import load_table
    from searchengine_spark.operators.kmeans import (
        K,
        assign_clusters,
        fixed_point_vec,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    quant = emb.select("vec_id", fixed_point_vec("embedding").alias("qvec"))
    cents = [
        [int(v) for v in r["qvec"]]
        for r in quant.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    ]
    return assign_clusters(quant, cents).select("vec_id", "cluster", "dist")


EXTRA_PICKS = [
    (
        "dedup_minhash_bands__persist_dir",
        "persisted-intermediate barriers: zero Exchange in the band build",
        _minhash_bands_persisted,
    ),
    (
        "emb_kmeans_clusters__assignment_stage",
        "Lloyd inner loop: map-only literal-centroid argmin fold — no Exchange, no Join; repeated per iteration over the persisted quantized frame",
        _kmeans_assignment_stage,
    ),
]

HEADER = """# PLANS — physical plans of representative queries (sf0.01, local[8])

Generated by `python scripts/gen_plans.py`; regenerate after
plan-affecting changes. What to look for: `PushedFilters` at every
scan, `BroadcastHashJoin` for dims, `TakeOrderedAndProject` for
top-k, and no `CartesianProduct` between real tables. The
`BroadcastNestedLoopJoin Cross` nodes below are all 1-ROW literal
broadcasts (the scoring-params scalar or a single query vector) —
constant-size by construction; tests/test_plan_quality.py enforces
that nothing else cross-joins.
"""


# Physical-plan node kinds whose count shift between the local and the
# cluster shuffle shape signals a strategy flip (a broadcast falling
# back to sort-merge, a new Exchange on a path that was co-located).
_NODE_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange",
)


def _node_counts(plan_text: str) -> dict[str, int]:
    counts = {k: 0 for k in _NODE_KINDS}
    for ln in plan_text.splitlines():
        # count only the numbered operator-tree lines ("(7) Exchange"),
        # not the per-node detail sections repeating the name below.
        s = ln.strip()
        if not s.startswith("(") or ")" not in s:
            continue
        op = s.split(")", 1)[1].strip()
        for k in _NODE_KINDS:
            if op.startswith(k):
                counts[k] += 1
    return counts


def _render(spark, sf_dir: str) -> tuple[list[str], dict[str, dict[str, int]]]:
    from searchengine_spark.registry import all_queries

    qs = all_queries()
    out: list[str] = []
    counts: dict[str, dict[str, int]] = {}
    picks = [(n, w, qs[n]) for n, w in PICKS] + EXTRA_PICKS
    for name, why, fn in picks:
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        counts[name] = _node_counts(plan)
        # Giant in-plan literals (e.g. the 2048-word Bloom array)
        # would bloat the doc by hundreds of KB; elide mid-line.
        lines = [
            ln if len(ln) <= 800 else f"{ln[:800]} …<{len(ln) - 800} chars elided>"
            for ln in (ln.rstrip() for ln in plan.splitlines())
        ]
        out += [f"## {name}", "", f"_{why}_", "", "```", *lines, "```", ""]
    return out, counts


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    cluster_shape = "--cluster-shape" in sys.argv

    from searchengine_spark.session import get_spark

    here = os.path.dirname(__file__)
    if not cluster_shape:
        spark = get_spark("plans", master="local[8]")
        out, counts = _render(spark, sf_dir)
        path = os.path.join(here, "..", "PLANS.md")
        with open(path, "w") as fh:
            fh.write("\n".join([HEADER, *out]))
        with open(os.path.join(here, "..", "PLAN_NODES.json"), "w") as fh:
            json.dump(counts, fh, indent=1, sort_keys=True)
        print(f"wrote {os.path.normpath(path)} (+PLAN_NODES.json)")
        spark.stop()
        return

    # --cluster-shape (round-10 verdict item 9): regenerate every pick
    # under the shuffle geometry a 1000-executor job would run with —
    # spark.sql.shuffle.partitions=2000, AQE + skew-join on (session
    # defaults) — and diff the join/exchange node counts against the
    # committed local-shape PLAN_NODES.json. A broadcast flipping to
    # SortMergeJoin or a new Exchange at 2000 partitions means the
    # local plans were hiding a strategy cliff.
    spark = get_spark("plans-cluster", master="local[8]", shuffle_partitions=2000)
    _out, cluster_counts = _render(spark, sf_dir)
    spark.stop()
    base_path = os.path.join(here, "..", "PLAN_NODES.json")
    with open(base_path) as fh:
        base_counts = json.load(fh)
    rows = []
    flagged = []
    for name in sorted(base_counts):
        b, c = base_counts[name], cluster_counts.get(name)
        if c is None:
            continue
        diffs = {
            k: (b.get(k, 0), c.get(k, 0))
            for k in _NODE_KINDS
            if b.get(k, 0) != c.get(k, 0)
        }
        bad = (
            c.get("BroadcastHashJoin", 0) < b.get("BroadcastHashJoin", 0)
            or c.get("SortMergeJoin", 0) > b.get("SortMergeJoin", 0)
            or c.get("Exchange", 0) > b.get("Exchange", 0)
            or c.get("CartesianProduct", 0) > 0
        )
        if diffs:
            rows.append((name, diffs, bad))
        if bad:
            flagged.append(name)
    out_md = [
        "# CLUSTER_PLAN_DIFF — local[8]/32-partition vs 2000-partition "
        "shuffle shape",
        "",
        "Generated by `python scripts/gen_plans.py --cluster-shape` "
        "(AQE + skew-join on in both shapes — session defaults). "
        "Node-count diffs per PLANS.md pick; FLAGGED = a broadcast "
        "degraded to sort-merge, an Exchange appeared, or a cartesian "
        "product materialized at cluster geometry.",
        "",
        f"Picks compared: {len(base_counts)}; picks with any node-count "
        f"diff: {len(rows)}; FLAGGED: {len(flagged) or 'none'}",
        "",
    ]
    for name, diffs, bad in rows:
        tag = " **FLAGGED**" if bad else ""
        detail = ", ".join(
            f"{k}: {b}->{c}" for k, (b, c) in sorted(diffs.items())
        )
        out_md.append(f"- `{name}`{tag}: {detail}")
    if not rows:
        out_md.append("No node-count differences — every pick keeps its "
                      "join strategy and exchange count at cluster shape.")
    diff_path = os.path.join(here, "..", "CLUSTER_PLAN_DIFF.md")
    with open(diff_path, "w") as fh:
        fh.write("\n".join(out_md) + "\n")
    print(f"wrote {os.path.normpath(diff_path)}; flagged={flagged}")


if __name__ == "__main__":
    main()
