"""Plan-quality regression guards: the physical plans must keep the
shapes that make these queries scale (pushdown, broadcast, top-k
short-circuit, no exchange on bucketed aggregation)."""

import pytest

from searchengine_spark.registry import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_predicate_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_broadcasts_and_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed


def test_bm25_topk_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "se_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_cosine_filter_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_cosine_topk")
    assert "PushedFilters: [IsNotNull(vec_id)" in plan
    assert "TakeOrderedAndProject" in plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """REGISTRY-WIDE: no query's physical plan may contain a
    CartesianProduct between real tables. Cross joins are allowed
    only as BroadcastNestedLoopJoin against literal 1-row broadcasts
    (scoring params / query vectors / global aggregates).

    stream_* replays are excluded — building their result actually
    RUNS the streaming topology (minutes each) and their returned
    frame is a memory-sink table whose plan is a LocalTableScan;
    their topologies are plan-audited by their own tests instead.
    """
    failures = []
    for name in QUERIES:
        if name.startswith("stream_"):
            continue
        try:
            plan = _plan(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001 — a builder crash is its own failure
            failures.append(f"{name}: builder raised {type(exc).__name__}: {exc}")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
    assert not failures, "\n".join(failures)


def test_q19_fact_predicates_reach_scan(spark, sf_dir):
    """The disjunction's common l_quantity bounds and part's p_size
    bound must be pushed to their parquet scans; part must broadcast."""
    plan = _plan(spark, sf_dir, "tpch_q19_discounted_revenue")
    assert "GreaterThanOrEqual(l_quantity,1" in plan, plan
    assert "LessThanOrEqual(l_quantity,35" in plan, plan
    assert "LessThanOrEqual(p_size,35" in plan, plan
    assert "BroadcastHashJoin" in plan


def test_q18_topk_and_no_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q18_large_volume_customers")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # customer dim


def test_interval_join_is_hash_not_cartesian(spark, sf_dir):
    """The time-range join must execute as an equi hash join on
    user_id with the range bounds as residual condition — a
    BroadcastNestedLoop/Cartesian here would be O(n^2) at scale."""
    plan = _plan(spark, sf_dir, "rel_interval_clicks_before_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_q22_anti_join_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q22_wealthy_inactive")
    assert "LeftAnti" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan  # date filter pushed


def test_quantization_is_map_only(spark, sf_dir):
    """quantize -> dequantize -> error metrics must stay one map
    stage: no Exchange anywhere (the whole point of the operator is
    to run at scan bandwidth at 100 TB)."""
    plan = _plan(spark, sf_dir, "emb_quantization_error")
    assert "Exchange" not in plan, plan


def test_gopher_gate_no_real_shuffle(spark, sf_dir):
    """The quality gate must not shuffle beyond the conditional
    tiny-file repartition rescue (a no-op on real multi-split data):
    no aggregate, no join, no sort in the plan."""
    plan = _plan(spark, sf_dir, "text_gopher_gate")
    for op in ("HashAggregate", "SortMergeJoin", "BroadcastHashJoin", "Sort "):
        assert op not in plan, (op, plan)


def test_unpivot_is_map_only(spark, sf_dir):
    """wide->long expansion must run at scan bandwidth: no Exchange,
    no join, no aggregate — just scan -> expand/generate -> project."""
    plan = _plan(spark, sf_dir, "rel_unpivot_lineitem")
    for op in ("Exchange", "HashAggregate", "Join"):
        assert op not in plan, (op, plan)


def test_png_decode_is_map_only(spark, sf_dir):
    """documents -> PNG encode -> decode is two chained mapInPandas
    stages over the scan — any Exchange besides the conditional
    tiny-file rescue repartition would be wrong."""
    plan = _plan(spark, sf_dir, "mm_png_decode_stats")
    for op in ("HashAggregate", "Join", "Sort "):
        assert op not in plan, (op, plan)


def test_rank_bm25_uses_broadcast_mean_not_corpus_rescan(spark, sf_dir):
    """The eps-floor's full-vocab mean must come from the (cached)
    idf table via broadcast — the documents corpus itself must appear
    in the plan ONCE at most (through the shared cached index), and
    the mean side must broadcast."""
    plan = _plan(spark, sf_dir, "se_bm25_rank_scores")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_incremental_pairs")
    assert "CartesianProduct" not in plan, plan


def test_cdc_chunks_no_shuffle_beyond_rescue(spark, sf_dir):
    """Content-defined chunking is one Generate+Project map stage;
    no aggregate, no join, no sort — the boundary math lives entirely
    in whole-stage codegen."""
    plan = _plan(spark, sf_dir, "text_cdc_chunks")
    for op in ("HashAggregate", "Join", "Sort "):
        assert op not in plan, (op, plan)


def test_image_dhash_stage_is_map_only(spark, sf_dir):
    """Encode -> decode -> 56-bit hash must not shuffle pixels: the
    per-image work ends in (media_id, int64) before any Exchange."""
    plan = _plan(spark, sf_dir, "mm_image_dhash")
    for op in ("HashAggregate", "Join", "Sort "):
        assert op not in plan, (op, plan)


def test_readability_map_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_readability")
    for op in ("HashAggregate", "Join", "Sort ", "Window"):
        assert op not in plan, (op, plan)


def test_pps_sample_no_data_scale_sort(spark, sf_dir):
    """The PPS prefix sum must never globally sort the data: the only
    Sort nodes feed windows over per-bucket slices or the N_BUCKETS
    offsets frame; a data-wide Exchange SinglePartition before the
    row stream would be the failure."""
    from searchengine_spark.registry import all_queries

    df = all_queries()["sample_weighted_pps"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the offsets window runs over the bucket-totals AGGREGATE (tiny);
    # assert the single-partition exchange consumes an aggregate, not
    # the raw row stream: no SinglePartition shuffle of a scan node.
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.start() : m.start() + 400]
        assert "HashAggregate" in tail or "noop" in tail, tail


def test_unicode_and_cjk_bm25_shapes(spark, sf_dir):
    # The multilingual BM25 paths must plan exactly like the ASCII one:
    # broadcast dims + top-k as TakeOrderedAndProject, never a sort.
    for name in ("se_bm25_topk_unicode", "se_bm25_topk_cjk"):
        plan = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "BroadcastHashJoin" in plan, name
