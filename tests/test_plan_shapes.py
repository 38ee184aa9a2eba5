"""Plan-shape regression gate: no registered query may compile to a
BroadcastNestedLoopJoin or CartesianProduct whose non-broadcast cost grows
with the corpus.

This is the check that would have caught the round-4 spatial defect at
authoring time (pure-range 3×3 BETWEEN join → BNLJ over |points|² pairs,
VERDICT r4 finding #1). The gate is SEMANTIC, not a name list: a
BroadcastNestedLoopJoin is acceptable only when its build (broadcast) side
is provably tiny — a scalar aggregate subtree (``keys=[]``: one row at any
corpus size — the standard scalar-attachment crossJoin for corpus totals,
thresholds, norm factors). Everything else must carry an explicit
allowlist entry with a reason, and that list must stay at
label-cardinality broadcasts only. CartesianProduct is never acceptable.
"""

from __future__ import annotations

import os
import re

import pytest

from cdmx_airquality_etl_spark import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Queries whose BNLJ build side is NOT a scalar aggregate but is still
# bounded by construction. Every entry needs a reason proving the build
# side's row count is data-size-independent (|labels|, |grid|, |quantiles|…).
ALLOWLIST: dict[str, str] = {}

_PREFIX_RE = re.compile(r"^((?::  |:- |\+- |   )*)(.*)$")


def _parse_tree(plan: str) -> list[tuple[int, str]]:
    """Parse Spark's simple-mode plan string into (depth, node_text) rows.

    Simple mode draws the operator tree with 3-char prefix groups
    (':- ', '+- ', ':  ', '   '); depth = number of groups. Detail
    sections (subqueries) start a fresh root at depth 0, which is fine —
    each is validated as its own tree.
    """
    out = []
    for line in plan.splitlines():
        if not line.strip():
            continue
        m = _PREFIX_RE.match(line)
        prefix, text = m.group(1), m.group(2)
        out.append((len(prefix) // 3, text))
    return out


def _subtree(nodes: list[tuple[int, str]], i: int) -> list[str]:
    """Texts of the subtree rooted at nodes[i] (root included)."""
    depth = nodes[i][0]
    out = [nodes[i][1]]
    for d, text in nodes[i + 1 :]:
        if d <= depth:
            break
        out.append(text)
    return out


def _children(nodes: list[tuple[int, str]], i: int) -> list[int]:
    depth = nodes[i][0]
    kids = []
    for j in range(i + 1, len(nodes)):
        d = nodes[j][0]
        if d <= depth:
            break
        if d == depth + 1:
            kids.append(j)
    return kids


_SCALAR_AGG = re.compile(r"(HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[\]")


def _bnlj_violations(plan: str) -> list[str]:
    """Return a description for every BNLJ/Cartesian node whose build side
    is not a scalar-aggregate subtree."""
    nodes = _parse_tree(plan)
    bad = []
    for i, (_, text) in enumerate(nodes):
        if "CartesianProduct" in text:
            bad.append(f"CartesianProduct: {text[:120]}")
            continue
        if "BroadcastNestedLoopJoin" not in text:
            continue
        kids = _children(nodes, i)
        build = None
        if "BuildRight" in text and len(kids) >= 2:
            build = kids[1]
        elif "BuildLeft" in text and kids:
            build = kids[0]
        if build is None:
            bad.append(f"BNLJ with unresolved build side: {text[:120]}")
            continue
        sub = _subtree(nodes, build)
        # ReusedExchange of a scalar exchange also qualifies: the reuse
        # target was validated where it was defined.
        if any(_SCALAR_AGG.search(t) for t in sub) or any(
            "ReusedExchange" in t for t in sub
        ):
            continue
        bad.append(f"BNLJ build side is not a scalar aggregate: {sub[0][:120]}")
    return bad


@pytest.mark.usefixtures("spark")
def test_no_unbounded_nested_loop_joins(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR)
    failures = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        viols = _bnlj_violations(plan)
        if not viols:
            continue
        if name in ALLOWLIST:
            continue
        failures.append(f"{name}: " + "; ".join(viols))
    assert not failures, (
        "queries with corpus-scaling nested-loop plans (add a bounded-build "
        "reason to ALLOWLIST only if the build side is provably "
        "data-size-independent):\n" + "\n".join(failures)
    )


def test_allowlist_entries_are_live():
    """Allowlist hygiene: every entry names a registered query and carries
    a non-empty reason — stale entries rot the gate."""
    for name, reason in ALLOWLIST.items():
        assert name in QUERIES, f"allowlisted query {name} no longer registered"
        assert reason.strip(), f"allowlisted query {name} has no reason"
