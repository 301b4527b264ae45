"""Registry-wide plan lint: no unpartitioned WindowExec over unbounded
input, anywhere.

Round-6 verdict: the one remaining class of scale-killers was
single-partition window shapes in secondary queries (`WARN WindowExec:
No Partition Defined` — all |input| rows on one reducer). Round 7
eliminated every instance (orderBy+limit / bounded_rank for top-k
ranks, broadcast-aggregate twins for ratio-to-report, sharded prefix
counts for ntile/packing/range frames); this lint turns that class
into a regression guard.

Rule: a logical `Window` node with an EMPTY partitionSpec is forbidden
unless its subtree contains a GlobalLimit (the input is provably
bounded, e.g. rank-the-top-k-after-limit). There is deliberately no
name-based allow-list — a new unpartitioned window over unbounded
input should fail here, loudly, at test time rather than on a
1000-executor cluster.
"""

from __future__ import annotations

import json

import pytest

SF_DIR = "/root/testdata/sf0.001"

WINDOW_CLS = "org.apache.spark.sql.catalyst.plans.logical.Window"
BOUNDED_CLS = ("GlobalLimit",)


def _build_tree(nodes: list[dict]):
    """Reconstruct the pre-order flat toJSON array into (node, children)."""
    pos = {"i": 0}

    def build():
        node = nodes[pos["i"]]
        pos["i"] += 1
        children = [build() for _ in range(node.get("num-children", 0))]
        return node, children

    root = build()
    assert pos["i"] == len(nodes), "toJSON traversal mismatch"
    return root


def _subtree_has_limit(children) -> bool:
    stack = list(children)
    while stack:
        node, kids = stack.pop()
        if any(b in node["class"] for b in BOUNDED_CLS):
            return True
        stack.extend(kids)
    return False


def _unbounded_global_windows(df) -> list[str]:
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    tree = _build_tree(nodes)
    bad = []
    stack = [tree]
    while stack:
        node, kids = stack.pop()
        if node["class"] == WINDOW_CLS and not node.get("partitionSpec"):
            if not _subtree_has_limit(kids):
                bad.append(node["class"])
        stack.extend(kids)
    return bad


def _registry():
    import __spark_entry__ as E

    return sorted(E.queries().items())


@pytest.mark.parametrize("name,fn", _registry(), ids=[n for n, _ in _registry()])
def test_no_unpartitioned_window_over_unbounded_input(spark, name, fn):
    df = fn(spark, SF_DIR)
    bad = _unbounded_global_windows(df)
    assert not bad, (
        f"{name}: unpartitioned Window over unbounded input — every input "
        "row lands on ONE reducer at scale. Use orderBy+limit then "
        "bounded_rank (operators/prefix.py), a broadcast-aggregate twin, "
        "or the sharded prefix-count pattern instead."
    )
