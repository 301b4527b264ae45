"""Registry-wide plan lint: no unpartitioned WindowExec over unbounded
input, anywhere — and no window whose partition key skews at scale.

Round-6 verdict: the one remaining class of scale-killers was
single-partition window shapes in secondary queries (`WARN WindowExec:
No Partition Defined` — all |input| rows on one reducer). Round 7
eliminated every instance (orderBy+limit / bounded_rank for top-k
ranks, broadcast-aggregate twins for ratio-to-report, sharded prefix
counts for ntile/packing/range frames); this lint turns that class
into a regression guard.

Rule 1: a logical `Window` node with an EMPTY partitionSpec is
forbidden unless its subtree contains a GlobalLimit (the input is
provably bounded, e.g. rank-the-top-k-after-limit). There is
deliberately no name-based allow-list — a new unpartitioned window
over unbounded input should fail here, loudly, at test time rather
than on a 1000-executor cluster.

Rule 2 (round-7 verdict item 2): a PARTITIONED window whose key is
fixed-cardinality (25 brands, 7 linenumbers) is the same scale-killer
in disguise — rows-per-key grows linearly with the data. Measured, not
convention: for every remaining Window node, the max rows-per-key of
its input is evaluated at sf0.001 AND sf0.01; a key whose hot-key load
grows super-linearly between the two scale points (and is already
non-trivial) fails. Scale-SAFE keys pass automatically: key domains
that grow with the data (doc_id, user_id, o_custkey) keep rows-per-key
flat, and the two-phase rewrites' reduced inputs (shards x k rows per
brand/source, partial top-k per query_id) are constant-bounded by
construction.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.dataframe import DataFrame as PyDF

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_BIG = "/root/testdata/sf0.01"

# rows-per-key may grow this factor between sf0.001 and sf0.01 (a 10x
# data growth): safe keys stay ~flat, a fixed-cardinality key grows
# ~10x. The floor ignores keys whose hot-key load is still trivial at
# sf0.01 (a 100-row hot key is noise, not a reducer bottleneck signal).
GROWTH_BOUND = 4.0
ABS_FLOOR = 256

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


@pytest.mark.slow
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


def _jvm_window_nodes(df):
    """Logical Window nodes of ``df``'s optimized plan, via the JVM tree
    (we need live nodes, not JSON, to re-wrap them as DataFrames)."""
    out = []

    def walk(node):
        if node.getClass().getSimpleName() == "Window":
            out.append(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def _window_key_loads(spark, df) -> dict[tuple[str, ...], int]:
    """{partition-key-sql-tuple: max rows per key} for every partitioned
    Window node in ``df``'s optimized plan. A Window emits exactly its
    input rows, so measuring on the node's own output measures the load
    its reducers would see."""
    loads: dict[tuple[str, ...], int] = {}
    for node in _jvm_window_nodes(df):
        spec = node.partitionSpec()
        keys = tuple(
            spec.apply(i).sql().strip("`") for i in range(spec.size())
        )
        if not keys:  # rule-1 territory (GlobalLimit-bounded)
            continue
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, node
        )
        pdf = PyDF(jdf, spark)
        try:
            mx = (
                pdf.groupBy(*[F.expr(k) for k in keys])
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )
        except Exception:
            # ambiguous/duplicate names: fall back to mean rows-per-key
            n = pdf.count()
            d = pdf.select(*[F.expr(k) for k in keys]).distinct().count()
            mx = (n + d - 1) // d if d else 0
        mx = int(mx or 0)
        loads[keys] = max(loads.get(keys, 0), mx)
    return loads


def _skewed_window_keys(spark, fn) -> list[str]:
    """Partition-key tuples whose hot-key load grows super-linearly
    from sf0.001 to sf0.01 (and is non-trivial at sf0.01)."""
    big = _window_key_loads(spark, fn(spark, SF_DIR_BIG))
    if not any(v > ABS_FLOOR for v in big.values()):
        return []  # every hot key trivial — skip the small-SF pass
    small = _window_key_loads(spark, fn(spark, SF_DIR))
    bad = []
    for keys, load_big in big.items():
        if load_big <= ABS_FLOOR:
            continue
        load_small = small.get(keys, 0)
        if load_small == 0 or load_big > GROWTH_BOUND * load_small:
            bad.append(f"{keys}: {load_small} -> {load_big} rows/key")
    return bad


@pytest.mark.slow
@pytest.mark.parametrize("name,fn", _registry(), ids=[n for n, _ in _registry()])
def test_no_fixed_cardinality_window_keys(spark, name, fn):
    # cheap fast path: most queries have no partitioned Window at all
    df = fn(spark, SF_DIR)
    if not any(
        n.partitionSpec().size() > 0 for n in _jvm_window_nodes(df)
    ):
        return
    bad = _skewed_window_keys(spark, fn)
    assert not bad, (
        f"{name}: window partition key(s) with super-linear rows-per-key "
        f"growth between sf0.001 and sf0.01 — {bad}. A fixed-cardinality "
        "key puts |input|/|keys| rows on each reducer at scale; use the "
        "two-phase top-k, sharded prefix-count, or broadcast-aggregate "
        "patterns instead."
    )


def test_skewed_window_lint_catches_fixed_key(spark):
    """The rule-2 lint must go RED on a deliberately skewed fixture: a
    window partitioned by l_linenumber (7 values at every scale)."""
    from pyspark.sql import Window as W

    def naive(spark_, sf_dir):
        li = spark_.read.parquet(f"{sf_dir}/lineitem.parquet")
        w = W.partitionBy("l_linenumber").orderBy("l_extendedprice")
        return li.select(
            "l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn")
        )

    assert _skewed_window_keys(spark, naive)


# ---------------------------------------------------------------- rule 3
# r10: "never all-pairs" as a regression guard. A condition-free Join
# (cross product) is a scale-killer unless one side is BOUNDED — and
# boundedness is MEASURED, not assumed (the rule-2 philosophy): each
# cross-join side is counted at two scale points, and a side whose row
# count stays flat across the 10x data growth (a grand-total aggregate,
# a literal frame, a fixed dim, a top-k) is bounded, while a side that
# grows with the corpus is not. Two unbounded sides = O(n*m) at any
# scale = fail. The scale points are sf0.01 -> sf0.1 (NOT the
# sf0.001 -> sf0.01 pair rules 1-2 use): documents/embeddings are
# row-identical at the two smallest SFs (TESTDATA.md), so only the
# sf0.1 step exposes their growth.

SF_DIR_XL = "/root/testdata/sf0.1"
# rule-local growth bound: at the sf0.01 -> sf0.1 step the slowest-
# growing corpus table (embeddings) grows exactly 4x, so rules 1-2's
# 4.0 would pass it; bounded sides stay ~1x, making 3.0 a clean cut.
CROSS_GROWTH_BOUND = 3.0


def _cross_join_sides(df):
    """JVM logical sub-plans (left, right) of every condition-free or
    CROSS-typed Join in the optimized plan, in traversal order."""
    out = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        p = stack.pop()
        cls = p.getClass().getName()
        if cls == "org.apache.spark.sql.catalyst.plans.logical.Join":
            no_cond = p.condition().isEmpty()
            jt = p.joinType().toString().lower()
            if no_cond or "cross" in jt:
                out.append((p.children().head(), p.children().last()))
        it = p.children().iterator()
        while it.hasNext():
            stack.append(it.next())
    return out


def _plan_count(spark, jvm_plan) -> int:
    D = spark._jvm.org.apache.spark.sql.classic.Dataset
    return D.ofRows(spark._jsparkSession, jvm_plan).count()


def _unbounded_cross_joins(spark, fn) -> list[str]:
    small = _cross_join_sides(fn(spark, SF_DIR_BIG))
    big = _cross_join_sides(fn(spark, SF_DIR_XL))
    if len(small) != len(big):  # plan shape changed across SFs: flag for a look
        return [f"cross-join count differs across SFs ({len(small)} vs {len(big)})"]
    bad = []
    for (ls, rs), (lb, rb) in zip(small, big):
        def bounded(s_plan, b_plan):
            cb = _plan_count(spark, b_plan)
            if cb <= ABS_FLOOR:
                return True
            cs = max(_plan_count(spark, s_plan), 1)
            return cb / cs <= CROSS_GROWTH_BOUND
        if not (bounded(ls, lb) or bounded(rs, rb)):
            bad.append("cross join with both sides growing with the corpus")
    return bad


@pytest.mark.slow
@pytest.mark.parametrize("name,fn", _registry(), ids=[n for n, _ in _registry()])
def test_no_unbounded_cross_joins(spark, name, fn):
    bad = _unbounded_cross_joins(spark, fn)
    assert not bad, (
        f"{name}: {bad} — a cross product of two corpus-sized relations is "
        "O(n*m) at any scale. Broadcast a bounded side (grand-total "
        "aggregate, GlobalLimit, literal frame) or re-key the join."
    )


def test_cross_join_lint_catches_unbounded_product(spark):
    # the rule must fire on a genuine all-pairs plan over corpus tables
    def naive(spark_, sf_dir):
        d = spark_.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        e = spark_.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id")
        return d.crossJoin(e)

    assert _unbounded_cross_joins(spark, naive)

    # ...and stay quiet when one side is a grand total or a top-k limit
    def fine(spark_, sf_dir):
        d = spark_.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        tot = spark_.read.parquet(f"{sf_dir}/embeddings.parquet").agg(
            F.count(F.lit(1)).alias("n")
        )
        return d.crossJoin(tot)

    assert not _unbounded_cross_joins(spark, fine)
