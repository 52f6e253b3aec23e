"""No pinned broadcast on sf-growing relations (VERDICT r05 #2).

The r04 scale incident class: an ``F.broadcast`` hint pinned on a
dimension whose cardinality grows linearly with scale factor (customer,
part, supplier, orders, lineitem, events, documents, embeddings) forces a
multi-GB driver-side build at the 100x grading bar, where AQE would have
promoted the join only while the side genuinely fits. The discipline:
hint only fixed-cardinality relations (nation, region — 25/5 rows at
every sf) and bounded-by-construction derived relations (global
aggregates, filtered aggregate outputs, distinct vocab sets).

This test walks the ANALYZED logical plan of every relational registry
query and flags any broadcast ResolvedHint whose subtree reaches an
sf-growing base-table leaf through only non-reducing operators (Project /
Filter / SubqueryAlias / Sort / Deduplicate-free path): that is a raw
growing-dimension broadcast. Subtrees containing an Aggregate or Join are
accepted — those are the sanctioned one-row scalars and
filtered-aggregate shapes whose boundedness each query's docstring
argues.
"""

from __future__ import annotations

import pytest

from autoner_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

GROWING_SENTINELS = {
    "c_custkey": "customer",
    "p_partkey": "part",
    "s_suppkey": "supplier",
    "o_orderkey": "orders",
    "l_orderkey": "lineitem",
    "event_id": "events",
    "doc_id": "documents",
    "text": "documents",
    "emb_id": "embeddings",
}

# operators that neither bound nor reduce cardinality: a hint whose path
# to a growing leaf crosses only these is a pinned raw-dimension build
NON_REDUCING = {
    "Project", "Filter", "SubqueryAlias", "Sort", "LogicalRelation",
    "Relation", "WithColumns", "UnresolvedRelation", "View",
    "RepartitionByExpression", "Repartition", "ResolvedHint",
}


# NOTE: no local spark fixture — the session-scoped conftest fixture is
# used. A module-scoped get_spark().stop() here kills the SHARED
# SparkContext (getOrCreate returns one JVM context) for every module
# that runs after this one.


def _children(node):
    out = []
    ch = node.children()
    for i in range(ch.size()):
        out.append(ch.apply(i))
    return out


def _leaf_tables(node):
    """Growing base tables reachable from node through ONLY non-reducing
    operators (an Aggregate/Join/Limit anywhere on the path bounds or
    reshapes the relation, so the subtree below it is not a raw scan)."""
    name = node.getClass().getSimpleName().removesuffix("$")
    kids = _children(node)
    if not kids:  # leaf: classify by output columns
        cols = set()
        out = node.output()
        for i in range(out.size()):
            cols.add(out.apply(i).name())
        return {t for c, t in GROWING_SENTINELS.items() if c in cols}
    if name not in NON_REDUCING:
        return set()
    tables = set()
    for k in kids:
        tables |= _leaf_tables(k)
    return tables


def _pinned_growing_broadcasts(df):
    bad = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName().removesuffix("$")
        if name == "ResolvedHint" and \
                "broadcast" in node.hints().toString().lower():
            bad.extend(sorted(_leaf_tables(node)))
        stack.extend(_children(node))
    return bad


def test_no_query_pins_broadcast_on_growing_dimension(spark, monkeypatch):
    # every registry family is walked (the r06 review found the original
    # rel_-only filter left the documents/embeddings/events sentinels
    # unreachable); route override keeps the jaccard router's plan
    # construction lazy (no eager profile job inside the loop)
    monkeypatch.setenv("AUTONER_JACCARD_ROUTE", "exact")
    from autoner_spark.caching import release_caches

    offenders = {}
    for qname, fn in QUERIES.items():
        # release per query (the gate/bench discipline): some plan
        # constructions run bounded eager actions that materialize their
        # persist_tracked subtrees, and try/finally keeps a mid-loop
        # failure from skipping cleanup entirely
        try:
            df = fn(spark, SF_DIR)
            bad = _pinned_growing_broadcasts(df)
            if bad:
                offenders[qname] = bad
        finally:
            release_caches()
    assert not offenders, (
        "broadcast hints pinned on sf-growing base tables "
        f"(let AQE promote them instead): {offenders}"
    )
