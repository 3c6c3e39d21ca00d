"""Plan audit over EVERY driver-contract entry: no scale-hostile join may
appear in any executed plan.  This is the automated version of the manual
audit recorded in BENCH.md — a CartesianProduct or a
BroadcastNestedLoopJoin over corpus-sized sides turns a bucketed/banded
design into an O(n²) job at 100 TB, and new entries must not regress it.

Two layers:

1. the plan of the DataFrame each entry RETURNS (cheap, catches the common
   case), and
2. the physical plan of every SQL execution the entry RUNS, read back from
   the session's SQLAppStatusStore — several entries (correct_query,
   more_like, spelling, key_terms, highlight_*) do their real Spark work
   inside ``fn()`` and return a small ``createDataFrame``, which layer 1
   cannot see.

Allowed exception: a BroadcastNestedLoopJoin whose build side is a ONE-ROW
scalar aggregate (the ``crossJoin(broadcast(agg))`` scalar-attach pattern —
phrase_freq attaches the phrase document frequency this way).  A 1-row
build side streams the probe side through once; cost is identical to a
broadcast variable at any scale."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"

# entry -> marker that must appear in the plan, proving the BNLJ build side
# is the documented one-row scalar aggregate (not a corpus-sized relation)
# entries whose freq-scoring plan attaches the one-row phrase-df aggregate
# via crossJoin(broadcast(pdf)) — a documented scalar attach, not a
# corpus-sized nested loop (phrase_3_pair_freq takes the POSITIONAL freq
# plan behind the pair-candidate gate, so it carries the same attach)
SCALAR_ATTACH_OK = {"phrase_freq": "_pdf", "phrase_3_pair_freq": "_pdf"}


def _wait_listener_bus(spark) -> None:
    # the status store is fed by the async listener bus; drain it so the
    # executions we just ran are visible
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10000)
    except Exception:
        import time

        time.sleep(1.0)


def _bnlj_is_scalar_attach(plan: str, name: str) -> bool:
    """True iff every BNLJ in the plan text is the entry's documented one-row
    scalar attach.  AQE plan DESCRIPTIONS render the plan twice (Final +
    Initial sections, renumbered), so the same physical node can appear
    under two ids — accept up to 2 distinct node ids for the single allowed
    node; a genuinely second BNLJ adds more."""
    import re

    marker = SCALAR_ATTACH_OK.get(name)
    if marker is None or marker not in plan:
        return False
    ids = set(re.findall(r"BroadcastNestedLoopJoin[^\n(]*\((\d+)\)", plan))
    ids |= set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", plan))
    return len(ids) <= 2


def test_no_cartesian_or_bnlj_in_any_entry(spark):
    store = spark._jsparkSession.sharedState().statusStore()
    offenders = {}
    for name, fn in sorted(E.queries().items()):
        _wait_listener_bus(spark)
        n_before = store.executionsList().size()
        df = fn(spark, SF_DIR)
        # layer 1: the returned plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct (returned plan)"
            continue
        if "BroadcastNestedLoopJoin" in plan and not _bnlj_is_scalar_attach(
            plan, name
        ):
            offenders[name] = "BroadcastNestedLoopJoin (returned plan)"
            continue
        # layer 2: every execution the entry triggered, end to end
        df.collect()
        _wait_listener_bus(spark)
        lst = store.executionsList()
        for i in range(n_before, lst.size()):
            desc = lst.apply(i).physicalPlanDescription()
            if "CartesianProduct" in desc:
                offenders[name] = f"CartesianProduct (internal exec {i})"
                break
            if "BroadcastNestedLoopJoin" in desc and not _bnlj_is_scalar_attach(
                desc, name
            ):
                offenders[name] = f"BroadcastNestedLoopJoin (internal exec {i})"
                break
    assert not offenders, f"scale-hostile joins: {offenders}"
