"""Plan audit over EVERY driver-contract entry: no scale-hostile join may
appear in any executed plan.  This is the automated version of the manual
audit recorded in BENCH.md — a CartesianProduct or a
BroadcastNestedLoopJoin over corpus-sized sides turns a bucketed/banded
design into an O(n²) job at 100 TB, and new entries must not regress it.

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
SCALAR_ATTACH_OK = {"phrase_freq": "_pdf"}


def test_no_cartesian_or_bnlj_in_any_entry(spark):
    offenders = {}
    for name, fn in sorted(E.queries().items()):
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan:
            marker = SCALAR_ATTACH_OK.get(name)
            if marker is None or marker not in plan:
                offenders[name] = "BroadcastNestedLoopJoin"
            elif plan.count("BroadcastNestedLoopJoin") > 1:
                offenders[name] = "multiple BNLJ"
    assert not offenders, f"scale-hostile joins: {offenders}"
