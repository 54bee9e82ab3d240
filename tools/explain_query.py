"""Plan inspector for registry queries — the `.explain("formatted")`
loop as a one-liner, plus the hygiene counters the plan-audit tests
enforce (shuffle exchanges, Python eval nodes, nested-loop joins,
whole-stage-codegen coverage).

Usage:
    python tools/explain_query.py <query> [sf_dir]      # formatted plan
    python tools/explain_query.py --audit [sf_dir]      # counters for ALL queries

The audit table is the fast way to spot a regression before the test
suite does: a query whose exchange count jumped, or that suddenly
carries an ArrowEvalPython node, shows up as one changed row."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _counters(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "python": plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas"),
        "nested_loop": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    audit = "--audit" in args
    if audit:
        args.remove("--audit")
    if not audit and not args:
        print(__doc__)
        sys.exit(2)
    name = None if audit else args[0]
    sf_dir = (args[1:] if not audit else args[0:]) or ["/root/testdata/sf0.001"]
    sf_dir = sf_dir[0]

    import __spark_entry__ as entry
    from gedixr_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if audit:
        print(f"{'query':26s} {'exch':>4} {'bcast':>5} {'py':>3} {'nlj':>3} {'wscg':>4}")
        for qname, fn in qs.items():
            try:
                plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
                c = _counters(plan)
                print(
                    f"{qname:26s} {c['exchanges']:>4} {c['broadcasts']:>5} "
                    f"{c['python']:>3} {c['nested_loop']:>3} {c['codegen_spans']:>4}"
                )
            except Exception as ex:  # noqa: BLE001 — diagnostic tool
                print(f"{qname:26s} ERROR {type(ex).__name__}: {ex}")
        return
    if name not in qs:
        print(f"unknown query {name!r}; known: {', '.join(qs)}")
        sys.exit(2)
    df = qs[name](spark, sf_dir)
    df.explain("formatted")
    print("\ncounters:", _counters(
        df._jdf.queryExecution().executedPlan().toString()
    ))


if __name__ == "__main__":
    main()
