"""One-command physical-plan audit over the whole contract surface.

For every ``queries()`` entry, builds the Catalyst plan (no execution
beyond what query construction itself runs) and flags the scale
anti-patterns the plan-pin tests assert individually:

- CartesianProduct anywhere
- BroadcastNestedLoopJoin outside the documented 1-row-broadcast
  whitelist (tests/test_plans.py NESTED_LOOP_OK)
- row-at-a-time Python UDFs (BatchEvalPython) in ORACLE-CHECKED paths
  (rows-only keys may use declared Arrow/Pandas seams)

Prints one JSON line per finding and a summary line; exit code 1 on
any finding. Usage:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as mod
    from tests.test_plans import NESTED_LOOP_OK

    from bht_etl_app_spark import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    qs = mod.queries()
    oracle_keys = set(mod.oracle_sql())
    findings = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001 — report, don't abort the audit
            findings.append({"query": name, "kind": "plan_error", "detail": str(ex)[:200]})
            continue
        if "CartesianProduct" in plan:
            findings.append({"query": name, "kind": "cartesian"})
        if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
            findings.append({"query": name, "kind": "nested_loop_join"})
        if name in oracle_keys and "BatchEvalPython" in plan:
            findings.append({"query": name, "kind": "python_udf"})

    for f in findings:
        print(json.dumps(f))
    print(
        json.dumps(
            {
                "queries_audited": len(qs),
                "findings": len(findings),
                "whitelisted_nested_loop": sorted(
                    n for n in NESTED_LOOP_OK if n in qs
                ),
            }
        )
    )
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
