"""Generate tools/plan_budgets.json: per-query physical-plan budgets
(shuffle-exchange count, broadcast-exchange count) for every registry
query at the test scale factor.

The budget is a regression CEILING, not a target:
``tests/test_plans.py::test_plan_exchange_budgets`` fails any query
whose plan now contains MORE exchanges than its recorded budget — the
structural form of "a refactor quietly added a shuffle". Queries whose
plans improve should have their budgets re-tightened by re-running this
tool (review the diff: every decrease is a win to bank, every increase
must be justified in the commit message).

Usage: python tools/gen_plan_budgets.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "plan_budgets.json")


def plan_counts(plan: str) -> dict:
    shuffle = sum(1 for ln in plan.splitlines()
                  if "Exchange hashpartitioning" in ln
                  or "Exchange rangepartitioning" in ln
                  or "Exchange SinglePartition" in ln)
    bcast = plan.count("BroadcastExchange")
    return {"shuffles": shuffle, "broadcasts": bcast}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from photon_spark.session import get_spark
    from photon_spark import queries as q

    spark = get_spark("plan-budgets", master="local[4]",
                      shuffle_partitions=4)
    budgets = {}
    for name, fn in q.QUERIES.items():
        try:
            plan = (fn(spark, sf_dir)._jdf.queryExecution()
                    .executedPlan().toString())
        except Exception as exc:
            print(f"SKIP {name}: {exc}", file=sys.stderr)
            continue
        budgets[name] = plan_counts(plan)
    with open(OUT, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    tot_s = sum(b["shuffles"] for b in budgets.values())
    tot_b = sum(b["broadcasts"] for b in budgets.values())
    print(f"wrote {len(budgets)} budgets to {OUT} "
          f"(total shuffles={tot_s}, broadcasts={tot_b})")


if __name__ == "__main__":
    main()
