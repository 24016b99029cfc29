"""Physical-plan audit: for each contract query, report predicate
pushdown, join strategies, and exchange counts — the `.explain`
discipline from SURVEY.md §4 (run after changing any operator).

Usage: python tools/audit_plans.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOINS = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "CartesianProduct", "BroadcastNestedLoop",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import kg.entry_queries as eq
    from kg.session import get_spark

    spark = get_spark("plan-audit", parallelism=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, fn in eq.queries().items():
        if name_filter and name_filter not in name:
            continue
        df = fn(spark, sf_dir)
        p = df._jdf.queryExecution().explainString(mode)
        pushed = [ln.strip() for ln in p.splitlines()
                  if "PushedFilters" in ln and ": []" not in ln]
        joins = sorted({j for ln in p.splitlines() for j in JOINS if j in ln})
        exchanges = sum(ln.strip().startswith("Exchange") or "+- Exchange" in ln
                        for ln in p.splitlines())
        print(f"== {name}: joins={joins} exchanges~{exchanges} "
              f"pushed_filters={len(pushed)}")
        for ln in pushed[:4]:
            print(f"    {ln[:110]}")


if __name__ == "__main__":
    main()
