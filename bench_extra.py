#!/usr/bin/env python
"""Round-6 optimization harness (guide §1): per-query noop-sink timing +
plan capture for ANY subset of the declared queries, at any SF dir.

Unlike bench.py (FROZEN driver contract), this file is free to evolve.
It reuses the exact same session shape as bench.py (same confs, tmpfs
shuffle dirs, python-worker warmup) so numbers are comparable.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 --queries headline
  python bench_extra.py --queries dedup_minhash_signatures,ann_ivf_topk --runs 3
  python bench_extra.py --plans-dir plans/r06 --suffix before --queries all --runs 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "a1_stoichiometry_order",
    "a2_latest_top1_per_group", "w4_sessionization", "d2_symmetric_edge_dedup",
    "j1_endpoint_resolution", "skew_salted_count", "dedup_exact_groups",
    "dedup_minhash_signatures", "dedup_minhash_lsh_pairs", "dedup_simhash32",
    "text_quality_score", "text_token_count", "ann_cosine_topk", "ann_ivf_topk",
    "asof_join_profiles", "merge_upsert_customers", "dedup_near_dup_clusters",
    "sample_split_assign",
]


def _session(cpus: int):
    from kg.session import get_spark

    extra = {}
    shm = "/dev/shm/kg-spark-local"
    if os.path.isdir("/dev/shm"):
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    if cpus >= (os.cpu_count() or cpus):
        extra["spark.kg.extract.partitions"] = str(max(2, cpus // 2))
    raw = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in raw.split(";" if ";" in raw else ","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark("bench-extra", parallelism=cpus, extra_conf=extra)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401

    def _noop(it):
        for pdf in it:
            yield pdf

    (spark.range(cpus * 4).repartition(cpus)
     .mapInPandas(_noop, schema="id long").count())
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="headline")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus)

    import __spark_entry__ as em

    qs = em.queries()
    if args.queries == "headline":
        names = HEADLINE
    elif args.queries == "all":
        names = list(qs)
    else:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]

    out: dict[str, object] = {}
    for name in names:
        sc = spark.sparkContext
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(
                    args.plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        samples, build_samples = [], []
        for i in range(args.runs):
            spark.catalog.clearCache()
            sc.setJobDescription(f"{name} build {i}")
            # builder runs OUTSIDE the timed region, exactly like the frozen
            # bench.py's `_force(qs[name](spark, sf_dir))` argument evaluation
            t0 = time.monotonic()
            df = qs[name](spark, args.sf_dir)
            build_samples.append(round(time.monotonic() - t0, 3))
            sc.setJobDescription(f"{name} run {i}")
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
            sc.setJobDescription(None)
        if samples:
            out[name] = {
                "min": min(samples), "samples": samples,
                "build": build_samples,
            }
            print(f"{name}: min={min(samples)} {samples} build={build_samples}",
                  flush=True)
    line = json.dumps({"sf_dir": args.sf_dir, "cpus": cpus, "queries": out})
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
