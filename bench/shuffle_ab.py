"""Shuffle-bytes A/B harness for key-encoding experiments (VERDICT r4
item 4 discipline: measure, don't assume — bytes-not-count only wins
when the cut bytes are real).

Usage:  python bench/shuffle_ab.py <repo_path> [n_docs]

Runs the hot dedup/contamination operators from <repo_path>'s kg package
on a deterministic scaled-up document corpus and prints ONE JSON line
with per-op wall seconds and total shuffle WRITE bytes (summed over all
completed stages via the Spark UI REST API — the same numbers the Spark
UI shows).  Run once against the current checkout and once against a
git worktree of the previous commit; fresh JVM per invocation.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _mk_corpus(spark, n_docs: int, src: str) -> str:
    out = f"/tmp/kg_shuffle_ab_docs_{n_docs}.parquet"
    if os.path.exists(out):
        return out
    from pyspark.sql import functions as F

    base = spark.read.parquet(src)
    n_base = base.count()
    reps = (n_docs + n_base - 1) // n_base
    docs = (
        base.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
            # vary the tail so replicas are near- rather than exact dups
            F.concat("text", F.lit(" v"), F.col("rep").cast("string")).alias("text"),
            "lang",
            "source",
            (F.length("text") + 3).cast("long").alias("n_chars"),
        )
        .where(F.col("doc_id") < n_docs)
    )
    docs.repartition(32).write.mode("overwrite").parquet(out)
    return out


def _shuffle_write_bytes() -> int:
    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages", timeout=30)
    )
    return sum(
        s.get("shuffleWriteBytes", 0)
        for s in stages
        if s.get("status") == "COMPLETE"
    )


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    sys.path.insert(0, repo)

    from kg.session import get_spark

    spark = get_spark(
        "shuffle-ab",
        extra_conf={
            "spark.ui.enabled": "true",
            # keep AQE from coalescing differently between variants
            "spark.sql.adaptive.enabled": "true",
        },
    )
    src = os.environ.get(
        "SPARK_GRAFT_DOCS", "/root/testdata/sf0.1/documents.parquet"
    )
    corpus = _mk_corpus(spark, n_docs, src)
    docs = spark.read.parquet(corpus)

    from kg.ops.dedup import exact_dedup_groups, minhash_lsh_pairs
    from kg.ops.sample import ngram_overlap_contamination

    evald = docs.where(docs.doc_id % 1000 == 0)  # 0.1% as the eval side
    ops = {
        "exact_dedup_groups": lambda: exact_dedup_groups(docs).count(),
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(docs).count(),
        "ngram_contamination": lambda: ngram_overlap_contamination(
            docs, evald, n=13
        ).count(),
    }
    results = {}
    before_total = _shuffle_write_bytes()
    for name, fn in ops.items():
        t0 = time.time()
        n = fn()
        wall = time.time() - t0
        after = _shuffle_write_bytes()
        results[name] = {
            "rows": int(n),
            "wall_sec": round(wall, 2),
            "shuffle_write_bytes": int(after - before_total),
        }
        before_total = after
    print(
        json.dumps(
            {"repo": repo, "n_docs": n_docs, "ops": results}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
