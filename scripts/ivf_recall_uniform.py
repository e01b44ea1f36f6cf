"""Near-uniform sf1-scale IVF-PQ recall point (VERDICT r11 wrongness
item 2 / task 5): the r11 sf1/sf10 rehearsal measured recall@5 = 1.0 on
a CLUSTERED shifted-replica corpus — IVF's easy case. This script
measures the UNFAVORABLE geometry at scale: 200k deterministic
md5-derived embeddings (operators/vector.deterministic_embedding — the
same near-uniform construction as the graded fixture, mean pairwise
cosine ≈ 0), dim 64, built into a persisted IVF-PQ index with the
round-12 SELF-SIZED (n_probe, shortlist) (operators/quantize.
ivf_search_params), recall@5 for 20 held-out queries vs the exact
brute-force answer.

Run:  PYTHONPATH=/root/repo python3 scripts/ivf_recall_uniform.py
      [--n 200000] [--fixed]   (--fixed re-measures the OLD fixed
      (7, 400) pair for the drift comparison)

Prints one JSON line; the result is recorded in NOTES.md round 12.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--fixed", action="store_true",
                    help="use the pre-r12 fixed (7, 400) instead of self-sized")
    args = ap.parse_args()

    from regpulse_lakehouse_spark.operators import quantize as Q
    from regpulse_lakehouse_spark.operators import vector as V
    from regpulse_lakehouse_spark.session import get_spark

    spark = get_spark("ivf_recall_uniform")
    emb = V.deterministic_embedding(F.col("key"), dim=64)
    base = (
        spark.range(args.n + args.queries)
        .select(
            F.col("id").alias("vec_id"),
            F.concat(F.lit("u:"), F.col("id").cast("string")).alias("key"),
        )
        .select("vec_id", emb.alias("embedding"))
    )
    queries = base.filter(F.col("vec_id") < args.queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    corpus = base.filter(F.col("vec_id") >= args.queries)

    path = f"/tmp/regpulse_ivf_uniform_{os.getpid()}"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    Q.ivf_pq_build(corpus, path, n_centroids=16, m=8, k_codes=256, assign_top=2)
    t_build = round(time.time() - t0, 1)

    if args.fixed:
        n_probe, shortlist = 7, 400
    else:
        n_probe, shortlist = Q.ivf_search_params(args.n, n_centroids=16, k=5, assign_top=2)

    t0 = time.time()
    ivf = {
        (r.query_id, r.vec_id)
        for r in Q.ivf_pq_search(
            spark, path, queries, n_probe=n_probe, k=5, shortlist=shortlist,
            rescore_corpus=corpus,
        ).collect()
    }
    t_search = round(time.time() - t0, 1)

    from pyspark.sql import Window as W

    sim = V.cosine(F.col("embedding"), F.col("qe"))
    w = W.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in corpus.crossJoin(F.broadcast(queries))
        .select("query_id", "vec_id", sim.alias("_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    recall = round(len(ivf & exact) / len(exact), 3)
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({
        "geometry": "near_uniform_md5", "n": args.n, "dim": 64,
        "n_probe": n_probe, "shortlist": shortlist,
        "mode": "fixed_r11" if args.fixed else "self_sized_r12",
        "recall_at_5": recall, "build_sec": t_build, "search_sec": t_search,
    }))


if __name__ == "__main__":
    main()
