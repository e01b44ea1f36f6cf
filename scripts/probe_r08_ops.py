"""One-off scale probe for the late-round-8 operators: heavy_hitters,
KMV overlap, Count-Min build, and the IVF-PQ lifecycle verbs, at 1×
and 10× the sf0.1 documents/embeddings tables. Prints one JSON line
per (op, scale) with warm timings and a loadavg stamp — NOTES.md
evidence, mirroring scripts/scale_rehearsal.py's methodology."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from regpulse_lakehouse_spark.operators import quantize as Q  # noqa: E402
from regpulse_lakehouse_spark.operators import sketches as SK  # noqa: E402
from regpulse_lakehouse_spark.session import get_spark  # noqa: E402
from regpulse_lakehouse_spark.sources.tpch import load_table  # noqa: E402


def timed(fn, iters=3):
    fn()  # warm
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        fn()
        ts.append(round(time.monotonic() - t0, 3))
    return sorted(ts)[len(ts) // 2], ts


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-r08")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    emb = load_table(spark, sf_dir, "embeddings")
    out = []

    for copies in (1, 10):
        dd = docs
        ee = emb
        if copies > 1:
            dd = docs.crossJoin(
                spark.range(copies).select(F.col("id").alias("_c"))
            ).select(
                (F.col("doc_id") + F.col("_c") * 1_000_000).alias("doc_id"),
                "text",
                "source",
            )
            ee = emb.crossJoin(
                spark.range(copies).select(F.col("id").alias("_c"))
            ).select(
                (F.col("vec_id") + F.col("_c") * 1_000_000).alias("vec_id"),
                "embedding",
            )
        dd = dd.localCheckpoint()
        ee = ee.localCheckpoint()
        n_docs = dd.count()

        m, spread = timed(lambda: SK.heavy_hitters(dd, "source", top_k=5).collect())
        out.append({"op": "heavy_hitters_top5", "copies": copies,
                    "rows": n_docs, "warm_median_s": m, "spread": spread})

        def kmv_overlap():
            a = dd.filter(F.col("doc_id") % 3 != 0).withColumn("g", F.lit("x"))
            b = dd.filter(F.col("doc_id") % 3 != 1).withColumn("g", F.lit("x"))
            sa = SK.kmv_partials(a, ["g"], "doc_id", 256).select(F.col("kmv").alias("ka"))
            sb = SK.kmv_partials(b, ["g"], "doc_id", 256).select(F.col("kmv").alias("kb"))
            sa.crossJoin(sb).select(
                SK.kmv_intersection(F.col("ka"), F.col("kb"), 256).alias("i")
            ).collect()

        m, spread = timed(kmv_overlap)
        out.append({"op": "kmv_overlap", "copies": copies,
                    "rows": n_docs, "warm_median_s": m, "spread": spread})

        def cm_build():
            SK.cm_partials(
                dd.withColumn("g", F.lit(1)), ["g"], "source", w=1024, d=4
            ).collect()

        m, spread = timed(cm_build)
        out.append({"op": "cm_partials", "copies": copies,
                    "rows": n_docs, "warm_median_s": m, "spread": spread})

        def ivf_lifecycle():
            root = tempfile.mkdtemp() + "/ivf"
            half1 = ee.filter(F.col("vec_id") % 2 == 0)
            half2 = ee.filter(F.col("vec_id") % 2 == 1)
            Q.ivf_pq_build(half1, root, n_centroids=16)
            Q.ivf_pq_append(spark, root, half2)
            vids = [r["vec_id"] for r in ee.limit(50).collect()]
            Q.ivf_pq_delete(spark, root, vids)
            Q.ivf_pq_compact(spark, root)

        m, spread = timed(ivf_lifecycle, iters=2)
        out.append({"op": "ivf_lifecycle_full", "copies": copies,
                    "rows": ee.count(), "warm_median_s": m, "spread": spread})

    print(json.dumps({"loadavg": os.getloadavg()[0], "probes": out}))


if __name__ == "__main__":
    main()
