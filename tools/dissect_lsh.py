"""Stage dissection for dedup_embedding_lsh (VERDICT r19 item 3): time the
keys / buckets / candidate / verify legs separately, best-of-N, plus the
full judged query, so the LSH plane-dot fold's net effect is attributable
leg by leg.

    SPARK_GRAFT_CPUS=32 python tools/dissect_lsh.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import pyspark.sql.functions as F

    from mycenae_spark.functions.dedup import bucket_pairs
    from mycenae_spark.functions.similarity import (
        embedding_lsh_pairs, hyperplane_planes, with_norm,
    )
    from mycenae_spark.functions import similarity as S
    from mycenae_spark.registry import QUERIES
    from mycenae_spark.session import get_spark
    from mycenae_spark.sources.tables import spread_scan

    spark = get_spark("dissect_lsh")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_tables, n_bits, dim = 4, 4, 64
    from mycenae_spark.registry.util import r6

    def keys_frame():
        cn = spread_scan(corpus.select("vec_id", "embedding"),
                         site="sim.embedding_lsh")
        plane_by_tb = {
            (t, b): comps
            for t, b, comps in hyperplane_planes(n_tables, n_bits, dim)
        }
        table_keys = []
        for t in range(n_tables):
            key = F.lit(0).cast("long")
            for b in range(n_bits):
                arr = F.array(*[F.lit(c) for c in plane_by_tb[(t, b)]])
                key = key + F.when(
                    r6(S.dot(F.col("embedding"), arr)) >= 0,
                    F.lit(1 << b).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            table_keys.append(F.struct(F.lit(t).alias("t"), key.alias("key")))
        from mycenae_spark.sources.tables import explode_ne
        return cn.select(
            "vec_id", explode_ne(F.array(*table_keys)).alias("_tk")
        ).select("vec_id", F.col("_tk.t").alias("t"), F.col("_tk.key").alias("key"))

    def buckets_frame():
        return (
            keys_frame().groupBy("t", "key")
            .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
            .filter(F.size("ids") > 1)
            .filter(F.size("ids") <= 512)
        )

    def cand_frame():
        return bucket_pairs(buckets_frame())

    def full_pairs():
        return embedding_lsh_pairs(
            corpus, n_tables=4, n_bits=4, threshold=0.95,
            score_rounder=r6, max_bucket_size=512,
        )

    def judged():
        return QUERIES["dedup_embedding_lsh"](spark, sf_dir)

    legs = [
        ("keys", keys_frame),
        ("buckets", buckets_frame),
        ("cand_pairs", cand_frame),
        ("full_pairs_verify", full_pairs),
        ("judged_query", judged),
    ]
    for name, fn in legs:
        times, rows = [], None
        for i in range(reps):
            sc.setJobDescription(f"dissect {name} rep{i}")
            t0 = time.perf_counter()
            rows = fn().count()
            times.append(time.perf_counter() - t0)
        print(f"{name:20s} rows={rows:>9d}  "
              + " ".join(f"{t:6.2f}" for t in times)
              + f"  min={min(times):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
