"""Piecewise stage timing for the ANN ladder (guide §1: measure
first).  Times, with the noop sink and labeled jobs, the component
stages of the expensive emb_* entries so the optimization targets the
stage that actually dominates:

- coarse k-means train (ext/kmeans.fit)
- coarse bucket assignment (pq.assign_buckets_l2)
- PQ codebook train (pq.train_codebooks)
- PQ encode (pq.pq_encode)
- IVF-PQ search given buckets+codes (pq.ivf_pq_topk end-to-end minus
  reused train, approximated by timing the full entry separately)

Usage: python tools/probe_ann_stages.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from trade_data_collection_service_spark.session import get_spark
    from trade_data_collection_service_spark.ext import kmeans as KM
    from trade_data_collection_service_spark.ext import pq as PQ
    from trade_data_collection_service_spark.ext.similarity import vectors

    spark = get_spark("ann-stage-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, list[float]] = {}

    def t(label, fn):
        for _ in range(reps):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(label)
            fn()
            spark.sparkContext.setJobDescription(None)
            out.setdefault(label, []).append(
                round(time.perf_counter() - t0, 4)
            )

    v = vectors(spark, sf_dir).select("vec_id", "emb")
    t("vectors-scan", lambda: noop(v))

    t("kmeans-fit-k8-it5", lambda: KM.fit(spark, sf_dir, k=8, max_iters=5, round_to=6))

    cent, _ = KM.fit(spark, sf_dir, k=8, max_iters=5, round_to=6)
    t("assign-buckets", lambda: noop(PQ.assign_buckets_l2(v, cent)))

    t("pq-train-m4-k16-it4", lambda: noop(PQ.train_codebooks(spark, sf_dir)))

    books = PQ.train_codebooks(spark, sf_dir).localCheckpoint(eager=True)
    t("pq-encode", lambda: noop(PQ.pq_encode(v, books)))

    import json

    print(
        "ANNSTAGES "
        + json.dumps({k: sorted(vs) for k, vs in out.items()})
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
