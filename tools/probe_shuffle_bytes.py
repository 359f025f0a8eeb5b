"""Per-entry shuffle-byte / stage / task structural probe.

Usage: python tools/probe_shuffle_bytes.py SF_DIR name [name ...]

For each named bench/registry query: warm once, then measure the
second run's completed-stage delta from the status REST API —
shuffle-write bytes, stage count, task count, and wall seconds.
Byte and stage counts are plan-structural (slot-insensitive up to
compression jitter), which makes them the honest before/after
evidence for shuffle-removal optimizations on a noisy host (the
bench's spans/bloom blocks set the precedent).  Prints one
``SHUFBYTES {json}`` line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    import urllib.request

    import bench
    from trade_data_collection_service_spark.session import get_spark

    spark = get_spark("shuffle-byte-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cleanup: list[str] = []
    suite = {
        **bench.headline_queries(),
        **bench.steady_state_queries(cleanup),
        **bench.bloom_join_queries(),
        **bench.skew_join_queries(),
    }
    import __spark_entry__ as entrymod

    q = entrymod.queries()

    def stages():
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=10,
        ) as r:
            return json.load(r)

    out: dict = {}
    for n in names:
        fn = suite.get(n) or q.get(n)
        if fn is None:
            print(f"no such query: {n}", file=sys.stderr)
            continue
        bench.run_one(spark, fn, sf_dir)  # warm
        mark = max(
            (int(s.get("stageId", -1)) for s in stages()), default=-1
        )
        t0 = time.perf_counter()
        wall = None
        try:
            spark.sparkContext.setJobDescription(f"bytes-probe {n}")
            bench.run_one(spark, fn, sf_dir)
            wall = round(time.perf_counter() - t0, 4)
        finally:
            spark.sparkContext.setJobDescription(None)
        # status store flush races a fast query; brief settle poll
        time.sleep(0.5)
        new = [
            s for s in stages() if int(s.get("stageId", -1)) > mark
        ]
        out[n] = {
            "wall_sec": wall,
            "shuffle_write_bytes": sum(
                int(s.get("shuffleWriteBytes", 0)) for s in new
            ),
            "n_stages": len(new),
            "n_tasks": sum(int(s.get("numCompleteTasks", 0)) for s in new),
        }
    print("SHUFBYTES " + json.dumps(out))
    import shutil

    for p in cleanup:
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
