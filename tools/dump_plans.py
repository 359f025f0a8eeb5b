"""Dump .explain("formatted") for named registry/bench queries.

Usage: python tools/dump_plans.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt for each query, resolving names
against the bench suite first (steady-state entries live only
there), then the oracle registry — the same resolution order as
bench._fresh_jvm_probe.  Used to record the plans/r14/*_before.txt
and *_after.txt evidence files for the optimization round.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from trade_data_collection_service_spark.session import get_spark

    spark = get_spark("dump-plans")
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
    rc = 0
    for n in names:
        fn = suite.get(n) or q.get(n)
        if fn is None:
            print(f"no such query: {n}", file=sys.stderr)
            rc = 1
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    import shutil

    for p in cleanup:
        shutil.rmtree(p, ignore_errors=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
