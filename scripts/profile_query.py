"""Isolated per-query profiler for the optimization rounds.

Usage: python scripts/profile_query.py <query> [query ...] [--runs N]
       [--explain] [--sf DIR]

Warms the session exactly like bench.py, then times each named query
with the noop sink (best/all runs printed).  --explain additionally
writes plans/r11/<qNN>_<when>.txt (`when` from $PROFILE_TAG, default
"before").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from node_etl_spark.plans import QUERIES  # noqa: E402
from node_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 2
    explain = False
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--runs":
            runs = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain = True; i += 1
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    tag = os.environ.get("PROFILE_TAG", "before")
    spark = get_spark("profile-query")
    spark.range(1).count()

    def _warm_gen(batches):
        yield from batches

    spark.range(100000).repartition(64).mapInPandas(_warm_gen, "id long").count()
    from node_etl_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()

    def clear_blocks() -> None:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    full = {n.split("_", 1)[0]: n for n in QUERIES}
    for want in names:
        name = QUERIES.get(want) and want or full.get(want, want)
        q = QUERIES.get(name)
        if q is None:
            print(f"unknown query {want}"); continue
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times.append(dt)
            clear_blocks()
        if explain:
            plans_dir = os.environ.get("PROFILE_PLANS_DIR", "plans/r12")
            os.makedirs(plans_dir, exist_ok=True)
            df = q.fn(spark, sf_dir)
            p = f"{plans_dir}/{name.split('_', 1)[0]}_{tag}.txt"
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            clear_blocks()
        print(f"{name}: best={min(times):.2f}s runs=" +
              ",".join(f"{t:.2f}" for t in times), flush=True)


if __name__ == "__main__":
    main()
