"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop write (computes every
output column, no driver collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from node_etl_spark.plans import QUERIES  # noqa: E402
from node_etl_spark.session import get_spark  # noqa: E402

# The benched set is DERIVED from the registry (verdict r10 ask #3):
# every gate query is benched unless explicitly excluded here with a
# one-line reason, and tests/test_plans.py asserts the partition —
# a new query can never land gate-green yet silently skip the bench.
# (The r1-r10 HEADLINE list was hand-curated and had drifted 52
# queries behind the registry for no documented reason.)
EXCLUDED: dict[str, str] = {}

HEADLINE = [n for n in QUERIES if n not in EXCLUDED]

# calibration anchors: the r9 driver box's probe values. Dividing a
# run's probes by these gives that box's slowdown vs the anchor;
# value_calib_adjusted divides the suite seconds by the geometric
# mean of the two slowdowns (JVM + Python-worker), separating engine
# changes from machine changes across rounds (verdict r10 ask #4 —
# r10's raw 0.77x understated the win because its box probed 1.66x
# slower than r9's).
CALIB_REF_SEC = 0.071
CALIB_REF_PY_SEC = 0.39


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("node-etl-spark-bench")
    # warm the JVM, codegen, parquet reader, and Python/Arrow worker
    # pool so per-query timings measure steady-state engine
    # performance, not one-time session startup (the daemon fork +
    # Arrow init otherwise lands on whichever query first uses a
    # Pandas UDF)
    spark.range(1).count()

    def _warm_gen(batches):
        yield from batches

    spark.range(100000).repartition(64).mapInPandas(_warm_gen, "id long").count()
    from node_etl_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()

    # best-of-2 per query: a single pass is hostage to co-tenant CPU
    # noise and first-touch cache effects; the min is the steady-state
    # engine cost
    def clear_blocks() -> None:
        # iterative operators (connected components, pagerank, BFS)
        # localCheckpoint/persist per round; those blocks are only
        # reclaimed when the JVM GCs the RDD handles. Left alone they
        # pile up across the suite until storage eviction kicks in —
        # and an evicted localCheckpoint block is unrecoverable
        # (lineage was truncated), surfacing as task retries and
        # wildly noisy timings. Each query starts from a clean slate.
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # optional subset (comma-separated full names or qNN prefixes):
    # scale-decade runs re-measure a handful of queries on much
    # larger data, where running the full suite would be wasteful
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    headline = HEADLINE
    if only_env:
        want = {w.strip() for w in only_env.split(",") if w.strip()}
        headline = [
            n for n in HEADLINE
            if n in want or n.split("_", 1)[0] in want
        ]
    timings: dict[str, float] = {}
    t_suite0 = time.time()
    for name in headline:
        q = QUERIES.get(name)
        if q is None:
            continue
        best = None
        for _ in range(runs):
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            clear_blocks()
        timings[name] = round(best, 3)
    t_suite1 = time.time()
    total = round(sum(timings.values()), 3)
    # the driver records only the LAST ~2000 chars of output; emit the
    # queries dict under short keys ("q01", "q122", ...) with compact
    # separators. Sorted ASCENDING by seconds (verdict r9 ask #5): the
    # tail window keeps the END of the line, so the slowest (hot-set)
    # queries go last and survive any truncation length — BENCH_r09
    # lost q01-q174's timings because registration order put them first
    short = {
        name.split("_", 1)[0]: secs
        for name, secs in sorted(timings.items(), key=lambda kv: kv[1])
    }
    # fixed-work CPU calibration (hash+sum over 100M longs, best of
    # 3): round-over-round suite comparisons span VM instances whose
    # raw speed varies by tens of percent; dividing by calib_sec
    # separates engine changes from machine changes
    calib = None
    for _ in range(3):
        t0 = time.time()
        # modulo keeps the exact ANSI sum inside int64 (raw xxhash64
        # values are uniform over the full long range and overflow)
        spark.range(100_000_000).selectExpr(
            "sum(xxhash64(id) % 1000003) AS s"
        ).collect()
        dt = time.time() - t0
        calib = dt if calib is None else min(calib, dt)
    # second probe (r8 verdict ask #5): the JVM-only probe above does
    # not track Python-worker throughput, so cross-box comparisons of
    # pandas_udf-heavy queries produced phantom regressions (r8's
    # +13.6% artifact delta that an on-box A/B disproved). Round-trip
    # a fixed numpy workload through Arrow + a Spark Python worker —
    # best of 3 after one warm-up (worker fork + Arrow init is
    # one-time cost, not steady-state throughput)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _calib_py(v):  # pragma: no cover - bench-only probe
        import numpy as np

        x = v.to_numpy(dtype="float64")
        acc = np.zeros_like(x)
        for _ in range(50):
            acc = np.sqrt(acc + x * 1.0000001)
        import pandas as _pd

        return _pd.Series(acc)

    calib_py = None
    probe = spark.range(2_000_000).selectExpr("CAST(id AS DOUBLE) AS x")
    for i in range(4):
        t0 = time.time()
        probe.select(_calib_py("x").alias("y")).selectExpr(
            "sum(y) AS s"
        ).collect()
        dt = time.time() - t0
        if i == 0:
            continue  # warm-up: python worker fork + Arrow setup
        calib_py = dt if calib_py is None else min(calib_py, dt)
    # third probe (r11): the numpy pyworker probe tracks Arrow+BLAS
    # throughput but NOT bytecode interpretation speed, which is what
    # the pure-Python codec family (q306-q308 JPEG/video bit readers)
    # burns — the r11/r10 cross-box comparison showed a 1.5x codec
    # delta at near-identical numpy probes. Fixed integer/branch
    # loop, best of 3, driver-side (UDF workers fork this same
    # interpreter).
    def _bytecode_probe() -> int:
        acc = 0
        for i in range(2_000_000):
            acc = (acc + i * 31) & 0xFFFFFFFF
            if acc & 1:
                acc ^= 0x9E3779B9
        return acc

    calib_bc = None
    for _ in range(3):
        t0 = time.time()
        _bytecode_probe()
        dt = time.time() - t0
        calib_bc = dt if calib_bc is None else min(calib_bc, dt)
    # machine-normalized suite seconds: divide by the geometric mean
    # of this box's slowdown vs the r9 anchor on both probes. Compare
    # value_calib_adjusted across rounds; the raw value stays for
    # on-box A/Bs.
    slowdown = (
        (calib / CALIB_REF_SEC) * (calib_py / CALIB_REF_PY_SEC)
    ) ** 0.5
    adjusted = round(total / slowdown, 3)
    # key order matters: the driver's BENCH artifact keeps only the
    # LAST ~2000 chars of stdout, so the headline total and calibration
    # must come AFTER the (long) queries dict or they get truncated
    # away (r6's artifact lost "value" exactly this way)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "unit": "sec",
                "sf": sf,
                "queries": short,
                "n_queries": len(short),
                "calib_sec": round(calib, 3),
                "calib_pyworker_sec": round(calib_py, 3),
                "calib_pybytecode_sec": round(calib_bc, 3),
                "value_calib_adjusted": adjusted,
                "value": total,
            },
            separators=(",", ":"),
        )
    )
    # Full per-query map as a committed artifact (r11 verdict ask #2):
    # the driver's BENCH artifact keeps only the last ~2000 chars of
    # stdout, so round-over-round per-query deltas had to be scraped
    # from truncated tails. Write the COMPLETE map (full names, not the
    # truncation-friendly short keys) to a side file; the stdout
    # contract above is unchanged. Path override for A/B runs via env.
    perq_path = os.environ.get(
        "SPARK_GRAFT_PERQ_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_PERQ_LOCAL.json"),
    )
    try:
        with open(perq_path, "w") as fh:
            json.dump(
                {
                    "sf": sf,
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                    "runs": runs,
                    "n_queries": len(timings),
                    "calib_sec": round(calib, 3),
                    "calib_pyworker_sec": round(calib_py, 3),
                    "calib_pybytecode_sec": round(calib_bc, 3),
                    "value": total,
                    "value_calib_adjusted": adjusted,
                    "suite_wall_sec": round(t_suite1 - t_suite0, 3),
                    "per_query": dict(
                        sorted(timings.items(), key=lambda kv: kv[1])
                    ),
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    except OSError:
        pass  # a read-only checkout must never break the bench contract
    # ...and a final SHORT line that is complete, parseable JSON well
    # inside any tail window, so the headline number always survives.
    # Distinct metric name + summary flag (round-8 ADVICE): a consumer
    # parsing by metric key must never double-count the two lines
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds_summary",
                "summary": True,
                "value": total,
                "value_calib_adjusted": adjusted,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(short),
                "calib_sec": round(calib, 3),
                "calib_pyworker_sec": round(calib_py, 3),
                "calib_pybytecode_sec": round(calib_bc, 3),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
