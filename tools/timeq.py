"""Time individual registered queries at a given SF with the bench.py
session settings (warm JVM, cache-cleared passes, min-of-passes).

    python tools/timeq.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("timeq")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _identity(it):
        yield from it

    spark.range(1_000).mapInPandas(_identity, schema="id long").count()

    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    if warm_dir and os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in names:
            try:
                qs[name](spark, warm_dir).toArrow()
            except Exception as e:
                print(f"warmup {name}: {type(e).__name__}: {e}", flush=True)
        spark.catalog.clearCache()

    best: dict[str, float] = {}
    for p in range(passes):
        spark.catalog.clearCache()
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            try:
                df.toArrow()
            except Exception:
                df.collect()
            took = round(time.perf_counter() - t0, 3)
            best[name] = min(best.get(name, took), took)
            print(f"pass{p} {name}: {took}s", flush=True)
    for name, took in best.items():
        print(f"BEST {name}: {took}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
