"""Round-6 optimization micro-bench: time individual declared queries in
isolation with the SAME session + forcing methodology as bench.py, plus
optional .explain("formatted") capture (guide §1).

Usage:
    python bench_extra.py q1,q2,... [--reps N] [--explain DIR] [--noop]

- Timing default mirrors bench.py's `run` (xxhash64 over all columns,
  summed) so numbers are comparable with BENCH_r05.json per-query rows.
- --noop instead forces via the noop sink (guide §1.4): every column of
  every row computed, no aggregate — used to isolate computation shape.
- --explain DIR writes DIR/<name>.txt with the formatted physical plan.
- Prints one JSON line: {"queries": {name: [sec, ...]}, "rows": {...}}.

This file is NOT the driver bench; bench.py is frozen for measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n] if len(sys.argv) > 1 else []
    reps = 1
    explain_dir = None
    use_noop = False
    args = sys.argv[2:]
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif args[i] == "--noop":
            use_noop = True; i += 1
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from pyspark.sql import functions as F

    from modlyn_spark.session import get_spark

    spark = get_spark(
        "modlyn-spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    all_qs = {**entrymod.retired_queries(), **entrymod.queries()}
    # bench.py-local composites, resolved the same way the driver does
    import bench as benchmod

    extra = {
        "flagship_pipeline": benchmod._flagship,
        "dedup_minhash_groups": benchmod._minhash_groups,
    }
    # bench.py display names that differ from the queries() keys: parse
    # the bench('name', ... all_qs["key"] ...) pairs out of its source
    import inspect
    import re as _re

    bench_src = inspect.getsource(benchmod)
    for m in _re.finditer(
        r'bench\("([a-z0-9_]+)",\s*\n?\s*lambda: run\(all_qs\["([a-z0-9_]+)"\]',
        bench_src,
    ):
        disp, key = m.group(1), m.group(2)
        if disp != key:
            extra[disp] = (lambda s, d, q=key: all_qs[q](s, d))

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1).collect()

    def force(df) -> int:
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        row = (
            df.select(F.xxhash64(*df.columns).alias("__h"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("__h").cast("decimal(38,0)")).alias("s"),
            )
            .collect()[0]
        )
        return int(row["n"])

    timings: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    hashes: dict[str, str] = {}
    for name in names:
        fn = extra.get(name) or (lambda s, d, q=all_qs[name]: q(s, d))
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(txt)
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            n = force(fn(spark, sf_dir))
            timings.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            rows[name] = n
            spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": timings, "rows": rows}))


if __name__ == "__main__":
    main()
