"""Round-6 optimization harness (bench.py is FROZEN — extra measurement
lives here, per the optimization-round rules).

Modes:
  python bench_extra.py explain OUTDIR [suffix]
      Write `.explain("formatted")` of every declared query to
      OUTDIR/<name>_<suffix>.txt (no execution — cheap).
  python bench_extra.py time q1,q2,... [runs]
      Noop-sink timing (guide §1.4) of the named declared queries,
      best-of-<runs> after the same warmup bench.py uses. Prints one JSON
      line {"name": sec, ...}.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from opengin_ingestion_spark.session import get_spark


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _warmup(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _noop_udf = F.pandas_udf(lambda s: s, T.LongType())
    df = spark.range(100_000)
    df.select(F.sum(_noop_udf("id"))).collect()
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(1000).count()
    from opengin_ingestion_spark.operators.dedup import minhash_lsh_pairs

    tiny = df.limit(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("warm doc text number "), F.col("id")).alias("text"),
    )
    minhash_lsh_pairs(tiny, threshold=0.9).count()


def cmd_explain(outdir: str, suffix: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    qs = entry_mod.queries()
    only = os.environ.get("BENCH_EXTRA_ONLY")
    names = only.split(",") if only else list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep going
            plan = f"EXPLAIN FAILED: {e!r}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"explained {name}", flush=True)


def cmd_time(names: list[str], runs: int) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    _warmup(spark, sf_dir)
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _noop(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: best={best:.3f} samples={samples}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "explain":
        cmd_explain(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "before")
    elif mode == "time":
        names = sys.argv[2].split(",")
        runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        cmd_time(names, runs)
    else:
        raise SystemExit(f"unknown mode {mode}")
