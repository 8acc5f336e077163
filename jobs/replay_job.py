"""spark-submit entrypoint: bounded CDC replay of a change log into a
pages GinTable (the north_star run mode: `spark-submit --py-files`).

Usage:
  spark-submit --py-files opengin_ingestion_spark.zip jobs/replay_job.py \
      --log-dir <dir> --table <dir> [--buckets 64] [--streaming] \
      [--checkpoint <dir>] [--generate-events N]

On a real cluster the same invocation runs with --master yarn/k8s and N
executors; nothing in the job is local-mode-specific (the SparkSession is
taken from the submit environment, not built with a hardcoded master).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--buckets", type=int, default=None,
                   help="bucket count; default: auto-size from log bytes")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--supervised", action="store_true",
                   help="streaming mode: restart automatically when the "
                        "log's schema evolves mid-run (supervised_tail)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--maintenance-every", type=int, default=None,
                   help="run compaction + tombstone expiry every N batches")
    p.add_argument("--tombstone-retention", type=float, default=7 * 24 * 3600.0,
                   help="seconds; must exceed the source's lateness bound")
    p.add_argument("--generate-events", type=int, default=0,
                   help="generate a synthetic log first (driver-side, seeded)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("opengin_replay").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.generate_events:
        from opengin_ingestion_spark.sources.changelog import (
            ChangeLogSpec,
            generate_changelog,
        )

        generate_changelog(
            args.log_dir,
            ChangeLogSpec(
                n_events=args.generate_events,
                n_urls=max(1000, args.generate_events // 10),
                n_batches=16,
                seed=42,
            ),
        )

    if args.streaming:
        ckpt = args.checkpoint or (args.table + "_ckpt")
        common = dict(
            n_buckets=args.buckets, available_now=True,
            maintenance_every=args.maintenance_every,
            tombstone_retention_seconds=args.tombstone_retention,
        )
        if args.supervised:
            from opengin_ingestion_spark.streaming.tail import supervised_tail

            res = supervised_tail(spark, args.log_dir, args.table, ckpt, **common)
            print(f"SUPERVISED_RESTARTS {res['restarts']}")
        else:
            from opengin_ingestion_spark.streaming.tail import tail_changelog

            q = tail_changelog(spark, args.log_dir, args.table, ckpt, **common)
            q.awaitTermination()
    else:
        if args.maintenance_every is not None:
            raise SystemExit(
                "--maintenance-every is a streaming-tail option; batch mode "
                "runs maintenance explicitly via the CLI (compact / gc)"
            )
        from opengin_ingestion_spark.plans.replay import replay_changelog

        replay_changelog(spark, args.log_dir, args.table, n_buckets=args.buckets)

    from opengin_ingestion_spark.sources.gintable import GinTable

    t = GinTable.load(spark, args.table)
    snap = t.current_snapshot()
    print(
        "REPLAY_DONE "
        + json.dumps(
            {
                "version": snap["version"],
                "applied": snap["applied_batch_ranges"],
                "rows_written": sum(
                    f["rows"] for f in snap["files"]
                    if f.get("family", "base") == "base"
                ),
                "n_buckets": snap["n_buckets"],
                "metrics": snap["metrics"],
            }
        )
    )


if __name__ == "__main__":
    main()
