"""spark-submit entrypoint: training-data curation over a documents table.

Usage:
  spark-submit --py-files opengin_ingestion_spark.zip jobs/curate_job.py \
      --docs /root/testdata/sf0.1/documents.parquet \
      --out /tmp/curated [--min-quality 0.2] [--near-dup-threshold 0.7]

Writes the curated corpus to <out>/docs and the per-document decision
report to <out>/decisions; prints a one-line JSON summary. Same shape on a
real cluster — nothing local-mode-specific.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min-quality", type=float, default=0.2)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--near-dup-threshold", type=float, default=0.7)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("opengin_curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from opengin_ingestion_spark.plans.curate import CurateConfig, curate_documents

    docs = spark.read.parquet(args.docs)
    kept, decisions = curate_documents(
        docs,
        CurateConfig(
            min_quality=args.min_quality,
            min_tokens=args.min_tokens,
            near_dup_threshold=args.near_dup_threshold,
        ),
    )
    from pyspark.sql import functions as F

    kept.write.mode("overwrite").parquet(f"{args.out}/docs")
    decisions.write.mode("overwrite").parquet(f"{args.out}/decisions")
    counts = {
        r["decision"]: r["n"]
        for r in spark.read.parquet(f"{args.out}/decisions")
        .groupBy("decision").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # sum of decisions == input size by the one-decision-per-doc contract
    print("CURATE_DONE " + json.dumps({"in": sum(counts.values()), "decisions": counts}))


if __name__ == "__main__":
    main()
