"""CLI entry point — the rebuild of ``go run agent.go -c config.yml``
(reference agent.go:44-75).

    python -m log_formatter_spark -c pipeline.yml [--streaming] \
        [--out DIR] [--checkpoint DIR]

Batch mode plans and drives the configured input→formatters→output DAG
(plans/planner.py). Streaming mode runs the checkpoint-resumable
foreachBatch flagship over the configured source directory — the
graceful-stop + resume answer to the reference's drain-with-timeout
shutdown (agent/manager.go:81-88). Designed to be launched with
``spark-submit --py-files`` on a cluster; see scripts/submit.sh.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="log_formatter_spark")
    ap.add_argument("-c", "--config", required=True, help="YAML pipeline spec")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument("--out", help="output dir (streaming mode)")
    ap.add_argument("--checkpoint", help="checkpoint dir (streaming mode)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from log_formatter_spark import get_spark
    from log_formatter_spark.plans import load_config, run_batch

    cfg = load_config(args.config)
    spark = get_spark("log-formatter-spark", cores=args.cores)
    try:
        if args.streaming:
            if not (args.out and args.checkpoint):
                ap.error("--streaming requires --out and --checkpoint")
            from log_formatter_spark.streaming import run_streaming_pipeline

            src = cfg["input"].get("path") or cfg["input"].get("sf_dir")
            ledger = run_streaming_pipeline(
                spark, src, args.out, args.checkpoint,
                max_files_per_trigger=cfg["input"].get("max_files_per_trigger"),
            )
            print(ledger.snapshot())
        else:
            df = run_batch(spark, cfg)
            print(f"pipeline complete: {len(df.columns)} columns routed")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
