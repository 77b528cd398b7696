#!/usr/bin/env bash
# Cluster launch via spark-submit --py-files (north-rule deployment shape).
#
#   scripts/submit.sh <master-url> <config.yml> [extra spark-submit args...]
#
# Packages the library as a zip shipped to every executor; the driver
# entry is the same CLI as `python -m log_formatter_spark`.
set -euo pipefail

MASTER="${1:?usage: submit.sh <master-url> <config.yml> [args...]}"
CONFIG="${2:?usage: submit.sh <master-url> <config.yml> [args...]}"
shift 2

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/log_formatter_spark.zip"
(cd "$REPO_DIR" && zip -qr "$ZIP" log_formatter_spark)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$@" \
  "$REPO_DIR/log_formatter_spark/__main__.py" -c "$CONFIG"
