#!/bin/bash
# Parallelism-sweep correctness gate: run graft.Verify at 4 AND 32
# partitions (the builder's old config and the driver's), then selfcheck
# both against the DuckDB oracle AND against each other bit-exact.
# A query that is green at one width and red at another is a
# partition-order-sensitive bug (the o43 class) — this gate refuses it.
#
#   tools/sweep.sh [sfDir]        # default /root/testdata/sf0.01
set -e
SF_DIR="${1:-/root/testdata/sf0.01}"
TAG="$(basename "$SF_DIR")"
OUT4="/tmp/verify_${TAG}_p4"
OUT32="/tmp/verify_${TAG}_p32"
cd "$(dirname "$0")/.."
SPARK_GRAFT_CPUS=4  sbt "runMain graft.Verify $SF_DIR $OUT4"
SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify $SF_DIR $OUT32"
python3 tools/selfcheck.py "$SF_DIR" "$OUT4" "$OUT32"
