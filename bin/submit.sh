#!/usr/bin/env bash
# spark-submit entry points for the graft engine (north_rule: "run via
# spark-submit on a multi-executor cluster"). Local sandbox shown; on a real
# cluster replace --master with yarn/k8s and size executors as usual — the
# library contains no local-mode assumptions (all parallelism comes from
# partitioning; see PERF.md).
#
#   bin/submit.sh verify  <sfDir> <outDir> [queryCsv]
#   bin/submit.sh bench   <sfDir>
#   bin/submit.sh scaling <sfDir> <lowCores> <highCores>   # N vs 4N evidence
set -euo pipefail
JAR="$(dirname "$0")/../target/scala-2.13/osmintersectionsspark_2.13-0.1.0.jar"
SUBMIT="${SPARK_HOME:-/opt/spark}/bin/spark-submit"
CPUS="${SPARK_GRAFT_CPUS:-32}"
case "${1:?verify|bench|scaling}" in
  verify)
    exec "$SUBMIT" --master "local[$CPUS]" --driver-memory 16g \
      --class graft.Verify "$JAR" "${2:?sfDir}" "${3:?outDir}" "${4-}" ;;
  bench)
    SPARK_GRAFT_SF_DIR="${2:?sfDir}" exec "$SUBMIT" --master "local[$CPUS]" \
      --driver-memory 48g --class graft.Bench "$JAR" ;;
  scaling)
    # same job, same input, two parallelism levels low vs min(cpus, 4*low)
    # (the sandbox evidence protocol for the two-cluster-size rule; Bench
    # spawns pinned per-leg JVMs, interleaves legs, and storm-gates samples)
    SPARK_GRAFT_SF_DIR="${2:?sfDir}" SPARK_GRAFT_BENCH_SCALING_ONLY=1 \
    SPARK_GRAFT_SCALE_LOW="${3:?low}" SPARK_GRAFT_CPUS="${4:?high}" \
      exec "$SUBMIT" --master "local[${4}]" --driver-memory 48g \
      --class graft.Bench "$JAR" ;;
  *) echo "unknown mode $1" >&2; exit 2 ;;
esac
