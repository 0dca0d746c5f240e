#!/usr/bin/env bash
# N-vs-4N scaling deploy (north rule): same artifact, two cluster sizes.
# On a real cluster set MASTER to your resource manager (yarn / k8s / ...);
# in this sandbox MASTER defaults to local-mode proxies (BENCH/BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."

N_EXEC="${N_EXEC:-4}"
JOB="${JOB:-ingest_cc}"
ARGS="${ARGS:---n 16384 --m 4194304}"

python deploy/make_pyfiles.py

run() { # run <executors>
  local ex="$1"
  if [ -n "${MASTER:-}" ]; then
    spark-submit --master "$MASTER" \
      --num-executors "$ex" --executor-cores 4 --executor-memory 8g \
      --py-files dist/landscape_spark.zip \
      deploy/run_cluster.py --job "$JOB" $ARGS
  else
    # sandbox proxy: executor count -> local core count (see BENCH/BASELINE.md)
    spark-submit --master "local[$ex]" \
      --py-files dist/landscape_spark.zip \
      deploy/run_cluster.py --job "$JOB" $ARGS
  fi
}

echo "== N = $N_EXEC executors ==" >&2
run "$N_EXEC"
echo "== 4N = $((4 * N_EXEC)) executors ==" >&2
run "$((4 * N_EXEC))"
