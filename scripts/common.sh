#!/bin/bash
# Shared helpers for the orchestration scripts.
#
# The reference farms scenes across GPUs by polling nvidia-smi
# (`/root/reference/scripts/run_prune_finetune.sh:4-10`). A TPU pod has no
# per-device memory oracle to poll: each host owns its chips and jobs run one
# at a time per host (scene-level parallelism = one scene per host, launched
# by your scheduler of choice). wait_for_slot caps local concurrency instead.

MAX_JOBS="${MAX_JOBS:-1}"

wait_for_slot() {
  while [ "$(jobs -rp | wc -l)" -ge "$MAX_JOBS" ]; do
    sleep 10
  done
}

launch() {
  # launch <logfile> <cmd...>
  local log="$1"; shift
  mkdir -p "$(dirname "$log")"
  echo "launch: $* (log: $log)"
  nohup "$@" > "$log" 2>&1 &
}
