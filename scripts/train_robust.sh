#!/usr/bin/env bash
# Flap-robust training driver: run scripts/train.py under a stall watchdog
# and resume bit-exactly from the latest full checkpoint after a hang or
# crash. The TPU tunnel in this environment goes through dead windows of
# minutes to hours (CLAUDE.md); a mid-run flap hangs the attached process
# on a device RPC forever. train.py saves a resumable checkpoint at every
# chunk boundary, so kill-and-resume loses at most one chunk.
#
#   scripts/train_robust.sh [--stall-secs N] [--max-retries N] \
#       -- <train.py args...  (must include --checkpoint-dir and --log-file)>
#
# --full-checkpoints is appended automatically (resume needs resumable
# checkpoints from attempt 0). Stall detection: the --log-file stops
# growing for N seconds. N must exceed the worst-case compile + one chunk
# wall time — the log only advances at update boundaries and tunnel
# compiles run 45-600s (CLAUDE.md) — or a healthy long chunk is killed and
# retried forever; the 1800s default covers 600s compile + a 20-update
# chunk at 4096 envs with wide margin.
set -uo pipefail

STALL_SECS=1800
MAX_RETRIES=8
while [[ "${1:-}" != "--" && $# -gt 0 ]]; do
    case "$1" in
        --stall-secs) STALL_SECS="$2"; shift 2 ;;
        --max-retries) MAX_RETRIES="$2"; shift 2 ;;
        *) echo "unknown arg $1 (expected --stall-secs/--max-retries/--)"
           exit 2 ;;
    esac
done
shift  # the --
ARGS=("$@" --full-checkpoints)

LOG_FILE=""
for ((i = 0; i < ${#ARGS[@]}; i++)); do
    if [[ "${ARGS[$i]}" == "--log-file" ]]; then
        LOG_FILE="${ARGS[$((i + 1))]}"
    fi
done
if [[ -z "$LOG_FILE" ]]; then
    echo "train_robust: --log-file required in train.py args" >&2
    exit 2
fi

attempt=0
resume=()
while (( attempt <= MAX_RETRIES )); do
    python scripts/train.py "${ARGS[@]}" "${resume[@]}" &
    pid=$!
    # watchdog: kill the exact child PID if the log stops advancing
    (
        last=-1; still=0
        while kill -0 "$pid" 2>/dev/null; do
            sleep 30
            size=$(stat -c %s "$LOG_FILE" 2>/dev/null || echo -1)
            if [[ "$size" == "$last" ]]; then
                still=$((still + 30))
                if (( still >= STALL_SECS )); then
                    echo "train_robust: stalled ${STALL_SECS}s, killing $pid"
                    kill "$pid" 2>/dev/null
                    # a process wedged in a blocking device RPC (the exact
                    # failure this script exists for) can ignore SIGTERM —
                    # escalate to SIGKILL after a grace period so the
                    # parent's `wait` is guaranteed to return and the retry
                    # loop actually resumes
                    for _ in $(seq 6); do
                        sleep 5
                        kill -0 "$pid" 2>/dev/null || exit 0
                    done
                    echo "train_robust: $pid ignored SIGTERM, SIGKILL"
                    kill -9 "$pid" 2>/dev/null
                    exit 0
                fi
            else
                still=0; last="$size"
            fi
        done
    ) &
    watchdog=$!
    wait "$pid"; rc=$?
    kill "$watchdog" 2>/dev/null; wait "$watchdog" 2>/dev/null
    if (( rc == 0 )); then
        echo "train_robust: completed after $attempt retries"
        exit 0
    fi
    attempt=$((attempt + 1))
    echo "train_robust: exit $rc, retry $attempt/$MAX_RETRIES (resume)"
    resume=(--resume)
    sleep 60
done
echo "train_robust: giving up after $MAX_RETRIES retries" >&2
exit 1
