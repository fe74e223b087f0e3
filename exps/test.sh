#!/usr/bin/env bash
# Full test suite in two concurrent shards (~half the serial wall-clock):
#   shard 1: the fast lane (everything not marked slow)
#   shard 2: the slow lane (8-virtual-device mesh suites, trainer/CLI smokes)
#
#   bash exps/test.sh            # full suite, two shards
#   bash exps/test.sh fast       # fast lane only (< 5 min)
#   bash exps/test.sh slow       # slow lane only
#
# Exit code is non-zero if either shard fails. Don't run concurrently with
# bench.py — CPU contention inflates both (verify skill notes).
set -u
cd "$(dirname "$0")/.."

lane="${1:-all}"
fast_log="$(mktemp /tmp/vc_tests_fast.XXXX.log)"
slow_log="$(mktemp /tmp/vc_tests_slow.XXXX.log)"

run_fast() { python -m pytest tests/ -q -m "not slow" "${@:2}" >"$1" 2>&1; }
run_slow() { python -m pytest tests/ -q -m slow "${@:2}" >"$1" 2>&1; }

start=$(date +%s)
case "$lane" in
  fast) run_fast "$fast_log"; rc_fast=$?; rc_slow=0; slow_log=/dev/null ;;
  slow) run_slow "$slow_log"; rc_slow=$?; rc_fast=0; fast_log=/dev/null ;;
  all)
    run_fast "$fast_log" & pid_fast=$!
    run_slow "$slow_log" & pid_slow=$!
    wait "$pid_fast"; rc_fast=$?
    wait "$pid_slow"; rc_slow=$?
    ;;
  *) echo "usage: $0 [all|fast|slow]" >&2; exit 2 ;;
esac
elapsed=$(( $(date +%s) - start ))

for log in "$fast_log" "$slow_log"; do
  [ "$log" = /dev/null ] && continue
  tail -n 2 "$log"
done
echo "---"
echo "total wall-clock: ${elapsed}s (logs: $fast_log $slow_log)"
rc=$(( rc_fast || rc_slow ))
[ "$rc" -eq 0 ] && echo "ALL SHARDS GREEN" || echo "FAILURES (fast=$rc_fast slow=$rc_slow)"
exit "$rc"
