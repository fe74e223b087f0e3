#!/usr/bin/env bash
# Full test suite, fastest layout the box supports:
#   multi-core: ONE pytest-xdist run over all tests, workers = CPUs
#               (--dist loadfile keeps each module's tests on one worker so
#               module-scoped fixtures build once)
#   1-core:     two concurrent lanes (fast / slow) — interleaves Python with
#               XLA-compile waits, still beats serial
#
#   bash exps/test.sh            # full suite
#   bash exps/test.sh fast       # fast lane only (everything not marked slow)
#   bash exps/test.sh slow       # slow lane only (8-virtual-device mesh
#                                # suites, trainer/CLI smokes)
#   VC_TEST_JOBS=4 bash exps/test.sh   # override the worker count
#
# Exit code is non-zero if any test fails. Don't run concurrently with
# bench.py — CPU contention inflates both (verify skill notes).
set -u
cd "$(dirname "$0")/.."

lane="${1:-all}"
jobs="${VC_TEST_JOBS:-$(nproc 2>/dev/null || echo 1)}"
fast_log="$(mktemp /tmp/vc_tests_fast.XXXX.log)"
slow_log="$(mktemp /tmp/vc_tests_slow.XXXX.log)"

xdist_args=()
if [ "$jobs" -gt 1 ]; then
  xdist_args=(-n "$jobs" --dist loadfile)
fi

run_fast() { python -m pytest tests/ -q -m "not slow" "${xdist_args[@]+"${xdist_args[@]}"}" "${@:2}" >"$1" 2>&1; }
run_slow() { python -m pytest tests/ -q -m slow "${xdist_args[@]+"${xdist_args[@]}"}" "${@:2}" >"$1" 2>&1; }
run_all_xdist() { python -m pytest tests/ -q -n "$jobs" --dist loadfile "${@:2}" >"$1" 2>&1; }

start=$(date +%s)
case "$lane" in
  fast) run_fast "$fast_log"; rc_fast=$?; rc_slow=0; slow_log=/dev/null ;;
  slow) run_slow "$slow_log"; rc_slow=$?; rc_fast=0; fast_log=/dev/null ;;
  all)
    if [ "$jobs" -gt 1 ]; then
      run_all_xdist "$fast_log"; rc_fast=$?; rc_slow=0; slow_log=/dev/null
    else
      run_fast "$fast_log" & pid_fast=$!
      run_slow "$slow_log" & pid_slow=$!
      wait "$pid_fast"; rc_fast=$?
      wait "$pid_slow"; rc_slow=$?
    fi
    ;;
  *) echo "usage: $0 [all|fast|slow]" >&2; exit 2 ;;
esac
elapsed=$(( $(date +%s) - start ))

for log in "$fast_log" "$slow_log"; do
  [ "$log" = /dev/null ] && continue
  tail -n 2 "$log"
done
echo "---"
echo "total wall-clock: ${elapsed}s, ${jobs} worker(s) (logs: $fast_log $slow_log)"
rc=$(( rc_fast || rc_slow ))
[ "$rc" -eq 0 ] && echo "ALL GREEN" || echo "FAILURES (fast=$rc_fast slow=$rc_slow)"
exit "$rc"
