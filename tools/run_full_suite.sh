#!/usr/bin/env bash
# Full test suite, sharded one pytest process per test file.
#
# Why: a single-process `pytest tests/` run segfaults reproducibly inside
# XLA:CPU's backend_compile_and_load after ~350 tests (two identical
# crashes at the same collection point on 2026-08-20, 126 GB RAM free —
# cumulative jit-compilation state in one process, not OOM; every test
# involved passes standalone). Sharding per file keeps each process far
# below the crash horizon and loses nothing: test files are independent
# (conftest pins the CPU platform per process).
#
# Usage: tools/run_full_suite.sh [extra pytest args...]
# Runs from the repo root; prints a per-file summary and exits nonzero if
# any file fails.
set -u
cd "$(dirname "$0")/.."
fail=0
summary=()
for f in tests/test_*.py; do
  t0=$(date +%s)
  out=$(python -m pytest "$f" -q "$@" 2>&1)
  rc=$?
  # rc=5 = "no tests collected": with deselection args (e.g. -m 'not slow')
  # an all-slow file legitimately collects nothing — not a failure. With
  # NO extra args it stays a failure: a file collecting nothing in a full
  # run means a collection regression, not deselection.
  if [ $rc -eq 5 ] && [ $# -gt 0 ]; then rc=0; fi
  dt=$(( $(date +%s) - t0 ))
  line=$(echo "$out" | grep -E "passed|failed|error" | tail -1)
  summary+=("$f: rc=$rc ${dt}s  $line")
  echo "$f: rc=$rc ${dt}s  $line"
  if [ $rc -ne 0 ]; then
    fail=1
    echo "$out" | tail -30
  fi
done
echo "==== full-suite summary ===="
printf '%s\n' "${summary[@]}"
exit $fail
