#!/usr/bin/env bash
# Parallel test runner: the full suite serially is ~19 min (each test
# pays Spark job latency; pytest-xdist is not available in this
# environment). This splits the modules into three duration-balanced
# groups and runs them as three concurrent pytest processes (three
# JVMs, local[4] each — fits comfortably in 32 cores). Each process
# gets its own warehouse dir (conftest keys it by pid), so the groups
# are fully isolated.
#
# Usage: tools/fast_suite.sh [extra pytest args...]
# Exit code: non-zero if ANY group fails. Logs in /tmp/fast_suite_*.log
set -u
cd "$(dirname "$0")/.."

# Groups balanced by measured cost (r3 measurements: datapipe+properties
# 4:22; operators+forecast 1:48; the old combined tail group 9:07 —
# split so streaming's waits and the dual-leg functions module no
# longer serialize behind each other).
G1="tests/test_datapipe.py tests/test_properties.py"
G2="tests/test_operators.py tests/test_forecast.py tests/test_dsv2.py tests/test_prophet_optional.py tests/test_codecs.py tests/test_codec_optional.py tests/test_round9_ops.py"
G3="tests/test_streaming.py tests/test_round5_ops.py tests/test_round6_ops.py tests/test_round7_ops.py tests/test_round8_ops.py tests/test_round10_ops.py"
G4="tests/test_pointer_audit.py tests/test_round4_ops.py tests/test_frequency.py tests/test_functions.py tests/test_connectors.py tests/test_google_auth.py tests/test_sources.py tests/test_sinks.py tests/test_core.py"

# Completeness guard: a new tests/test_*.py module not yet assigned to
# a group must fail the run, not silently skip.
for f in tests/test_*.py; do
  case " $G1 $G2 $G3 $G4 " in
    *" $f "*) ;;
    *) echo "ERROR: $f is not assigned to any fast_suite group"; exit 2 ;;
  esac
done

pids=()
rc=0
i=0
for g in "$G1" "$G2" "$G3" "$G4"; do
  i=$((i + 1))
  # shellcheck disable=SC2086
  python -m pytest $g -q "$@" > "/tmp/fast_suite_$i.log" 2>&1 &
  pids+=($!)
done
for idx in "${!pids[@]}"; do
  if ! wait "${pids[$idx]}"; then
    rc=1
    echo "GROUP $((idx + 1)) FAILED:"
    tail -20 "/tmp/fast_suite_$((idx + 1)).log"
  fi
done
for i in 1 2 3 4; do
  tail -1 "/tmp/fast_suite_$i.log"
done
exit $rc
