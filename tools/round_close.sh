#!/usr/bin/env bash
# Round-close gate runner + SURVEY header regeneration — ONE command so the
# §2.0 header counts can never drift from the measured gates again (they
# drifted in r12 AND r13; r13 verdict #8 asked for exactly this script).
#
# Usage: tools/round_close.sh ROUND_N [--skip-scale-gate]
# Does, in order:
#   1. sbt -batch test                     → suite/test counts (must be green)
#   2. sbt runMain graft.Explain           → docs/plans_r{N}.txt (+ query count)
#   3. tools/scale_gate.sh                 → 10x-replica oracle gate (skippable)
#   4. rewrite SURVEY.md's §2.0 header     → round, query count, suites, tests
# Nonzero exit on any red gate; the SURVEY rewrite only happens after all
# gates pass, so the header always states numbers that were actually measured.
set -euo pipefail
cd "$(dirname "$0")/.."

N=${1:?usage: tools/round_close.sh ROUND_N [--skip-scale-gate]}
SKIP_SCALE=${2:-}

echo "[round_close] 1/4 sbt -batch test"
TEST_LOG=$(mktemp)
sbt -batch test 2>&1 | tee "$TEST_LOG" | grep -a --line-buffered "Tests:\|Suites:\|error\]" | tail -20
SUITES=$(grep -a "Suites: completed" "$TEST_LOG" | tail -1 | sed -E 's/.*completed ([0-9]+),.*/\1/')
TESTS=$(grep -a "Tests: succeeded" "$TEST_LOG" | tail -1 | sed -E 's/.*succeeded ([0-9]+),.*/\1/')
FAILED=$(grep -a "Tests: succeeded" "$TEST_LOG" | tail -1 | sed -E 's/.*failed ([0-9]+),.*/\1/')
if [ "${FAILED:-1}" != "0" ]; then echo "[round_close] TESTS RED ($FAILED failed)"; exit 1; fi
echo "[round_close] tests green: $SUITES suites, $TESTS tests"

echo "[round_close] 2/4 plan dump -> docs/plans_r${N}.txt"
sbt -batch "runMain graft.Explain /root/testdata/sf0.001 docs/plans_r${N}.txt" >/dev/null
QUERIES=$(grep -c "^================ " "docs/plans_r${N}.txt")
if grep -q "ERROR:" "docs/plans_r${N}.txt"; then
  echo "[round_close] plan dump contains failed explains"; exit 1
fi
echo "[round_close] $QUERIES registered queries, all plans explain clean"

if [ "$SKIP_SCALE" != "--skip-scale-gate" ]; then
  echo "[round_close] 3/4 scale gate (10x replicas)"
  tools/scale_gate.sh
else
  # the header's "N/N oracle queries hash-match" claim is MEASURED by the
  # scale gate; without it the rewrite would re-introduce the
  # claimed-vs-measured drift this script exists to prevent
  echo "[round_close] 3/4 scale gate SKIPPED by flag — header NOT rewritten"
  echo "[round_close] (re-run without --skip-scale-gate to stamp SURVEY)"
  exit 0
fi

echo "[round_close] 4/4 regenerate SURVEY §2.0 header"
python3 - "$N" "$QUERIES" "$SUITES" "$TESTS" <<'EOF'
import re, sys
n, queries, suites, tests = sys.argv[1:5]
s = open('SURVEY.md').read()
s, c1 = re.subn(r'### 2\.0 Implementation status \(round \d+\)',
                f'### 2.0 Implementation status (round {n})', s)
s, c2 = re.subn(r'\(\d+/\d+ oracle queries hash-match as of round \d+',
                f'({queries}/{queries} oracle queries hash-match as of round {n}', s)
s, c3 = re.subn(r'specs = ScalaTest \(\d+ suites, \d+\+? tests\)',
                f'specs = ScalaTest ({suites} suites, {tests} tests)', s)
assert c1 == 1 and c2 == 1 and c3 == 1, (c1, c2, c3)
open('SURVEY.md', 'w').write(s)
print(f'[round_close] SURVEY header: round {n}, {queries} queries, {suites} suites, {tests} tests')
EOF
echo "[round_close] ALL GATES GREEN"
