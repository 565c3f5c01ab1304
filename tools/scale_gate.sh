#!/usr/bin/env bash
# Standing 10x distinct-replica oracle gate — ONE command, nonzero exit on
# any hash miss. This is the instrument that caught the q73 supplier-name
# grain bug (the only wrong answer to survive eight rounds of sf0.1
# oracles): replicate the corpus 10x with key-offset replicas and mutated
# documents, replay EVERY registered query through graft.Verify, and
# compare each result to its DuckDB oracle on the same 10x tables.
#
# Usage: tools/scale_gate.sh [SRC_SF_DIR] [N_REPLICAS]
#   SRC_SF_DIR  defaults to /root/testdata/sf0.1
#   N_REPLICAS  defaults to 10
# Env: SCALE_GATE_DIR (work dir, default /tmp/scale_gate),
#      SPARK_GRAFT_CPUS (local[] width, default 32),
#      SPARK_DRIVER_MEM (heap, default 24g).
#
# Run this next to `sbt test` on every round's checklist; record the
# result in docs/SCALE_r{N}.md.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=${1:-/root/testdata/sf0.1}
N=${2:-10}
WORK=${SCALE_GATE_DIR:-/tmp/scale_gate}
DATA="$WORK/data"
OUT="$WORK/out"
CPUS=${SPARK_GRAFT_CPUS:-32}
MEM=${SPARK_DRIVER_MEM:-24g}
CLASSES=target/scala-2.13/classes

echo "[scale_gate] 1/4 compile"
sbt -batch compile >/dev/null

echo "[scale_gate] 2/4 replicate $SRC x$N -> $DATA"
rm -rf "$WORK" && mkdir -p "$DATA"
python3 tools/gen_scale_data.py "$SRC" "$DATA" "$N"

echo "[scale_gate] 3/4 graft.Verify (local[$CPUS], ${MEM} heap) -> $OUT"
# direct java launch (not sbt runMain): no sbt project lock, same flags
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_CPUS=$CPUS java -Xmx"$MEM" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Verify "$DATA" "$OUT" \
  2> "$WORK/verify.stderr" || { tail -30 "$WORK/verify.stderr"; exit 1; }

echo "[scale_gate] 4/4 DuckDB oracle replay"
python3 tools/check_oracle.py "$OUT" "$DATA"
echo "[scale_gate] PASS — every registered query hash-exact at ${N}x"
