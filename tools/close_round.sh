#!/bin/bash
# Scripted round close (r16 VERDICT #4): the two quiet full sweeps,
# the prior ratchet merge, and the correctness self-check were three
# manual steps with a manual paste between them — this runs them as
# ONE invocation and refuses to touch the priors if the box never
# goes quiet.
#
#   tools/close_round.sh <round-label> [workdir=/tmp/close_<label>]
#
# Steps:
#   1. QUIET GATE: run a full Bench sweep at local[32]/sf0.1; accept
#      it only if its comparator pair reads quiet (both <= 1.3x the
#      0.35 CPU prior) AND it reports regressions {}. Up to
#      MAX_ATTEMPTS sweeps, 60 s apart; two accepted sweeps required.
#      Never quiet => exit 1, nothing modified.
#   2. RATCHET: tools/regen_priors.py over the two accepted sweeps
#      (min(carried, regenerated) merge) spliced between the
#      PRIORS_BEGIN/PRIORS_END markers in Bench.scala; sbt compile
#      must stay green or the splice is reverted.
#   3. SELF-CHECK: graft.Verify at sf0.01 + tools/check.py
#      --self-json CORRECTNESS_SELF.json; any bad query => exit 1
#      (priors splice kept — correctness failures need a human).
#   4. COMMIT: the priors diff + CORRECTNESS_SELF.json, with the
#      sweep totals/comparators in the message.
set -euo pipefail
cd "$(dirname "$0")/.."

LABEL="${1:?usage: close_round.sh <round-label> [workdir]}"
WORK="${2:-/tmp/close_${LABEL}}"
MAX_ATTEMPTS=4
QUIET_MAX=0.46   # 1.3 x the 0.35 quiet CPU-comparator prior
mkdir -p "$WORK"

sweep_quiet() { # $1 = artifact path; exit 0 iff quiet + regressions {}
  python3 - "$1" <<'PY'
import json, sys
d = json.loads(open(sys.argv[1]).readline())
comp = d.get("comparator", [99, 99])
quiet = max(comp) <= 0.46
clean = d.get("regressions", {"x": 1}) == {}
print(f"  comparator={comp} quiet={quiet} regressions={d.get('regressions')}",
      file=sys.stderr)
sys.exit(0 if quiet and clean else 1)
PY
}

echo "== close_round $LABEL: building"
sbt -batch compile > "$WORK/compile.log" 2>&1

accepted=()
attempt=0
while [ "${#accepted[@]}" -lt 2 ] && [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  attempt=$((attempt + 1))
  out="$WORK/sweep$attempt.json"
  echo "== sweep attempt $attempt -> $out"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="$out" \
    sbt -batch "runMain graft.Bench" > "$WORK/sweep$attempt.log" 2>&1 || {
      echo "!! sweep $attempt crashed (see $WORK/sweep$attempt.log)"; exit 1; }
  if sweep_quiet "$out"; then
    accepted+=("$out")
    echo "   accepted (${#accepted[@]}/2)"
  else
    echo "   rejected (loaded box or non-empty regressions); waiting 60s"
    sleep 60
  fi
done
if [ "${#accepted[@]}" -lt 2 ]; then
  echo "!! box never produced two quiet sweeps in $MAX_ATTEMPTS attempts — refusing to ratchet priors"
  exit 1
fi

echo "== ratchet merge over: ${accepted[*]}"
python3 tools/regen_priors.py "${accepted[@]}" > "$WORK/priors.txt" \
  2> "$WORK/priors_summary.txt"
cat "$WORK/priors_summary.txt"

BENCH=src/main/scala/graft/Bench.scala
cp "$BENCH" "$WORK/Bench.scala.bak"
python3 - "$BENCH" "$WORK/priors.txt" <<'PY'
import sys
bench, priors = sys.argv[1], sys.argv[2]
src = open(bench).read()
body = open(priors).read().rstrip("\n")
b = src.index("// PRIORS_BEGIN")
b = src.index("recorded cause", b)   # last line of the marker comment
b = src.index("\n", b) + 1           # first entry line
e = src.index("    // PRIORS_END")
open(bench, "w").write(src[:b] + body + "\n" + src[e:])
PY
if ! sbt -batch compile > "$WORK/compile2.log" 2>&1; then
  cp "$WORK/Bench.scala.bak" "$BENCH"
  echo "!! spliced priors failed to compile — reverted (see $WORK/compile2.log)"
  exit 1
fi
echo "== priors spliced; diff:"
git diff --stat -- "$BENCH"

echo "== correctness self-check (sf0.01)"
rm -rf "$WORK/verify_out"
SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 $WORK/verify_out" \
  > "$WORK/verify.log" 2>&1
python3 tools/check.py --self-json CORRECTNESS_SELF.json \
  "$WORK/verify_out" /root/testdata/sf0.01 | tail -3

summary=$(python3 - "${accepted[@]}" <<'PY'
import json, sys
rows = []
for p in sys.argv[1:]:
    d = json.loads(open(p).readline())
    rows.append(f"{d['value']}s/{len(d['queries'])}q comp {d['comparator']}")
print("; ".join(rows))
PY
)
git add "$BENCH" CORRECTNESS_SELF.json
git commit -m "Round $LABEL close: scripted prior ratchet + self-check

Two quiet sweeps accepted by tools/close_round.sh ($summary);
priors merged with min(carried, regenerated); correctness
self-check artifact regenerated at sf0.01."
echo "== close_round $LABEL done"
