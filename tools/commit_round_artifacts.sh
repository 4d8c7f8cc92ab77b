#!/bin/sh
# Round-close hygiene (VERDICT r10 item 5): commit the driver/bench
# artifacts for round N together so cross-round history analysis never
# depends on the working tree.  Default N = highest BENCH_r*.json
# present.  Safe to re-run: commits only when something is staged.
set -e
cd "$(dirname "$0")/.."
N=${1:-$(ls BENCH_r*.json 2>/dev/null | sed 's/[^0-9]*//g' | sort -n | tail -1)}
[ -n "$N" ] || { echo "no BENCH_r*.json found"; exit 1; }
FILES=""
for f in "BENCH_r${N}.json" "CORRECTNESS_r${N}.json" "BENCH_DETAIL_r${N}.json"; do
    [ -f "$f" ] && git add "$f" && FILES="$FILES $f"
done
# gate AND commit on the artifact paths only: unrelated staged work
# must never be swept into the artifacts commit (r11 review finding)
if [ -z "$FILES" ] || git diff --cached --quiet -- $FILES; then
    echo "round ${N}: artifacts already committed"
else
    git commit -m "round ${N}: commit bench/correctness artifacts" -- $FILES
fi
