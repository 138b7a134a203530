#!/usr/bin/env bash
# Round close-out: refresh EVERY committed verification artifact AFTER the
# last query-code change, in one command (VERDICT r9 item 4 — PLANLINT.json
# missed the final refresh by one commit in r9 because the artifact list
# lived only in convention). Run this as the round's LAST step before the
# final commit; it fails loudly if any stage fails.
#
#   tools/close_out.sh [ROUND]
#
# Stages (order matters — the sweeps are the slowest, the lint the easiest
# to forget):
#   1. full pytest (the gate everything else assumes)
#   2. full oracle sweep at sf0.01  -> VERIFY_sf0.01.json
#   3. full oracle sweep at sf0.1   -> VERIFY_sf0.1.json
#   4. physical-plan lint           -> PLANLINT.json
#   5. bench                        -> prints the headline JSON line AND,
#      with ROUND given, writes BENCH_local_r{ROUND}.json — the
#      committed per-query record the driver's 2000-char stdout tail
#      truncates out of BENCH_r{N}.json (VERDICT r10 item 3)
# After it exits 0, commit the refreshed artifacts together.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:-}"

echo "== [1/5] pytest =="
python -m pytest tests/ -q

echo "== [2/5] full verify sweep @ sf0.01 =="
python tools/verify_local.py /root/testdata/sf0.01

echo "== [3/5] full verify sweep @ sf0.1 =="
python tools/verify_local.py /root/testdata/sf0.1

echo "== [4/5] plan lint =="
python tools/plan_lint.py /root/testdata/sf0.01

echo "== [5/5] bench =="
if [ -n "$ROUND" ]; then
    SPARK_GRAFT_BENCH_OUT="BENCH_local_r${ROUND}.json" python bench.py
else
    python bench.py
fi

echo "close_out: all stages green — commit VERIFY_sf0.01.json, VERIFY_sf0.1.json, PLANLINT.json${ROUND:+, BENCH_local_r${ROUND}.json} now"
