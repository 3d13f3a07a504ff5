#!/bin/bash
# Controlled same-box A/B of the r7 seal vs the current build (r8 verdict
# items 3+4): interleaved bench runs in one session, then one deliberately
# CPU-loaded run of the CURRENT build to refit the calnorm sensitivity on
# the current headline set.
set -u
OUT=/root/repo/.worktrees/ab_out
mkdir -p "$OUT"
run() { # $1=dir $2=tag
  ( cd "$1" && SPARK_GRAFT_BENCH_PASSES=3 timeout 900 python bench.py 2>"$OUT/$2.err" | tail -1 > "$OUT/$2.json" )
  echo "done $2 rc=$?"
}
run /root/repo/.worktrees/r7seal r7_a
run /root/repo            cur_a
run /root/repo/.worktrees/r7seal r7_b
run /root/repo            cur_b
# loaded companion: 10 busy loops while the current build benches
for i in $(seq 10); do python -c 'while True: pass' & done
LOADPIDS=$(jobs -p)
run /root/repo cur_loaded
kill $LOADPIDS 2>/dev/null
echo ALL_DONE
