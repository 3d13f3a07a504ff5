#!/bin/bash
# calnorm sensitivity refit on the CURRENT build (r8 verdict item 4):
# one quiet run + two deliberately loaded runs (16 and 32 GIL busy loops)
# at 6 passes each, same session, same box.
set -u
OUT=/root/repo/.worktrees/ab_out
run() { # $1=tag
  ( SPARK_GRAFT_BENCH_PASSES=6 timeout 1200 python bench.py 2>"$OUT/$1.err" | tail -1 > "$OUT/$1.json" )
  echo "done $1 rc=$?"
}
run refit_quiet
for i in $(seq 16); do timeout 600 python -c 'while True: pass' & done
run refit_load16
for i in $(seq 16); do timeout 600 python -c 'while True: pass' & done
run refit_load32
kill $(jobs -p) 2>/dev/null
echo ALL_DONE
