#!/usr/bin/env bash
# Dump per-query explain("formatted") into plans/<tag>/<key>_<suffix>.txt
# Usage: scripts/dump_plans.sh <repo_dir> <out_dir> <suffix> <sf_dir> <keys...>
# The repo_dir must be compiled (target/scala-2.13/classes); <suffix> is
# e.g. "before" (r17 worktree) or "after" (HEAD).
set -euo pipefail
REPO="$1"; OUT="$2"; SUF="$3"; SF="$4"; shift 4
mkdir -p "$OUT"
TMP=$(mktemp)
(cd "$REPO" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=48g scripts/run.sh graft.Explain "$@" 2>/dev/null) > "$TMP"
awk -v out="$OUT" -v suf="$SUF" '
  /^===== / { if (f) close(f); key=$2; f=out "/" key "_" suf ".txt"; next }
  f { print > f }
' "$TMP"
rm -f "$TMP"
ls -la "$OUT" | tail -n +2
