#!/bin/bash
# Targeted correctness sweep (r11 verdict task 5): re-verify only the
# queries affected by source changes since a git ref, instead of the
# full ~200-query board (~45 min of DuckDB replay at sf10).
#
# Usage: tools/verify_touched.sh <sf_dir> [git_ref] [artifact.json]
#   sf_dir    testdata dir (e.g. /root/testdata/sf0.01 or a ScaleGen dir)
#   git_ref   diff base (default: HEAD — i.e. uncommitted changes)
#   artifact  optional CORRECTNESS-shaped JSON output; partial boards
#             carry provenance (_meta.partial + the checked list)
#
# The file->query mapping (graft.TouchedQueries) is fail-safe: shared
# infrastructure changes force the full board ("ALL"); only edits
# provably confined to operator modules narrow it. Full board on
# demand: tools/verify_touched.sh <sf_dir> --all [artifact]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=$1
REF=${2:-HEAD}
ARTIFACT=${3:-}
OUT=/tmp/vout_touched

if [ "$REF" = "--all" ]; then
  LIST=ALL
else
  # build.sbt/project/ are in the pathspec ON PURPOSE: a dependency bump
  # can change query results without touching src/main — TouchedQueries
  # classifies them ALL (full board), never inert
  FILES=$(git diff --name-only "$REF" -- 'src/main/scala/*' build.sbt 'project/*' | tr '\n' ' ')
  LIST=$(sbt -batch -error "runMain graft.TouchedQueries $FILES" 2>&1 \
    | sed -n 's/^.*TOUCHED://p' | tail -1 | tr -d '[:space:]')
  [ -n "$LIST" ] || { echo "TouchedQueries produced no list"; exit 1; }
fi

case "$LIST" in
  NONE) echo "no query-bearing changes vs $REF; nothing to verify"; exit 0 ;;
  ALL)  echo "shared infra changed (or --all): full board"
        FILTER="" ;;
  *)    echo "targeted queries: $LIST"
        FILTER="$LIST" ;;
esac

rm -rf "$OUT"
# tee the full sbt output to a log and gate on BOTH signals: sbt's own
# exit status (an sbt crash prints no '[verify]…failed' line — the grep
# alone would swallow it under pipefail's `|| true`) and the per-query
# failure lines
VLOG=/tmp/verify_touched_sbt.log
set +e   # capture the pipeline status ourselves (|| true would reset PIPESTATUS)
sbt -batch "runMain graft.Verify $SF_DIR $OUT $FILTER" 2>&1 | tee "$VLOG"
SBT_STATUS=${PIPESTATUS[0]}
set -e
if [ "$SBT_STATUS" -ne 0 ]; then
  echo "sbt Verify exited nonzero ($SBT_STATUS; full log: $VLOG)"; exit 1
fi
if grep -qE '\[verify\].*failed' "$VLOG"; then
  echo "Verify had failures"; exit 1
fi

python3 tools/check.py "$OUT" "$SF_DIR" ${ARTIFACT:+"$ARTIFACT"}
