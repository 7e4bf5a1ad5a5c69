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
  FILES=$(git diff --name-only "$REF" -- 'src/main/scala/*' | tr '\n' ' ')
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
sbt -batch "runMain graft.Verify $SF_DIR $OUT $FILTER" 2>&1 \
  | grep -E '\[verify\].*failed' && { echo "Verify had failures"; exit 1; } || true

python3 tools/check.py "$OUT" "$SF_DIR" ${ARTIFACT:+"$ARTIFACT"}
