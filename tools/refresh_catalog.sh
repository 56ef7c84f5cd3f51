#!/bin/bash
# One invocation refreshes Verify -> check.py -> README catalog in
# sequence (the verdict's round-script wiring): runs the full local
# correctness gate, dumps a CORRECTNESS-shaped json, and regenerates the
# README query catalog by MERGING the latest committed DRIVER artifact
# (hash-certified labels, always wins) with the fresh local dump (new
# queries appear as "value-green (local, provisional)" until the next
# driver round — tools/check.py records value_match, never hash_match).
#
# Usage: tools/refresh_catalog.sh [sfDir] [verifyOutDir]
set -e
cd "$(git rev-parse --show-toplevel)"
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_catalog_out}
LOCAL=/tmp/correctness_local.json

sbt -batch "runMain graft.Verify $SF $OUT"
# check.py exits non-zero on any FAIL — the README never regenerates
# from a failing local run
python3 tools/check.py "$SF" "$OUT" "$LOCAL"

# sbt prefixes runMain stdout with "[info] " — strip it before the
# tab-separated filter or the catalog comes out empty
sbt -batch "runMain graft.Catalog" | sed 's/^\[info\] //' | grep -P '^\S+\t' > /tmp/catalog.tsv
DRIVER=$(ls CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -1)
if [ -n "$DRIVER" ]; then
  python3 tools/gen_catalog.py /tmp/catalog.tsv "$DRIVER,$LOCAL"
else
  python3 tools/gen_catalog.py /tmp/catalog.tsv "$LOCAL"
fi
echo "README catalog refreshed (driver artifact: ${DRIVER:-none}, local: $LOCAL)"
