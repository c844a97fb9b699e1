#!/usr/bin/env bash
# Fresh-clone CI (round-14, VERDICT r13 ask #8): clone this repo into a
# temp dir and run the full gate THERE — `sbt test`, then the Verify
# dump at sf0.01 and the DuckDB oracle compare. A fixture project that
# is referenced from src/ but not git-tracked (the round-13 defect:
# fixtures/mesh_core et al. swallowed by the fixtures/* gitignore) fails
# this by construction, because the clone only has what git has.
#
# Notes:
#   - Runtime-GENERATED fixture roots (ivf, bm25, media, npo, ...) are
#     marker-guarded and default to absolute /root/repo/fixtures/ paths,
#     so the clone shares the generated data rather than regenerating —
#     the tracked-source coverage is what this script is for
#     (FixtureTrackingSpec guards the same invariant statically).
#   - Expects the driver testdata at /root/testdata/sf0.01 and python3
#     with duckdb (the oracle side), both present in this environment.
#
# Usage: tools/fresh_clone_check.sh   (from anywhere; ~15 min)
set -euo pipefail

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${SF_DIR:-/root/testdata/sf0.01}"
TMP="$(mktemp -d /tmp/graft_fresh_XXXXXX)"
trap 'rm -rf "$TMP"' EXIT

echo "[fresh-clone] cloning $REPO_DIR -> $TMP/repo"
git clone -q "$REPO_DIR" "$TMP/repo"
cd "$TMP/repo"

echo "[fresh-clone] sbt test"
sbt -batch test

echo "[fresh-clone] Verify @ $SF_DIR"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF_DIR $TMP/vout"

echo "[fresh-clone] oracle compare"
python3 tools/compare.py "$TMP/vout" "$SF_DIR"

echo "[fresh-clone] OK"
