#!/bin/bash
# Fast commit lane (< 5 min wall): the "not slow" suite split into two
# pytest shards that run CONCURRENTLY, each with its own local[8] Spark
# session (pytest-xdist is not available in this container; two plain
# processes on a 32-cpu box achieve the same wall-time halving).
#
#   shard A: the differential-oracle suite (tests/test_oracle.py)
#   shard B: everything else
#
# Exit status is non-zero if either shard fails. The FULL suite
# (including -m slow: global plan sweep, multi-batch streaming,
# property suites, scale guards) remains `python -m pytest tests/ -q`
# and runs at CI cadence / before round submission.
set -u
cd "$(dirname "$0")/.."
python -m pytest tests/test_oracle.py -q -m "not slow" -p no:cacheprovider > /tmp/fastlane_a.log 2>&1 &
A=$!
python -m pytest tests/ -q -m "not slow" -p no:cacheprovider --ignore=tests/test_oracle.py > /tmp/fastlane_b.log 2>&1 &
B=$!
wait $A; RA=$?
wait $B; RB=$?
tail -1 /tmp/fastlane_a.log
tail -1 /tmp/fastlane_b.log
exit $(( RA != 0 || RB != 0 ))
