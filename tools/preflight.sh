#!/bin/sh
# Pre-snapshot regression gate: a compile error in main OR test code
# zeroes an entire round (round 6 lost all 144 correctness rows to one
# duplicate helper method). Run this before every end-of-round commit;
# it is deliberately cheap (~15 s warm) so there is never a reason to
# skip it. Exits non-zero on any compile failure.
set -e
cd "$(dirname "$0")/.."
sbt -batch "Test/compile"
echo "preflight OK: main + test sources compile"
