#!/bin/bash
# Round-3 heavy burst: compile, full specs, Verify at both SFs, oracle
# check, bench refresh — batched so CPU-noise lands in one window instead
# of contaminating scaling pairs one at a time.
set -e -o pipefail
cd /root/repo
echo "=== sbt compile + test ==="
sbt -batch compile 2>&1 | tail -3
sbt -batch test 2>&1 | tail -6
echo "=== Verify sf0.001 ==="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_r3d_001" 2>&1 | tail -2
echo "=== Verify sf0.01 ==="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r3d_01" 2>&1 | tail -2
echo "=== oracle check sf0.001 ==="
python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/verify_r3d_001
echo "=== oracle check sf0.01 ==="
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_r3d_01
echo "=== ALL GREEN ==="
