#!/bin/bash
# Run the full TPU measurement queue unattended once the axon tunnel is up.
# Each bench prints ONE JSON line; everything lands in /tmp/tpu_queue.log.
# Usage: bash scripts/tpu_queue.sh  (expects to run from the repo root)
set -u
cd "$(dirname "$0")/.."
log=/tmp/tpu_queue.log
run() {
    echo "=== $(date +%H:%M:%S) $*" >> "$log"
    timeout 3000 python "$@" >> "$log" 2>&1
    echo "--- exit $? ---" >> "$log"
}
echo "==== queue start $(date) ====" >> "$log"
# 1. headline FASTQ (driver metric)
run bench.py --timed-rounds 8
# 2. fused Pallas walk A/B against the XLA scan
run bench.py --timed-rounds 6 --walk fused
# 3. paired-end (stacked R1+R2 transactions — expect ~2x vs r2's 415k)
run bench.py --paired --timed-rounds 6
# 4. BAM pipeline (pooled producer buffers — was producer-bound at 117k)
run bench.py --bam --bam-groups 16384
run bench.py --bam --bam-groups 65536
# 5. multi-library single-pass
run bench.py --libraries 4
echo "==== queue done $(date) ====" >> "$log"
