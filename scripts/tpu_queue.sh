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
# 1. headline FASTQ (driver metric) — two-phase probe + packed walk +
#    pipelined dispatch/count
run bench.py --timed-rounds 8
# 2. stage profile of the new kernel (two-phase probe | packed span | walks)
run scripts/profile_kernel.py
# 3. packed walk A/B against the legacy unpacked abs walk
run bench.py --timed-rounds 6 --walk abs
# 4. paired-end
run bench.py --paired --timed-rounds 6
# 4b. chunk-granularity A/B for the 3-stage pipeline (finer chunks = more
#     overlap; coarser = fewer per-chunk overheads)
run bench.py --timed-rounds 6 --chunk 65536 --depth 5
# 5. BAM pipeline (+ device-batch amortization A/B)
run bench.py --bam --bam-groups 16384
run bench.py --bam --bam-groups 16384 --bam-batch 49152
# 6. multi-library single-pass
run bench.py --libraries 4
echo "==== queue done $(date) ====" >> "$log"
