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
# 1. headline FASTQ (driver metric) — async-fetch + phaseA=8 defaults
run bench.py --timed-rounds 8
# 2. from-disk end-to-end FASTQ (VERDICT r3 item 3)
run bench.py --e2e --timed-rounds 6 --verbose
# 3. launch-batch amortization A/B (16384 compiles once into the
#    persistent cache; later runs are cheap)
run bench.py --timed-rounds 6 --launch-batch 16384
# 4. async-fetch off (isolate the dispatch-time copy_to_host_async win)
echo "=== $(date +%H:%M:%S) [NIMBLE_ASYNC_FETCH=0] bench.py --timed-rounds 6" >> "$log"
NIMBLE_ASYNC_FETCH=0 timeout 3000 python bench.py --timed-rounds 6 >> "$log" 2>&1
echo "--- exit $? ---" >> "$log"
# 5. paired-end
run bench.py --paired --timed-rounds 6
# 6. BAM pipeline knobs, one warmup, in-process (cores/gzip/prefetch)
run scripts/ab_bam_knobs.py
# 7. multi-library single-pass
run bench.py --libraries 4
# 8. kernel knob sweep (fences / phase A / walk) on device-resident buffers
run scripts/ab_kernel_knobs.py
echo "==== queue done $(date) ====" >> "$log"
