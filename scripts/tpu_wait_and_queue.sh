#!/bin/bash
# Wait for the axon tunnel to come back, then run the full TPU measurement
# queue (scripts/tpu_queue.sh). Probes every 10 minutes with a bounded
# attach check; gives up after MAX_HOURS.
# Usage: bash scripts/tpu_wait_and_queue.sh [MAX_HOURS]
set -u
cd "$(dirname "$0")/.."
max_hours=${1:-10}
deadline=$(($(date +%s) + max_hours * 3600))
log=/tmp/tpu_wait.log
echo "==== wait start $(date) (max ${max_hours}h) ====" >> "$log"
while [ "$(date +%s)" -lt "$deadline" ]; do
    out=$(timeout 420 python -c "
import time, jax
jax.config.update('jax_platforms','axon,cpu')
t0=time.time()
d = jax.devices()
import jax.numpy as jnp
v = float(jnp.arange(64).sum())
print('OK %s attach+compute %.1fs' % (d[0].platform, time.time()-t0))
" 2>/dev/null | tail -1)
    echo "$(date +%H:%M:%S) ${out:-DOWN}" >> "$log"
    case "$out" in
        OK\ axon*)
            echo "==== tunnel up, running queue $(date) ====" >> "$log"
            bash scripts/tpu_queue.sh
            echo "==== queue finished $(date) ====" >> "$log"
            exit 0
            ;;
    esac
    sleep 600
done
echo "==== gave up $(date) ====" >> "$log"
exit 1
