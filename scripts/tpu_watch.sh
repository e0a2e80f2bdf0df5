#!/bin/bash
# Probe the axon tunnel once; append result to /tmp/tpu_watch.log
ts=$(date +%H:%M:%S)
out=$(timeout 420 python -c "
import time, jax
jax.config.update('jax_platforms','axon,cpu')
t0=time.time()
d = jax.devices()
import jax.numpy as jnp
v = float(jnp.arange(64).sum())
print('OK %s attach+compute %.1fs' % (d[0].platform, time.time()-t0))
" 2>/dev/null | tail -1)
echo "$ts ${out:-DOWN}" >> /tmp/tpu_watch.log
