#!/bin/bash
# Serial TPU-tunnel probe: one bounded attempt at a time, until a real
# dispatch completes.  Writes a timestamped log; exits 0 on success.
# (Session-2 recovery pattern; killed parallel probes can worsen the wedge,
# so strictly serial with a cool-down.)
LOG=${1:-/root/tunnel_probe.log}
while true; do
  echo "$(date +%H:%M:%S) probe start" >> "$LOG"
  timeout 240 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import time; t0=time.time()
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128,128)); y = float(jax.device_get((x@x).sum()))
print(f'OK devices={d} val={y} {time.time()-t0:.1f}s')
" >> "$LOG" 2>&1
  if [ $? -eq 0 ]; then echo "$(date +%H:%M:%S) TUNNEL CLEAR" >> "$LOG"; exit 0; fi
  echo "$(date +%H:%M:%S) probe failed; cooling down 180s" >> "$LOG"
  sleep 180
done
