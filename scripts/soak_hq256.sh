#!/bin/bash
# Round-5 celebahq256 long-horizon soak: 2x the prior 20k horizon at
# UNTOUCHED preset defaults (b8 single-chip, textured synthetic).
# Out-dir under /root (survives host restarts; /tmp does not).
set -u
OUT=/root/soak_r5_hq256
mkdir -p "$OUT"
cd /root/repo
PYTHONPATH=/root/repo:/root/.axon_site \
exec python train.py celebahq256 --synthetic textured --batch-size 8 \
  --steps 40000 --out-dir "$OUT" --retries 3 --quiet \
  >> "$OUT/stdout.log" 2>&1
