#!/bin/bash
# Round-4c measurements on the committed phase-stem + lean-scan code:
# re-profile the scan per-op, re-measure batch forwards (space-to-batch
# story changed now that the full-res stem is gone), Jacobi, e2e 512.
cd /root/repo
mkdir -p out
log() { echo "[r4c $(date +%H:%M:%S)] $*"; }

if [ ! -s out/scan_profile_r4c.json ]; then
  log "stage 1: scan per-op profile"
  timeout 3600 python tools/scan_profile.py --out out/scan_profile_r4c.json \
    > out/scan_profile_r4c.log 2>&1
  log "profile: $(head -3 out/scan_profile_r4c.json | tr '\n' ' ')"
fi

if [ ! -s out/mfu_probe_r4c.json ]; then
  log "stage 2: forward B=1,4,32 + scan B=1,4"
  timeout 5400 python tools/mfu_probe.py --batches 1,4,32 --scan-batches 1,4 \
    > out/mfu_probe_r4c.json 2> out/mfu_probe_r4c.err
  log "mfu: $(cat out/mfu_probe_r4c.json | tr '\n' ' ')"
fi

if [ ! -s out/bench_jacobi_r4c.json ]; then
  log "stage 3: jacobi bench"
  timeout 3600 python bench.py --mode jacobi \
    > out/bench_jacobi_r4c.json 2> out/bench_jacobi_r4c.err
  log "jacobi: $(tail -1 out/bench_jacobi_r4c.json)"
fi

if [ ! -s out/bench_e2e512_r4c.json ]; then
  log "stage 4: e2e 512"
  timeout 3600 python bench.py --mode e2e --load-size 512 \
    > out/bench_e2e512_r4c.json 2> out/bench_e2e512_r4c.err
  log "e2e: $(tail -1 out/bench_e2e512_r4c.json)"
fi
log "R4C CHAIN DONE"
