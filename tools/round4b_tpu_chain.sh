#!/bin/bash
# Round-4 follow-up measurements, queued behind round4_tpu_chain.sh:
# e2e with the slimmer wire defaults, forward ablations (warp / norm /
# phase attribution for the HBM-bound gap), and a scan chunk-size sweep.
cd /root/repo
mkdir -p out
log() { echo "[r4b $(date +%H:%M:%S)] $*"; }

if [ -f /tmp/r4_chain.pid ] && kill -0 "$(cat /tmp/r4_chain.pid)" 2>/dev/null; then
  log "waiting for r4 chain pid $(cat /tmp/r4_chain.pid)"
  while kill -0 "$(cat /tmp/r4_chain.pid)" 2>/dev/null; do sleep 30; done
fi
log "chip free"

if [ ! -s out/bench_e2e512_r4b.json ]; then
  log "stage 1: e2e 512 with wire 12/6@75"
  timeout 3600 python bench.py --mode e2e --load-size 512 \
    > out/bench_e2e512_r4b.json 2> out/bench_e2e512_r4b.err
  log "e2e: $(tail -1 out/bench_e2e512_r4b.json)"
fi

if [ ! -s out/ablation_r4.json ]; then
  log "stage 2: forward ablations"
  timeout 5400 python tools/fwd_ablation_probe.py --batches 1,4 \
    > out/ablation_r4.json 2> out/ablation_r4.err
  log "ablations: $(cat out/ablation_r4.json | tr '\n' ' ')"
fi

for ck in 64 128; do
  if [ ! -s out/scan_chunk${ck}.json ]; then
    log "stage 3: scan chunk $ck"
    timeout 2400 python tools/mfu_probe.py --batches "" --scan-batches 1 \
      --chunk $ck > out/scan_chunk${ck}.json 2> out/scan_chunk${ck}.err
    log "chunk $ck: $(cat out/scan_chunk${ck}.json | tr '\n' ' ')"
  fi
done
log "R4B CHAIN DONE"
