#!/bin/bash
# Round-4 TPU measurement chain. Runs after the xuesong curriculum chain
# frees the chip: phase-form headline bench, e2e bench, batch-sweep MFU
# probe (+ optimized HLO dumps for the b1-vs-b4 layout diff), Jacobi
# bench, mouth-metric evals of the shipped checkpoints, and a short
# fadg0 --aug-scale-crop finetune with before/after holdout eval.
# Idempotent: every stage is guarded by its output file.
cd /root/repo
mkdir -p out
log() { echo "[r4chain $(date +%H:%M:%S)] $*"; }

# Wait for the xuesong chain (if running) to release the chip.
if [ -f /tmp/xuesong_chain.pid ] && kill -0 "$(cat /tmp/xuesong_chain.pid)" 2>/dev/null; then
  log "waiting for xuesong chain pid $(cat /tmp/xuesong_chain.pid)"
  while kill -0 "$(cat /tmp/xuesong_chain.pid)" 2>/dev/null; do sleep 30; done
fi
log "chip free"

# ---- Stage 1: headline generation bench (phase form) --------------------
if [ ! -s out/bench_r4_gen.json ]; then
  log "stage 1: bench gen"
  timeout 3600 python bench.py > out/bench_r4_gen.json 2> out/bench_r4_gen.err
  log "bench gen: $(tail -1 out/bench_r4_gen.json)"
fi

# ---- Stage 2: e2e 512x512 north star ------------------------------------
if [ ! -s out/bench_e2e512_r4.json ]; then
  log "stage 2: bench e2e 512"
  timeout 3600 python bench.py --mode e2e --load-size 512 \
    > out/bench_e2e512_r4.json 2> out/bench_e2e512_r4.err
  log "bench e2e: $(tail -1 out/bench_e2e512_r4.json)"
fi

# ---- Stage 3: batch-sweep MFU probe + HLO dumps --------------------------
if [ ! -s out/mfu_probe_r4.json ]; then
  log "stage 3: mfu probe (phase form) + HLO"
  timeout 5400 python tools/mfu_probe.py --batches 1,4,16,32 \
    --scan-batches 1,4 --dump-hlo out/hlo_r4 \
    > out/mfu_probe_r4.json 2> out/mfu_probe_r4.err
  log "mfu probe: $(tail -2 out/mfu_probe_r4.json | head -1)"
fi

# ---- Stage 4: Jacobi decode bench ----------------------------------------
if [ ! -s out/bench_jacobi_r4.json ]; then
  log "stage 4: bench jacobi"
  timeout 3600 python bench.py --mode jacobi --sweeps 2 \
    > out/bench_jacobi_r4.json 2> out/bench_jacobi_r4.err
  log "bench jacobi: $(tail -1 out/bench_jacobi_r4.json)"
fi

# ---- Stage 5: mouth-metric evals of shipped checkpoints -------------------
FIMG='/root/reference/*phoneme_data/VidTIMIT/fadg0/images_fadg0'
FKP='/root/reference/*phoneme_data/VidTIMIT/fadg0/keypoints_fadg0'
for row in fadg0:holdout fadg0:train fadg0_recon:holdout; do
  ck="${row%%:*}"; split="${row##*:}"
  o="out/eval_${ck}_${split}_r4.json"
  if [ ! -s "$o" ]; then
    log "stage 5: eval $ck $split"
    timeout 2400 python tools/eval_gan.py --ckpt "checkpoints/$ck" \
      --images "$FIMG" --keypoints "$FKP" --width 512 --height 384 \
      --split "$split" > "$o" 2> "${o%.json}.err"
    log "eval $ck $split: $(cat "$o")"
  fi
done
HIMG=checkpoints/henan_synth_frames
HKP='/root/reference/*pinyin_data/henan/keypoints_henan'
for row in henan_512:holdout henan_512_recon:holdout; do
  ck="${row%%:*}"; split="${row##*:}"
  o="out/eval_${ck}_${split}_r4.json"
  if [ ! -s "$o" ]; then
    log "stage 5: eval $ck $split"
    timeout 2400 python tools/eval_gan.py --ckpt "checkpoints/$ck" \
      --images "$HIMG" --keypoints "$HKP" --width 896 --height 512 \
      --source-width 1920 --source-height 1080 --split "$split" \
      > "$o" 2> "${o%.json}.err"
    log "eval $ck $split: $(cat "$o")"
  fi
done

# ---- Stage 6: fadg0 scale-crop finetune + holdout eval --------------------
if [ ! -d checkpoints/fadg0_sc ]; then
  log "stage 6: fadg0 +aug-scale-crop finetune (400 adv steps)"
  cp -r checkpoints/fadg0 checkpoints/fadg0_sc
  rm -f checkpoints/fadg0_sc/train_*.log
fi
# --steps counts THIS invocation's steps (resume continues the count):
# 400 more adversarial steps on top of the step-3500 fadg0 checkpoint.
if ! ls checkpoints/fadg0_sc/step_00003900 >/dev/null 2>&1; then
  while true; do
    python -u -m text2video_tpu.cli train-gan \
      --images "$FIMG" --keypoints "$FKP" \
      --ckpt checkpoints/fadg0_sc --width 512 --height 384 \
      --device-data --aug-scale-crop --lambda-adv 0.5 --d-lr-scale 0.25 \
      --lr 1e-4 --steps 400 --batch-size 4 --clip-len 6 \
      --sample-every 100 --stall-timeout 1200 \
      >> checkpoints/fadg0_sc/train_sc.log 2>&1
    rc=$?
    log "fadg0_sc finetune exited rc=$rc"
    [ $rc -ne 3 ] && break
    log "watchdog resume..."
  done
fi
o=out/eval_fadg0_sc_holdout_r4.json
if [ ! -s "$o" ]; then
  log "stage 6: eval fadg0_sc holdout"
  timeout 2400 python tools/eval_gan.py --ckpt checkpoints/fadg0_sc \
    --images "$FIMG" --keypoints "$FKP" --width 512 --height 384 \
    --split holdout > "$o" 2> "${o%.json}.err"
  log "eval fadg0_sc holdout: $(cat "$o")"
fi
log "R4 CHAIN DONE"
