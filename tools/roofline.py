"""Analytic roofline for the CompositeGenerator on TPU v5e.

Models every conv as an MXU matmul (M = B*H*W, K = Cin*k^2, N = Cout)
with 128x128 tile-padding waste, plus HBM traffic for weights,
activations, and the norm/activation elementwise passes. Per layer the
time bound is max(MXU time of the PADDED matmul, HBM bytes / bandwidth);
layers execute sequentially, so the frame bound is the sum. This is the
"speed-of-light with MXU granularity" bound — real runs add XLA fusion
gaps and (on the tunneled dev chip) per-dispatch RTT, which
tools/mfu_probe.py measures for comparison.

  python tools/roofline.py --height 384 --width 512 --batches 1,4,16,32
"""

from __future__ import annotations

import argparse
import json
import math

V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9
MXU = 128  # systolic array is 128x128
BF16 = 2

# Elementwise/norm HBM passes per conv output: instance-norm reads the
# tensor for stats and again to normalize, writes once; ReLU fuses into
# the normalize pass. ~3 tensor-sized transfers beyond the conv's own
# output write.
NORM_PASSES = 3


def _ceil(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def conv_layer(name, b, h, w, cin, cout, k, stride=1, norm=True,
               m=None, useful_flops=None, extra_bytes=0.0):
    """One conv as an MXU matmul. ``m`` overrides the row count (phase
    window convs run (h+1)(w+1) windows); ``useful_flops`` overrides the
    useful-FLOP count (a phase-expanded kernel holds duplicated/zero taps
    that don't add useful work); ``extra_bytes`` models extra HBM passes
    (depth-to-space materialisation)."""
    ho, wo = h // stride, w // stride
    if m is None:
        m = b * ho * wo
    kk = cin * k * k
    useful = useful_flops if useful_flops is not None else 2.0 * m * kk * cout
    executed = 2.0 * m * _ceil(kk, MXU) * _ceil(cout, MXU)
    bytes_ = (
        kk * cout * BF16                      # weights
        + b * h * w * cin * BF16              # input read
        + m * cout * BF16 * (1 + (NORM_PASSES if norm else 0))
        + extra_bytes
    )
    return {
        "layer": name,
        "shape": f"{b}x{ho}x{wo}x{cout} (k{k})",
        "useful_gf": useful / 1e9,
        "executed_gf": executed / 1e9,
        "mb": bytes_ / 1e6,
        "t_mxu_us": executed / V5E_BF16_PEAK_FLOPS * 1e6,
        "t_hbm_us": bytes_ / V5E_HBM_BYTES_PER_S * 1e6,
    }


def generator_layers(b, h, w, base_ch=64, n_down=3, n_blocks=9,
                     label_ch=9, prev_ch=6, phase_form=False):
    cin = label_ch + prev_ch
    if phase_form:
        # Phase-form stem (round 4b): the 7x7 full-res conv runs as a
        # 4x4 window conv over space_to_depth(input) at half res with
        # 4*base_ch stacked outputs, and the first stride-2 downsample
        # consumes the phase tensor directly (2x2 window, 4*base_ch in)
        # — the [B, H, W, 64] map is never materialised.
        hp, wp = h // 2, w // 2
        useful = 2.0 * b * h * w * (cin * 49) * base_ch
        layers = [conv_layer(
            "stem7x7p", b, hp, wp, 4 * cin, 4 * base_ch, 4,
            m=b * (hp + 1) * (wp + 1), useful_flops=useful,
        )]
        useful0 = 2.0 * b * hp * wp * (base_ch * 9) * (2 * base_ch)
        layers.append(conv_layer(
            "down0p", b, hp, wp, 4 * base_ch, 2 * base_ch, 2,
            m=b * hp * wp, useful_flops=useful0,
        ))
        ch, hh, ww = 2 * base_ch, hp, wp
        down_range = range(1, n_down)
    else:
        layers = [conv_layer("stem7x7", b, h, w, cin, base_ch, 7)]
        ch, hh, ww = base_ch, h, w
        down_range = range(n_down)
    for i in down_range:
        layers.append(conv_layer(f"down{i}", b, hh, ww, ch, 2 * ch, 3, 2))
        ch, hh, ww = 2 * ch, hh // 2, ww // 2
    for i in range(n_blocks):
        layers.append(conv_layer(f"res{i}a", b, hh, ww, ch, ch, 3))
        layers.append(conv_layer(f"res{i}b", b, hh, ww, ch, ch, 3))
    for i in range(n_down):
        if phase_form:
            # ops/phase_conv.py: 2x2 window conv AT the coarse res with
            # 4x stacked phase outputs; useful work == the plain conv's.
            useful = 2.0 * b * (2 * hh) * (2 * ww) * (ch * 9) * (ch // 2)
            last = i == n_down - 1
            layers.append(conv_layer(
                f"up{i}p", b, hh, ww, ch, 4 * (ch // 2), 2,
                m=b * (hh + 1) * (ww + 1), useful_flops=useful,
                # d2s materialisation between stages (skipped before the
                # phase-aware heads on the last stage).
                extra_bytes=0 if last
                else 2.0 * b * 4 * hh * ww * (ch // 2) * BF16,
            ))
        else:
            layers.append(
                conv_layer(f"up{i}", b, 2 * hh, 2 * ww, ch, ch // 2, 3)
            )
        hh, ww = hh * 2, ww * 2
        ch //= 2
    if phase_form:
        hp, wp = h // 2, w // 2
        useful = 2.0 * b * h * w * (ch * 49) * 6
        layers.append(conv_layer(
            "heads7x7p", b, hp, wp, 4 * ch, 24, 4, norm=False,
            m=b * (hp + 1) * (wp + 1), useful_flops=useful,
            extra_bytes=2.0 * b * h * w * 6 * BF16,
        ))
    else:
        layers.append(conv_layer("heads7x7", b, h, w, ch, 6, 7, norm=False))
    return layers


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--batches", default="1,4,16,32")
    p.add_argument("--per-layer", action="store_true")
    p.add_argument("--phase-form", action="store_true",
                   help="model the exact phase-form decoder tail "
                   "(ops/phase_conv.py; generator default since round 4)")
    args = p.parse_args()

    for b in [int(x) for x in args.batches.split(",") if x]:
        layers = generator_layers(
            b, args.height, args.width, phase_form=args.phase_form
        )
        t_us = sum(max(l["t_mxu_us"], l["t_hbm_us"]) for l in layers)
        useful = sum(l["useful_gf"] for l in layers)
        executed = sum(l["executed_gf"] for l in layers)
        ms_frame = t_us / 1e3 / b
        print(
            json.dumps(
                {
                    "batch": b,
                    "ms_per_frame_bound": round(ms_frame, 3),
                    "fps_bound": round(1e3 / ms_frame, 1),
                    "mfu_bound": round(
                        useful / b * 1e9 / (ms_frame / 1e3)
                        / V5E_BF16_PEAK_FLOPS,
                        4,
                    ),
                    "useful_gf_per_frame": round(useful / b, 1),
                    "mxu_pad_waste": round(executed / useful - 1.0, 3),
                }
            )
        )
        if args.per_layer:
            for l in layers:
                bound = "mxu" if l["t_mxu_us"] >= l["t_hbm_us"] else "hbm"
                print(
                    f"  {l['layer']:>10} {l['shape']:>22} "
                    f"useful {l['useful_gf']:7.1f} GF exec "
                    f"{l['executed_gf']:7.1f} GF {l['mb']:7.1f} MB "
                    f"-> {max(l['t_mxu_us'], l['t_hbm_us']):7.1f} us ({bound})"
                )


if __name__ == "__main__":
    main()
