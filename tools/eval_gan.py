#!/usr/bin/env python3
"""Objective GAN evaluation: PSNR/SSIM of generated vs ground-truth frames.

The reference's only quality evidence is a user study (SURVEY.md §6).
This tool gives a reproducible proxy: render clips from their pose labels
with the trained generator and compare to the real frames.

Usage:
  python tools/eval_gan.py --ckpt checkpoints/fadg0_512 \
      --images ".../images_fadg0" --keypoints ".../keypoints_fadg0" \
      [--clips 4] [--clip-len 16]
Prints one JSON line {"psnr_db", "ssim", "clips", "frames"}.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def _ssim(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    return ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--keypoints", required=True)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--source-width", type=int, default=None,
                   help="resolution the keypoints were annotated at "
                   "(e.g. 1280x720 for a 896x512 eval)")
    p.add_argument("--source-height", type=int, default=None)
    p.add_argument("--clips", type=int, default=4)
    p.add_argument("--clip-len", type=int, default=16)
    args = p.parse_args()

    from text2video_tpu.config import PersonProfile
    from text2video_tpu.train.checkpoints import load_renderer
    from text2video_tpu.train.data import PoseClipDataset

    dataset = PoseClipDataset(
        images_dir=args.images,
        keypoints_dir=args.keypoints,
        canvas=(args.width, args.height),
        source_canvas=(
            (args.source_width, args.source_height)
            if args.source_width
            else None
        ),
        clip_len=args.clip_len,
        cache_labels=False,
    )
    profile = PersonProfile(
        name="eval", language="en", canvas=(args.width, args.height),
        dict_path="", keypoints_dir="", keypoint_layout="clip",
    )
    renderer = load_renderer(args.ckpt, profile)
    renderer.time_bucket = args.clip_len

    rng = np.random.RandomState(7)
    psnrs, ssims, n_frames = [], [], 0
    for _ in range(args.clips):
        labels, reals, _ = dataset.sample_clip(rng)
        fakes = renderer.render(labels)
        for t in range(labels.shape[0]):
            mse = np.mean(
                (fakes[t].astype(np.float64) - reals[t].astype(np.float64))
                ** 2
            )
            psnrs.append(10 * np.log10(255.0**2 / max(mse, 1e-9)))
            ssims.append(_ssim(fakes[t], reals[t]))
            n_frames += 1

    print(
        json.dumps(
            {
                "psnr_db": round(float(np.mean(psnrs)), 2),
                "ssim": round(float(np.mean(ssims)), 4),
                "clips": args.clips,
                "frames": n_frames,
            }
        )
    )


if __name__ == "__main__":
    main()
