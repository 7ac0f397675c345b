#!/usr/bin/env python
"""Summarize a learning-demo run's metrics.jsonl (VERDICT r2 next #4).

Prints the across-epoch loss trend and the interleaved-inference metric
trend (the reference's every-50-epoch inference, train.py:264-266) as a
compact table for ROUND3_NOTES / FIT_LOG.

Usage: python scripts/summarize_learning_demo.py runs/learning_demo
"""

import json
import sys


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "runs/learning_demo"
    rows = [json.loads(l) for l in open(f"{workdir}/metrics.jsonl")]
    train = [r for r in rows if "train_loss" in r]
    inf = [r for r in rows if r.get("kind") == "inference"]

    print(f"{len(train)} train epochs, {len(inf)} inference interleaves")
    print("\nepoch  train_loss  sd_loss   nerf_loss  val_loss")
    picks = sorted({0, len(train) - 1,
                    *range(0, len(train), max(1, len(train) // 8))})
    for i in picks:
        r = train[i]
        print(f"{r['epoch']:5d}  {r['train_loss']:10.4f}  "
              f"{r['train_sd_loss']:8.4f}  {r['train_nerf_loss']:9.5f}  "
              f"{r['val_loss']:8.4f}")

    if inf:
        print("\nepoch  inf_psnr  inf_latent_psnr  inf_ssim  inf_l2")
        for r in inf:
            print(f"{r['epoch']:5d}  {r['inference_psnr']:8.2f}  "
                  f"{r['inference_latent_psnr']:15.2f}  "
                  f"{r['inference_ssim']:8.3f}  "
                  f"{r['inference_l2_loss']:6.4f}")

    def delta(key, rows_):
        return rows_[-1][key] - rows_[0][key] if len(rows_) > 1 else 0.0

    print("\ndeltas first→last:")
    print(f"  train_loss {delta('train_loss', train):+.4f}  "
          f"sd {delta('train_sd_loss', train):+.4f}  "
          f"nerf {delta('train_nerf_loss', train):+.5f}")
    if len(inf) > 1:
        print(f"  inference latent_psnr {delta('inference_latent_psnr', inf):+.2f} dB  "
              f"psnr {delta('inference_psnr', inf):+.2f} dB  "
              f"l2 {delta('inference_l2_loss', inf):+.4f}")


if __name__ == "__main__":
    main()
