#!/usr/bin/env python
"""Train the lpips_proxy perceptual encoder and check in its weights.

Self-supervised rotation prediction on the deterministic synthetic image set
(zero-egress image: no VGG/AlexNet weights available — utils/perceptual.py).
Writes gpnf_tpu/utils/weights/perceptual_v1.npz.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gpnf_tpu.utils.perceptual import (WEIGHTS_PATH, save_params,
                                           train_encoder)

    params, acc = train_encoder(steps=args.steps, seed=args.seed)
    save_params(params)
    print(f"saved {WEIGHTS_PATH} (rotation accuracy {acc:.3f})")


if __name__ == "__main__":
    main()
