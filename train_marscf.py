#!/usr/bin/env python
"""mAR-SCF training/eval CLI — TPU-native equivalent of marscf_main.py.

Flags mirror the reference argparse surface (marscf_main.py:251-268):
dataset_name, data_root, coupling, batch_size, warm_up, L, K, C,
from_checkpoint — plus TPU extras (steps cap, sampling).
"""
import argparse
import os

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", default="cifar10",
                   choices=["cifar10", "mnist", "imagenet_32", "imagenet_64", "synthetic"])
    p.add_argument("--data_root", default=None)
    p.add_argument("--coupling", default="affine", choices=["affine", "mixlogcdf"])
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--warm_up", default=10000, type=int, help="warmup in samples")
    p.add_argument("--L", default=3, type=int)
    p.add_argument("--K", default=32, type=int)
    p.add_argument("--C", default=512, type=int)
    p.add_argument("--no_attention", action="store_true")
    p.add_argument("--max_steps", default=None, type=int)
    p.add_argument("--epochs", default=100000, type=int)
    p.add_argument("--eval_every_steps", default=None, type=int,
                   help="eval/ckpt every N steps instead of per epoch "
                        "(decouples cadence from tiny synthetic epochs)")
    p.add_argument("--sync_checkpoint", action="store_true",
                   help="disable the overlapped async checkpoint save")
    p.add_argument("--from_checkpoint", action="store_true",
                   help="evaluate + sample from the best checkpoint")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="coupling-net/prior compute dtype (log-det math is "
                        "always fp32); bfloat16 is the fast TPU path "
                        "(docs/BENCHMARKS.md), float32 the exact "
                        "reference-precision path")
    args = p.parse_args()

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
    from gpnf_tpu.training.loop import TrainConfig, train, save_sample_grid

    model_cfg = MarScfConfig(L=args.L, K=args.K, hidden_channels=args.C,
                             coupling=args.coupling,
                             use_attention=not args.no_attention,
                             compute_dtype=args.compute_dtype)
    train_cfg = TrainConfig(dataset=args.dataset_name, data_root=args.data_root,
                            batch_size=args.batch_size, warm_up=args.warm_up,
                            epochs=args.epochs, max_steps=args.max_steps,
                            eval_every_steps=args.eval_every_steps,
                            async_checkpoint=not args.sync_checkpoint,
                            checkpoint_dir=args.checkpoint_dir, seed=args.seed)

    print(f"devices: {jax.devices()}")
    setting_id = f"marscf_{args.dataset_name}_{args.coupling}_{args.K}_{args.C}"

    if not args.from_checkpoint:
        train(model_cfg, train_cfg)
    else:
        from gpnf_tpu.data import get_dataset
        from gpnf_tpu.training.checkpoints import CheckpointManager
        from gpnf_tpu.training.loop import nll_metric, evaluate
        from gpnf_tpu.parallel.train_step import make_eval_step

        _, test_loader, image_shape = get_dataset(args.dataset_name,
                                                  args.batch_size, args.data_root)
        from dataclasses import asdict
        model_cfg = MarScfConfig(**{**asdict(model_cfg), "image_shape": image_shape})
        from gpnf_tpu.utils.jax_setup import init_on_cpu
        model = MarScfFlow(model_cfg)
        params_template = init_on_cpu(model.init, jax.random.PRNGKey(0))
        ckpt = CheckpointManager(os.path.join(args.checkpoint_dir, setting_id))
        params = ckpt.restore({"params": params_template}, best=True)["params"]
        print("Checkpoint loaded!")
        eval_fn = make_eval_step(nll_metric(model), None)
        nll = evaluate(eval_fn, params, test_loader, None, jax.random.PRNGKey(1))
        print(f"Test NLL (bits/dim): {nll:.3f}")
        out = save_sample_grid(model, params, jax.random.PRNGKey(2),
                               f"./samples/{setting_id}.png", n=args.batch_size)
        print(f"samples -> {out}")


if __name__ == "__main__":
    main()
