#!/usr/bin/env python
"""SRFlow training CLI — TPU-native equivalent of train.py (YAML-driven).

Usage: python train_srflow.py -opt configs/srflow_df2k_4x.yml [--max_steps N]
Falls back to synthetic LR/HR pairs when the configured pickles are missing.
"""
import argparse
import os


def build_from_opt(opt, max_steps=None):
    from gpnf_tpu.models.srflow import SRFlowConfig
    from gpnf_tpu.training.srflow_loop import SRTrainConfig
    from gpnf_tpu.utils.options import opt_get

    flow = opt_get(opt, ["network_G", "flow"], {}) or {}
    split = flow.get("split") or {}
    stack = flow.get("stackRRDB") or {}
    gt_size = opt_get(opt, ["datasets", "train", "GT_size"], 160)

    model_cfg = SRFlowConfig(
        scale=opt.get("scale", 4),
        hr_size=gt_size,
        in_nc=opt_get(opt, ["network_G", "in_nc"], 3),
        K=flow.get("K", 16),
        L=flow.get("L", 3),
        hidden_channels=flow.get("hidden_channels", 64),
        coupling=flow.get("coupling", "CondAffineSeparatedAndCond"),
        additional_flow_no_affine=int(flow.get("additionalFlowNoAffine", 2)),
        split_enable=bool(split.get("enable", True)),
        consume_ratio=split.get("consume_ratio", 0.5),
        logs_eps=split.get("logs_eps", 0.0) or 0.0,
        split_conditional=bool(split.get("conditional", False)),
        correct_splits=bool(split.get("correct_splits", False)),
        rrdb_nf=opt_get(opt, ["network_G", "nf"], 64),
        rrdb_nb=opt_get(opt, ["network_G", "nb"], 23),
        stack_blocks=tuple(stack.get("blocks") or ()),
        stack_concat=bool(stack.get("concat", False)),
        quant=opt_get(opt, ["datasets", "train", "quant"], 255) or 255,
        noise_quant=bool(opt_get(opt, ["network_G", "flow", "augmentation",
                                       "noiseQuant"], True)),
        train_rrdb_delay=opt_get(opt, ["network_G", "train_RRDB_delay"], 0.5),
        # TPU extras (no reference key): bf16 compute path + named-save remat
        compute_dtype=opt_get(opt, ["network_G", "flow", "compute_dtype"],
                              "float32") or "float32",
        remat_save_names=opt_get(opt, ["network_G", "flow",
                                       "remat_save_names"], "") or "",
    )
    train = opt.get("train") or {}
    train_cfg = SRTrainConfig(
        niter=int(train.get("niter", 200000)),
        lr_G=float(train.get("lr_G", 2.5e-4)),
        lr_RRDB=float(train.get("lr_RRDB", train.get("lr_G", 2.5e-4))),
        lr_steps=tuple(train.get("lr_steps") or (100000, 150000, 180000, 190000)),
        lr_gamma=float(train.get("lr_gamma", 0.5)),
        warmup_iter=int(train.get("warmup_iter", -1)),
        weight_decay=float(train.get("weight_decay_G", 0.0) or 0.0),
        train_rrdb_delay=float(opt_get(opt, ["network_G", "train_RRDB_delay"], 0.5)),
        weight_l1=float(train.get("weight_l1", 0.0) or 0.0),
        heats=tuple(opt_get(opt, ["val", "heats"], (0.0, 0.5, 0.75, 1.0))),
        batch_size=int(opt_get(opt, ["datasets", "train", "batch_size"], 16)),
        seed=int(train.get("manual_seed", 0)),
    )
    return model_cfg, train_cfg


def load_datasets(opt, model_cfg):
    from gpnf_tpu.data.lrhr import LRHRConfig, LRHRDataset, synthetic_lrhr
    from gpnf_tpu.utils.options import opt_get

    def make(phase, train):
        d = opt_get(opt, ["datasets", phase], {}) or {}
        cfg = LRHRConfig(
            lr_path=d.get("dataroot_LQ") or "",
            hr_path=d.get("dataroot_GT") or "",
            crop_size=d.get("GT_size", model_cfg.hr_size),
            scale=opt.get("scale", 4),
            use_flip=bool(d.get("use_flip", True)),
            use_rot=bool(d.get("use_rot", True)),
        )
        if cfg.hr_path and os.path.isfile(cfg.hr_path):
            return LRHRDataset(cfg, train=train)
        print(f"[{phase}] pickles not found -> synthetic LR/HR pairs")
        hr = synthetic_lrhr(n=32 if train else 8, hr_size=model_cfg.hr_size,
                            scale=cfg.scale)
        return LRHRDataset(cfg, train=train, hr_images=hr)

    return make("train", True), make("val", False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True, help="path to YAML config")
    p.add_argument("--max_steps", type=int, default=None)
    args = p.parse_args()

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
    from gpnf_tpu.utils.options import parse_options, dict2str
    from gpnf_tpu.training.srflow_loop import train_srflow

    opt = parse_options(args.opt, is_train=True)
    print(dict2str(opt))
    model_cfg, train_cfg = build_from_opt(opt, args.max_steps)
    train_set, val_set = load_datasets(opt, model_cfg)

    ckpt_dir = opt["path"]["models"] or "./experiments/srflow/models"
    val_freq = int((opt.get("train") or {}).get("val_freq", 5000))
    # `model:` dispatch, like the reference's create_model on opt['model']
    # (models/__init__.py:39-52): 'SRFlow' -> flow trainer, 'SR' -> the
    # plain pixel-loss RRDB baseline (models/SR_model.py).
    model_kind = str(opt.get("model", "SRFlow")).lower()
    if model_kind == "sr":
        from gpnf_tpu.models.rrdb import RRDBConfig
        from gpnf_tpu.models.sr_baseline import (SRBaselineTrainConfig,
                                                 train_sr_baseline)
        train = opt.get("train") or {}
        rrdb_cfg = RRDBConfig(nf=model_cfg.rrdb_nf, nb=model_cfg.rrdb_nb,
                              scale=model_cfg.scale)
        sr_cfg = SRBaselineTrainConfig(
            pixel_criterion=str(train.get("pixel_criterion", "l1")),
            pixel_weight=float(train.get("pixel_weight", 1.0)),
            lr=float(train.get("lr_G", 2e-4)),
            lr_steps=tuple(train.get("lr_steps") or (200000, 400000)),
            lr_gamma=float(train.get("lr_gamma", 0.5)),
            niter=int(train.get("niter", 600000)))
        train_sr_baseline(rrdb_cfg, sr_cfg, train_set, val_set,
                          batch_size=train_cfg.batch_size,
                          max_steps=args.max_steps, checkpoint_dir=ckpt_dir,
                          val_freq=val_freq, seed=train_cfg.seed)
        return
    train_srflow(model_cfg, train_cfg, train_set, val_set,
                 max_steps=args.max_steps, checkpoint_dir=ckpt_dir,
                 val_freq=val_freq)


if __name__ == "__main__":
    main()
