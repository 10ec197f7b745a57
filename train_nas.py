#!/usr/bin/env python
"""NAS search driver for the video-SR supernet (models/nas.py).

DARTS/AGD-style alternating search (the reference's missing train loop around
model_search.py's NAS_GAN): weight steps minimize the image criterion on one
half of the synthetic clip stream, arch steps minimize criterion + an
expected-FLOPs penalty (XLA cost analysis) on the other half. Prints the
selected genotype at the end.

Usage:
  python train_nas.py --steps 20 --nf 8 --num_cell 2 --frames 3 --hw 8
"""
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--nf", type=int, default=8)
    ap.add_argument("--num_cell", type=int, default=2)
    ap.add_argument("--op_per_cell", type=int, default=2)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--hw", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr_w", type=float, default=1e-3)
    ap.add_argument("--lr_arch", type=float, default=3e-3)
    ap.add_argument("--flops_weight", type=float, default=1e-12)
    ap.add_argument("--retrain_steps", type=int, default=0,
                    help="after search, retrain the derived (discretized) "
                         "network for N steps with transplanted weights")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (search is conv-small)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()
    from gpnf_tpu.models.nas import (NASConfig, NASVideoSR, PerceptualFeatures,
                                     genotype)

    cfg = NASConfig(nf=args.nf, num_frames=args.frames,
                    center=args.frames // 2, num_cell=args.num_cell,
                    op_per_cell=args.op_per_cell,
                    flops_weight=args.flops_weight)
    model = NASVideoSR(cfg)
    key = jax.random.PRNGKey(args.seed)
    k_p, k_a, k_d = jax.random.split(key, 3)
    params = model.init(k_p)
    arch = model.init_arch()
    feat = PerceptualFeatures()

    opt_w = optax.adam(args.lr_w)
    opt_a = optax.adam(args.lr_arch)
    st_w, st_a = opt_w.init(params), opt_a.init(arch)

    # Static per-primitive FLOPs table (XLA cost analysis, host-side once);
    # the arch step adds flops_weight * E[FLOPs](arch) so the search trades
    # accuracy against expected cost (model_search.py:719-779 equivalent).
    flops_tab = model.flops_table((args.hw, args.hw))

    def criterion(p, a, clips, hr, rng):
        sr = model.apply(p, a, clips, rng)
        return model.criterion_image(sr, hr, feature_fn=feat)

    @jax.jit
    def w_step(p, a, st, clips, hr, rng):
        loss, g = jax.value_and_grad(criterion)(p, a, clips, hr, rng)
        upd, st = opt_w.update(g, st, p)
        return optax.apply_updates(p, upd), st, loss

    def criterion_arch(a, p, clips, hr, rng):
        loss = criterion(p, a, clips, hr, rng)
        return loss + args.flops_weight * model.arch_flops_expected(
            a, flops_tab)

    @jax.jit
    def a_step(p, a, st, clips, hr, rng):
        loss, g = jax.value_and_grad(criterion_arch)(a, p, clips, hr, rng)
        upd, st = opt_a.update(g, st, a)
        return optax.apply_updates(a, upd), st, loss

    def batch(k):
        k1, k2 = jax.random.split(k)
        clips = jax.random.uniform(
            k1, (args.batch, args.frames, 3, args.hw, args.hw))
        hr = jax.image.resize(clips[:, args.frames // 2],
                              (args.batch, 3, 16 * args.hw, 16 * args.hw),
                              method="cubic")
        return clips, hr

    t0 = time.time()
    for step in range(args.steps):
        k_d, k1, k2, kr1, kr2 = jax.random.split(k_d, 5)
        clips, hr = batch(k1)
        params, st_w, lw = w_step(params, arch, st_w, clips, hr, kr1)
        clips, hr = batch(k2)
        arch, st_a, la = a_step(params, arch, st_a, clips, hr, kr2)
        if step % 5 == 0 or step == args.steps - 1:
            fl = model.arch_flops(arch, (args.hw, args.hw))
            print(f"step {step}: w_loss={float(lw):.4f} "
                  f"arch_loss={float(la):.4f} E[flops]={fl:.3g} "
                  f"({time.time()-t0:.1f}s)")

    sel = genotype(arch)
    print("genotype:", json.dumps(sel))

    if args.retrain_steps:
        # AGD retrain stage: discretize to the single-op network, transplant
        # the searched weights, continue with the image criterion only.
        from gpnf_tpu.models.nas import derive_params
        derived = model.derive(sel)
        d_params = derive_params(params, sel)
        opt_r = optax.adam(args.lr_w)
        st_r = jax.jit(opt_r.init)(d_params)  # one dispatch, not per leaf

        @jax.jit
        def r_step(p, st, clips, hr):
            def loss_fn(pp):
                return model.criterion_image(derived.apply(pp, clips), hr,
                                             feature_fn=feat)
            loss, g = jax.value_and_grad(loss_fn)(p)
            upd, st = opt_r.update(g, st, p)
            return optax.apply_updates(p, upd), st, loss

        for step in range(args.retrain_steps):
            k_d, k1 = jax.random.split(k_d)
            clips, hr = batch(k1)
            d_params, st_r, lr_loss = r_step(d_params, st_r, clips, hr)
            if step % 5 == 0 or step == args.retrain_steps - 1:
                print(f"retrain {step}: loss={float(lr_loss):.4f} "
                      f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
