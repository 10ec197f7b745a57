#!/usr/bin/env python
"""Standalone invertibility round-trip check — the numeric-script workflow
the reference uses (test_transformer.py / test_transhf.py / test_code.py),
kept as a CLI for quick eyeballing; the same checks run as pytest suites.

Usage: python scripts/check_invertibility.py [--layer transformer|marscf|srflow]
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layer", default="transformer",
                   choices=["transformer", "marscf", "srflow"])
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--size", type=int, default=16)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    key = jax.random.PRNGKey(0)

    if args.layer == "transformer":
        from gpnf_tpu.ops.attention import InvertibleAttention

        attn = InvertibleAttention(args.channels, num_heads=3)
        params = attn.init(key)
        x = jax.random.normal(key, (2, args.channels, args.size, args.size))
        y, ld_f = attn.forward(params, x, jnp.zeros((2,)))
        x_rec, ld_r = attn.inverse(params, y, ld_f)
        print(f"forward logdet  {np.asarray(ld_f)}")
        print(f"net logdet      {np.asarray(ld_r)} (should be ~0)")
        print(f"recon error     {float(jnp.sum(jnp.abs(x - x_rec))):.3e}")
    elif args.layer == "marscf":
        from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

        cfg = MarScfConfig(image_shape=(args.size, args.size, 3), L=2, K=2,
                           hidden_channels=16, coupling="mixlogcdf",
                           num_blocks=2, num_components=4, drop_prob=0.0,
                           prior="convlstm", prior_hidden=8, prior_layers=1)
        model = MarScfFlow(cfg)
        params = model.init(key)
        x = jax.random.uniform(key, (2, 3, args.size, args.size)) - 0.5
        z, nll = model.forward(params, x, rng=jax.random.PRNGKey(1))
        print(f"nll bits/dim    {np.asarray(nll)}")
        xs = model.sample(params, jax.random.PRNGKey(2), batch=2)
        print(f"sample range    [{float(xs.min()):.3f}, {float(xs.max()):.3f}]")
    else:
        from gpnf_tpu.models.srflow import SRFlowConfig, SRFlowNet

        cfg = SRFlowConfig(scale=4, hr_size=32, K=2, L=2, hidden_channels=16,
                           additional_flow_no_affine=1, rrdb_nf=16, rrdb_nb=2,
                           rrdb_gc=8, stack_blocks=(0, 1), stack_concat=True)
        model = SRFlowNet(cfg)
        params = model.init(key)
        hr = jax.random.uniform(key, (1, 3, 32, 32))
        lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 8, 8))
        lr_enc = model.rrdb_preprocess(params, lr)
        z, ld, epses = model.flow.encode(params["flow"], hr, lr_enc,
                                         jnp.zeros((1,)), collect_eps=True)
        hr_rec, _ = model.flow.decode(params["flow"], z, lr_enc,
                                      jnp.zeros((1,)), epses=epses)
        print(f"encode logdet   {float(ld[0]):.4f}")
        print(f"recon error     {float(jnp.sum(jnp.abs(hr - hr_rec))):.3e}")


if __name__ == "__main__":
    main()
