#!/usr/bin/env python
"""Round-4 A/B driver: measure several remat/scan knob combos in ONE
process (one tunnel client — avoids the axon per-client startup hazards),
pipelined protocol (bench.py): STEPS back-to-back steps, one readback.

Usage: python scripts/ab_r4.py key=value-combo [...]
  each argv is a comma-separated set of overrides applied to the flagship
  config, e.g.  "default"  "remat_mode=noattn"
  "remat_mode=noattn,precompute_wn=1"  "remat_mode=noattn,scan_unroll=4".

Prints one JSON line per combo. Knobs: remat_mode, precompute_wn,
scan_unroll, prior_scan_unroll, scan_split_transpose, remat_save_names,
flat_opt (optimizer layout), batch.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
WARMUP = 2
STEPS = 20
REPEATS = 3


def parse_combo(s):
    d = {}
    if s != "default":
        for kv in s.split(","):
            k, v = kv.split("=")
            d[k] = v
    return d


def main():
    import jax
    import numpy as np
    import optax

    from gpnf_tpu.utils.jax_setup import setup as jax_setup
    jax_setup()

    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow
    from gpnf_tpu.parallel.train_step import make_train_step
    from gpnf_tpu.training.loop import bits_per_dim_loss
    from gpnf_tpu.utils.jax_setup import init_on_cpu, to_default_device

    combos = sys.argv[1:] or ["default"]
    for combo in combos:
        ov = parse_combo(combo)
        batch = int(ov.pop("batch", BATCH))
        flat_opt = ov.pop("flat_opt", "small")
        kw = dict(image_shape=(32, 32, 3), L=3, K=4, hidden_channels=96,
                  coupling="mixlogcdf", compute_dtype="bfloat16")
        for k, v in ov.items():
            if k in ("scan_unroll", "prior_scan_unroll"):
                kw[k] = int(v)
            elif k in ("precompute_wn", "scan_split_transpose", "remat"):
                kw[k] = v == "1"
            else:
                kw[k] = v
        cfg = MarScfConfig(**kw)
        model = MarScfFlow(cfg)
        rng = jax.random.PRNGKey(0)
        params = to_default_device(init_on_cpu(model.init, rng))
        opt = optax.adamax(1e-4)
        if flat_opt == "1":
            opt = optax.flatten(opt)
        elif flat_opt == "small":
            from gpnf_tpu.training.optim import flatten_small
            opt = flatten_small(opt, params)
        opt_state = to_default_device(init_on_cpu(opt.init, params))
        step = make_train_step(bits_per_dim_loss(model), opt, mesh=None,
                               donate=True)
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, 32, 32)) - 0.5

        t0 = time.time()
        try:
            for _ in range(WARMUP):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(params, opt_state, x, sub)
            jax.block_until_ready(loss)
        except Exception as e:
            print(json.dumps({"combo": combo, "error": repr(e)[:300]}),
                  flush=True)
            del params, opt_state, model
            continue
        compile_s = time.time() - t0

        rates, losses = [], []
        for _ in range(REPEATS):
            t0 = time.time()
            for _ in range(STEPS):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(params, opt_state, x, sub)
            losses.append(float(loss))  # ONE readback forces the chain
            rates.append(batch * STEPS / (time.time() - t0))
        assert losses[-1] != losses[0]
        img_s = float(np.median(rates))
        print(json.dumps({
            "combo": combo, "img_s": round(img_s, 1),
            "spread": round((max(rates) - min(rates)) / img_s, 4),
            "repeats": [round(r, 1) for r in rates],
            "compile_s": round(compile_s, 1),
            "loss": round(float(loss), 3),
        }), flush=True)
        del params, opt_state, model, step, x


if __name__ == "__main__":
    main()
