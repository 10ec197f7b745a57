"""flatten_small: the partial-flatten optimizer relayout must be a no-op
numerically (coordinate-wise transforms are invariant under raveling)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpnf_tpu.training.optim import flatten_small


def _params():
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    return {
        "conv": {"w": jax.random.normal(k[0], (3, 3, 16, 32)),
                 "b": jax.random.normal(k[1], (32,))},
        "norm": {"scale": jax.random.normal(k[2], (16,)),
                 "bias": jax.random.normal(k[3], (16,)).astype(jnp.bfloat16)},
        "head": [jax.random.normal(k[4], (128, 128)),
                 jax.random.normal(k[5], (7,))],
    }


def test_flatten_small_matches_per_leaf():
    params = _params()
    inner = optax.chain(optax.add_decayed_weights(1e-4),
                        optax.adamax(1e-2))
    ref = inner
    opt = flatten_small(inner, params, threshold=4096)
    s_ref, s = ref.init(params), opt.init(params)
    p_ref = p = params
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        ks = jax.random.split(sub, len(jax.tree.leaves(params)))
        grads = jax.tree.unflatten(
            jax.tree.structure(params),
            [jax.random.normal(kk, l.shape, l.dtype)
             for kk, l in zip(ks, jax.tree.leaves(p))])
        u_ref, s_ref = ref.update(grads, s_ref, p_ref)
        u, s = opt.update(grads, s, p)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p = optax.apply_updates(p, u)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-6, atol=1e-6)


def test_flatten_small_partition_and_jit():
    params = _params()
    opt = flatten_small(optax.adamax(1e-3), params, threshold=4096)
    state = opt.init(params)
    # only the two large leaves stay per-leaf; the rest ravel per dtype
    mu = state[0].mu
    assert len(mu["large"]) == 2
    assert set(mu["flat"]) == {"float32", "bfloat16"}
    assert mu["flat"]["float32"].shape == (32 + 16 + 7,)

    @jax.jit
    def step(p, s):
        g = jax.tree.map(jnp.ones_like, p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    p2, _ = step(params, state)
    assert jax.tree.structure(p2) == jax.tree.structure(params)


# ---------------------------------------------------------------------------
# torch-exact Adamax + reference warmup counting
# ---------------------------------------------------------------------------
def test_reference_adamax_matches_torch_unit():
    """reference_adamax must reproduce torch.optim.Adamax bit-for-bit-ish
    (fp32) over many steps, including under a per-step lr schedule."""
    import pytest
    torch = pytest.importorskip("torch")
    from gpnf_tpu.training.optim import reference_adamax, reference_warmup

    rng = np.random.default_rng(0)
    shapes = [(7,), (4, 5), (3, 3, 2, 2)]
    init = [rng.standard_normal(s).astype(np.float32) for s in shapes]

    # torch side: Adamax + LambdaLR stepped exactly like marscf_main.py:340-347
    tparams = [torch.nn.Parameter(torch.tensor(v.copy())) for v in init]
    topt = torch.optim.Adamax(tparams, lr=1e-2)
    import torch.optim.lr_scheduler as tsched
    warm_up, batch_size = 8, 2
    scheduler = tsched.LambdaLR(topt, lambda s: min(1.0, s / warm_up))

    # jax side
    sched = reference_warmup(1e-2, warm_up, batch_size)
    opt = reference_adamax(learning_rate=sched)
    jparams = [jnp.asarray(v) for v in init]
    state = opt.init(jparams)

    global_step = 0
    for i in range(12):
        grads = [rng.standard_normal(s).astype(np.float32) * (1.0 + i)
                 for s in shapes]
        # scale one grad tiny so the eps-inside-max branch is exercised
        grads[0] = grads[0] * 1e-9

        topt.zero_grad()
        for p, g in zip(tparams, grads):
            p.grad = torch.tensor(g.copy())
        topt.step()
        scheduler.step(global_step)
        global_step += batch_size

        jgrads = [jnp.asarray(g) for g in grads]
        updates, state = opt.update(jgrads, state, jparams)
        jparams = optax.apply_updates(jparams, updates)

        for tp, jp in zip(tparams, jparams):
            np.testing.assert_allclose(np.asarray(jp),
                                       tp.detach().numpy(),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"step {i}")


def test_adamax_trajectory_lockstep_vs_torch(monkeypatch):
    """Optimizer-TRAJECTORY parity (r3 VERDICT item 4): transplant one init
    into both frameworks, feed identical pre-dequantized batches (noise
    injected, not sampled), run lockstep Adamax+warmup steps torch-CPU vs
    JAX-CPU, and require per-step bits/dim within 1e-3 and final params
    close. Pins torch Adamax + scheduler.step(global_step) warmup
    (marscf_main.py:302-303,340-347) against reference_adamax +
    reference_warmup — the dynamics the 400-epoch parity north-star rests
    on, which single-point NLL parity never touched."""
    import math

    import pytest
    torch = pytest.importorskip("torch")
    from ref_transplant import (copy_marscf, import_marscf_main,
                                patch_cuda_away)

    patch_cuda_away(monkeypatch)

    from gpnf_tpu.models.marscf import MarScfConfig, MarScfFlow

    L, K, C, batch = 2, 2, 24, 2  # 32x32: the reference prior is hard-coded to it
    lr, warm_up = 1e-3, 8  # short ramp: full lr by update 5 (bs 2)
    n_steps = 20

    ref_main = import_marscf_main()
    torch.manual_seed(0)
    ref = ref_main.MarScfFlow(batch, (32, 32, 3), "affine", L, K, C)
    rng = np.random.default_rng(11)
    # randomize zero convs so couplings are non-identity from step 0
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for m in ref.modules():
            if type(m).__name__ == "Conv2dZeros":
                m.weight.normal_(0.0, 0.02, generator=gen)
                m.bias.normal_(0.0, 0.01, generator=gen)
                m.logs.normal_(0.0, 0.1, generator=gen)
    x_init = torch.tensor(rng.random((batch, 3, 32, 32), np.float32) - 0.5)
    with torch.no_grad():
        ref(x_init)  # actnorm ddi
    ref.eval()  # dropout off both sides; ddi already frozen

    cfg = MarScfConfig(image_shape=(32, 32, 3), L=L, K=K, hidden_channels=C,
                       coupling="affine", use_attention=True,
                       prior="convlstm", prior_hidden=32, prior_layers=3,
                       scan_steps=False, remat=False,
                       compute_dtype="float32")
    model = MarScfFlow(cfg)
    jparams = copy_marscf(ref, L, K)

    num_dims = 3 * 32 * 32
    base = -math.log(256.0) * num_dims
    ln2d = math.log(2.0) * num_dims

    topt = torch.optim.Adamax([p for p in ref.parameters()], lr=lr)
    import torch.optim.lr_scheduler as tsched
    scheduler = tsched.LambdaLR(topt, lambda s: min(1.0, s / warm_up))

    from gpnf_tpu.training.optim import reference_adamax, reference_warmup
    opt = reference_adamax(learning_rate=reference_warmup(lr, warm_up, batch))
    jstate = opt.init(jparams)

    def jloss(p, z0):
        _, obj = model.encode(p, z0, jnp.full((batch,), base, jnp.float32))
        return jnp.mean(-obj / ln2d)

    jstep = jax.jit(lambda p, s, z0: _apply(p, s, z0))

    def _apply(p, s, z0):
        val, grads = jax.value_and_grad(jloss)(p, z0)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, val

    global_step = 0
    losses_t, losses_j = [], []
    for i in range(n_steps):
        # identical pre-dequantized batch (noise injected, not sampled)
        x = rng.random((batch, 3, 32, 32), np.float32) - 0.5
        z0 = x + rng.random((batch, 3, 32, 32), np.float32) / 256.0

        topt.zero_grad()
        _, obj_ref = ref.flow(torch.tensor(z0),
                              logdet=torch.full((batch,), base),
                              reverse=False)
        loss_t = torch.mean(-obj_ref / ln2d)
        loss_t.backward()
        topt.step()
        scheduler.step(global_step)
        global_step += batch

        jparams, jstate, loss_j = jstep(jparams, jstate, jnp.asarray(z0))
        losses_t.append(float(loss_t))
        losses_j.append(float(loss_j))

    losses_t, losses_j = np.asarray(losses_t), np.asarray(losses_j)
    assert np.all(np.isfinite(losses_t)) and np.all(np.isfinite(losses_j))
    diff = np.abs(losses_t - losses_j)
    assert diff.max() <= 1e-3, (
        f"per-step bits/dim diverged: max {diff.max():.2e} at step "
        f"{diff.argmax()}\ntorch {losses_t}\njax   {losses_j}")
    # loss must actually move (the run is a real trajectory, not a no-op)
    assert abs(losses_t[-1] - losses_t[0]) > 1e-3

    # final params: re-transplant the trained torch weights and compare
    p_torch_final = copy_marscf(ref, L, K)
    for a, b in zip(jax.tree.leaves(p_torch_final), jax.tree.leaves(jparams)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_srflow_adam_schedule_lockstep_vs_torch():
    """SRFlow optimizer dynamics pin: torch Adam + the reference
    MultiStepLR_Restart stepped BEFORE each update with 1-based
    current_step + the BaseModel warmup override (train.py:184-192,
    base_model.py:69-81, lr_scheduler.py:24-50) vs optax.adam +
    srflow_loop._lr_schedule. 25 lockstep updates on identical grads;
    params must track to fp32 tolerance through warmup AND a decay
    milestone."""
    import pytest
    torch = pytest.importorskip("torch")
    import sys as _sys
    if "/root/reference" not in _sys.path:
        _sys.path.insert(0, "/root/reference")
    from models.lr_scheduler import MultiStepLR_Restart

    from gpnf_tpu.training.srflow_loop import SRTrainConfig, _lr_schedule

    rng = np.random.default_rng(5)
    shapes = [(6,), (3, 4)]
    init = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    base_lr, warmup, milestones, gamma = 1e-2, 8, [12, 20], 0.5

    tparams = [torch.nn.Parameter(torch.tensor(v.copy())) for v in init]
    topt = torch.optim.Adam(tparams, lr=base_lr, betas=(0.9, 0.99))
    sched_t = MultiStepLR_Restart(topt, milestones, gamma=gamma,
                                  lr_steps_invese=[])

    cfg = SRTrainConfig(lr_steps=milestones, lr_gamma=gamma,
                        warmup_iter=warmup)
    sched_j = _lr_schedule(cfg, base_lr)
    opt = optax.adam(learning_rate=sched_j, b1=0.9, b2=0.99)
    jparams = [jnp.asarray(v) for v in init]
    state = opt.init(jparams)

    init_lrs = [g["initial_lr"] for g in topt.param_groups]
    for i in range(1, 26):  # current_step, 1-based like train.py:184
        # reference order: scheduler.step() then warmup override, then update
        sched_t.step()
        if i < warmup:
            for g, il in zip(topt.param_groups, init_lrs):
                g["lr"] = il / warmup * i
        grads = [rng.standard_normal(s).astype(np.float32) for s in shapes]
        topt.zero_grad()
        for p, g in zip(tparams, grads):
            p.grad = torch.tensor(g.copy())
        topt.step()

        updates, state = opt.update([jnp.asarray(g) for g in grads], state,
                                    jparams)
        jparams = optax.apply_updates(jparams, updates)

        for tp, jp in zip(tparams, jparams):
            np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"step {i}")
