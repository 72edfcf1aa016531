"""Optimizer/schedule parity vs torch.optim.{Muon,AdamW} and
transformers.get_scheduler — the exact components the reference trains with
(train.py:1591-1612)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tpu2048.ops import adamw, muon, optimizer, schedules


def test_newton_schulz_vs_torch():
    from torch.optim._muon import _zeropower_via_newtonschulz

    rng = np.random.default_rng(0)
    for shape in [(16, 32), (32, 16), (4, 64), (1, 8), (24, 24)]:
        g = rng.normal(size=shape).astype(np.float32)
        ours = np.asarray(muon.newton_schulz(jnp.asarray(g))).astype(np.float32)
        theirs = _zeropower_via_newtonschulz(
            torch.tensor(g), (3.4445, -4.7750, 2.0315), 5, 1e-7
        ).float().numpy()
        # bf16 math on different backends: allow small elementwise slack.
        np.testing.assert_allclose(ours, theirs, atol=0.05, rtol=0.05)


def test_muon_step_vs_torch():
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(8, 16)).astype(np.float32)
    grads = [rng.normal(size=(8, 16)).astype(np.float32) for _ in range(4)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Muon(
        [tp], lr=0.01, weight_decay=0.01, adjust_lr_fn="match_rms_adamw"
    )

    jp = {"w": jnp.asarray(p0)}
    jstate = muon.init(jp)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()
        jp, jstate = muon.update({"w": jnp.asarray(g)}, jstate, jp, 0.01,
                                 weight_decay=0.01)
    np.testing.assert_allclose(np.asarray(jp["w"]), tp.detach().numpy(),
                               atol=2e-3, rtol=2e-3)


def test_adamw_step_vs_torch():
    rng = np.random.default_rng(2)
    p0 = rng.normal(size=(32,)).astype(np.float32)
    grads = [rng.normal(size=(32,)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=1e-3, betas=(0.9, 0.999), weight_decay=0.01)

    jp = {"b": jnp.asarray(p0)}
    jstate = adamw.init(jp)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()
        jp, jstate = adamw.update({"b": jnp.asarray(g)}, jstate, jp, 1e-3)
    np.testing.assert_allclose(np.asarray(jp["b"]), tp.detach().numpy(), atol=1e-6)


def test_cosine_schedule_vs_transformers():
    from transformers import get_scheduler

    warmup, total = 10, 100
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1.0)
    sched = get_scheduler("cosine", opt, num_warmup_steps=warmup, num_training_steps=total)
    ref = []
    for _ in range(total):
        ref.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    ours = np.asarray(
        schedules.cosine_with_warmup(jnp.arange(total), warmup, total)
    )
    np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-6)


def test_clip_by_global_norm_matches_torch():
    rng = np.random.default_rng(3)
    gs = {"a": rng.normal(size=(8, 8)).astype(np.float32) * 3,
          "b": rng.normal(size=(5,)).astype(np.float32) * 3}
    tps = [torch.nn.Parameter(torch.zeros_like(torch.tensor(v))) for v in gs.values()]
    for tp, v in zip(tps, gs.values()):
        tp.grad = torch.tensor(v.copy())
    tnorm = torch.nn.utils.clip_grad_norm_(tps, 1.0)
    clipped, norm = optimizer.clip_by_global_norm(
        {k: jnp.asarray(v) for k, v in gs.items()}, 1.0
    )
    assert abs(float(norm) - float(tnorm)) < 1e-5
    np.testing.assert_allclose(np.asarray(clipped["a"]), tps[0].grad.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["b"]), tps[1].grad.numpy(), atol=1e-6)


def test_combined_optimizer_routes_by_label():
    """2D 'other' params move by Muon (orthogonalized update has RMS set by the
    0.2*sqrt(max(A,B)) rule); 1D params by AdamW."""
    params = {"w": jnp.ones((8, 8)), "b": jnp.ones((8,)),
              "vw": jnp.ones((1, 8)), "vb": jnp.ones((1,))}
    labels = {"w": "muon_other", "b": "adamw_other",
              "vw": "muon_value", "vb": "adamw_value"}
    cfg = optimizer.OptimizerConfig(learning_rate=0.1, critic_lr=0.0)
    state = optimizer.init(params, labels)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.1, params)
    new_p, new_state, norm = optimizer.update(grads, state, params, labels, 1.0, cfg)
    # critic_lr = 0 -> value params only decay by 0 -> unchanged.
    np.testing.assert_allclose(np.asarray(new_p["vw"]), np.asarray(params["vw"]))
    np.testing.assert_allclose(np.asarray(new_p["vb"]), np.asarray(params["vb"]))
    # other params changed.
    assert not np.allclose(np.asarray(new_p["w"]), np.asarray(params["w"]))
    assert not np.allclose(np.asarray(new_p["b"]), np.asarray(params["b"]))
    assert float(norm) > 0


def test_combined_vs_torch_reference_stack():
    """End-to-end: our combined update vs torch Muon+AdamW with the reference's
    exact param grouping, over several steps with a cosine schedule."""
    from transformers import get_scheduler

    rng = np.random.default_rng(4)
    shapes = {"w1": (16, 12), "b1": (16,), "vw": (1, 16), "vb": (1,)}
    labels = {"w1": "muon_other", "b1": "adamw_other",
              "vw": "muon_value", "vb": "adamw_value"}
    init_np = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}

    lr, critic_lr, warmup, total = 1e-3, 1e-4, 2, 10
    tps = {k: torch.nn.Parameter(torch.tensor(v.copy())) for k, v in init_np.items()}
    tmuon = torch.optim.Muon(
        [{"params": [tps["w1"]], "lr": lr}, {"params": [tps["vw"]], "lr": critic_lr}],
        weight_decay=0.01, adjust_lr_fn="match_rms_adamw",
    )
    tadamw = torch.optim.AdamW(
        [{"params": [tps["b1"]], "lr": lr}, {"params": [tps["vb"]], "lr": critic_lr}],
        betas=(0.9, 0.999), weight_decay=0.01,
    )
    smuon = get_scheduler("cosine", tmuon, num_warmup_steps=warmup, num_training_steps=total)
    sadamw = get_scheduler("cosine", tadamw, num_warmup_steps=warmup, num_training_steps=total)

    jp = {k: jnp.asarray(v) for k, v in init_np.items()}
    cfg = optimizer.OptimizerConfig(learning_rate=lr, critic_lr=critic_lr)
    jstate = optimizer.init(jp, labels)

    for step in range(6):
        g = {k: rng.normal(size=s).astype(np.float32) * 0.5 for k, s in shapes.items()}
        for k in tps:
            tps[k].grad = torch.tensor(g[k].copy())
        torch.nn.utils.clip_grad_norm_(list(tps.values()), 1.0)
        tmuon.step()
        tadamw.step()
        smuon.step()
        sadamw.step()

        mult = schedules.cosine_with_warmup(step, warmup, total)
        jp, jstate, _ = optimizer.update(
            {k: jnp.asarray(v) for k, v in g.items()}, jstate, jp, labels, mult, cfg
        )

    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(jp[k]), tps[k].detach().numpy(), atol=5e-4, rtol=5e-3,
            err_msg=k,
        )
