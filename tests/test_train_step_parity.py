"""End-to-end TRAINING-step parity vs torch: same weights + batches ->
same parameters after 3 steps of clip(1.0) + Adam + OneCycleLR + focal loss.

This exercises the whole differentiable path (loss -> grads -> clip ->
optimizer -> schedule) against the reference's exact training math
(ref: src/train.py:176-206, 296-319). Dropout is disabled for determinism.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gaviko_tpu.models.factory import build_model
from gaviko_tpu.train.loop import make_optimizer, make_steps, split_params
from gaviko_tpu.train.losses import make_criterion
from gaviko_tpu.weights.state_dict import load_state_dict

from tests.torch_ref import TINY_MODEL_CFG, build_ref_model, state_dict_numpy

CFG = {**TINY_MODEL_CFG, "dropout": 0.0, "emb_dropout": 0.0}


@pytest.mark.parametrize("method", ["bitfit", "fft"])
def test_three_train_steps_match_torch(method, tmp_path):
    import torch

    ref = build_ref_model(method, CFG, str(tmp_path))
    state = state_dict_numpy(ref)

    model = build_model({**CFG, "method": method})
    params = model.init(jax.random.PRNGKey(0), model.spec)
    params, _, _ = load_state_dict(params, state)

    # requires_grad filter as the entry points apply it (train.py:114-137).
    for key, value in ref.named_parameters():
        if method == "bitfit":
            value.requires_grad = "bias" in key or "head" in key
        else:
            value.requires_grad = True

    rng = np.random.RandomState(0)
    n_steps = 3
    batches = [
        (rng.rand(2, 1, 24, 32, 32).astype(np.float32), rng.randint(0, 5, 2))
        for _ in range(n_steps)
    ]

    # ---- torch side (the reference's loop, train.py:296-319) ----
    import sys

    sys.path.append("/root/reference/src")
    from losses.focal_loss import FocalLoss

    criterion_t = FocalLoss(gamma=1.2)
    trainable_t = [p for p in ref.parameters() if p.requires_grad]
    opt = torch.optim.Adam(trainable_t, lr=1e-4, eps=1e-8)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=3e-4, total_steps=n_steps, pct_start=0.3,
        div_factor=10.0, final_div_factor=1000.0,
        anneal_strategy="cos", three_phase=False,
    )
    ref.train()
    for xb, yb in batches:
        opt.zero_grad()
        out = ref(torch.from_numpy(xb))
        loss = criterion_t(out, torch.from_numpy(yb))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
        opt.step()
        sch.step()
    final_t = state_dict_numpy(ref)

    # ---- jax side ----
    train_cfg = {
        "loss_fn": "focal_loss", "fp16": False,
        "scheduler": {"max_lr": 3e-4, "pct_start": 0.3, "div_factor": 10.0,
                      "final_div_factor": 1000.0, "anneal_strategy": "cos",
                      "three_phase": False},
    }
    criterion = make_criterion(train_cfg)
    # fused defaults on, so this torch-parity run covers the fused
    # clip+Adam path end to end (train/fused_optim.py).
    tx, _, fused = make_optimizer(train_cfg, total_steps=n_steps)
    train_step, _, _ = make_steps(model, criterion, tx, fused=fused)
    trainable, frozen = split_params(model, params)
    from gaviko_tpu.train.loop import init_opt_state

    opt_state = init_opt_state(tx, fused, trainable)
    for xb, yb in batches:
        trainable, opt_state, loss, _ = train_step(
            trainable, opt_state, frozen, jnp.asarray(xb), jnp.asarray(yb),
            jax.random.PRNGKey(0),
        )

    final_j = {**frozen, **trainable}
    # Tolerance note: at t=1 Adam's update is ~sign(g) for small-|g| coords
    # (m_hat/(sqrt(v_hat)+eps) with v_hat = g^2), so ~1e-8 fp32 gradient
    # noise between frameworks amplifies to ~1e-5-scale parameter noise.
    # 2e-4 (< one lr-sized step) still catches wrong loss/clip/schedule/
    # optimizer math, which produce O(lr * steps) ~ 1e-3 divergence.
    for k in final_t:
        diff = float(np.abs(np.asarray(final_j[k]) - final_t[k]).max())
        assert diff < 2e-4, f"{k}: max diff {diff}"


# Frozen-backbone PEFT methods whose trainable set is chosen by the MODEL
# ctor (ref: src/model/gaviko.py:429-434, ssf.py:204-209, melo.py:63-64)
# rather than an entry-point requires_grad filter. Dropout zeroed for
# determinism (gaviko's attn/proj drop included).
_PEFT_CFGS = {
    "gaviko": dict(
        freeze_vit=True, num_prompts=5, prompt_latent_dim=12, local_dim=12,
        local_k=[2, 2, 2], DHW=[2, 2, 2], attn_drop=0.0, proj_drop=0.0,
        share_factor=1,
    ),
    "ssf": dict(freeze_vit=True),
    "melo": dict(freeze_vit=True, r=4, alpha=4),
    "adaptformer": dict(freeze_vit=True),
    "dvpt": dict(freeze_vit=True, num_prompts=6, pool="mean"),
    "evp": dict(freeze_vit=True, scale_factor=4),
    "shallow_vpt": dict(freeze_vit=True, num_prompts=4, prompt_dim=16,
                        prompt_dropout=0.0, deep_prompt=False),
    "deep_vpt": dict(freeze_vit=True, num_prompts=4, prompt_dim=16,
                     prompt_dropout=0.0, deep_prompt=True),
}


@pytest.mark.parametrize("method", sorted(_PEFT_CFGS))
def test_three_peft_train_steps_match_torch(method, tmp_path):
    """The flagship (GAViKO) train headline path — frozen-backbone masks,
    focal loss (parity mode), clip+Adam+OneCycle — locked to a 3-step torch
    oracle, per-step losses included (round-4 verdict #4: the only headline
    metric whose end-to-end math wasn't oracle-locked).
    Ref: src/train.py:257-361 at gaviko.yaml settings."""
    import torch

    cfg = {**CFG, **_PEFT_CFGS[method]}
    ref = build_ref_model(method, cfg, str(tmp_path))
    state = state_dict_numpy(ref)

    model = build_model({**cfg, "method": method})
    params = model.init(jax.random.PRNGKey(0), model.spec)
    params, _, _ = load_state_dict(params, state)

    # The trainable sets must agree before comparing optimizer trajectories.
    from tests.torch_ref import ref_trainable_names

    assert set(model.trainable_names(params)) == ref_trainable_names(ref)

    rng = np.random.RandomState(0)
    n_steps = 3
    batches = [
        (rng.rand(2, 1, 24, 32, 32).astype(np.float32), rng.randint(0, 5, 2))
        for _ in range(n_steps)
    ]

    # ---- torch side ----
    import sys

    sys.path.append("/root/reference/src")
    from losses.focal_loss import FocalLoss

    criterion_t = FocalLoss(gamma=1.2)
    trainable_t = [p for p in ref.parameters() if p.requires_grad]
    opt = torch.optim.Adam(trainable_t, lr=1e-4, eps=1e-8)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=3e-4, total_steps=n_steps, pct_start=0.3,
        div_factor=10.0, final_div_factor=1000.0,
        anneal_strategy="cos", three_phase=False,
    )
    ref.train()  # custom train() keeps frozen submodules in eval mode
    losses_t = []
    for xb, yb in batches:
        opt.zero_grad()
        out = ref(torch.from_numpy(xb))
        loss = criterion_t(out, torch.from_numpy(yb))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
        opt.step()
        sch.step()
        losses_t.append(float(loss))
    final_t = state_dict_numpy(ref)

    # ---- jax side: the production step builder ----
    train_cfg = {
        "loss_fn": "focal_loss", "fp16": False,
        "scheduler": {"max_lr": 3e-4, "pct_start": 0.3, "div_factor": 10.0,
                      "final_div_factor": 1000.0, "anneal_strategy": "cos",
                      "three_phase": False},
    }
    criterion = make_criterion(train_cfg)
    tx, _, fused = make_optimizer(train_cfg, total_steps=n_steps)
    train_step, _, _ = make_steps(model, criterion, tx, fused=fused)
    trainable, frozen = split_params(model, params)
    from gaviko_tpu.train.loop import init_opt_state

    opt_state = init_opt_state(tx, fused, trainable)
    losses_j = []
    for xb, yb in batches:
        trainable, opt_state, loss, _ = train_step(
            trainable, opt_state, frozen, jnp.asarray(xb), jnp.asarray(yb),
            jax.random.PRNGKey(0),
        )
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, atol=1e-5, rtol=1e-5)
    final_j = {**frozen, **trainable}
    # GAViKO's global_query/local_query state_dict rows ALIAS the trainable
    # query_proj tensors in torch, so they show the updated values; our
    # alias entries are frozen copies (PARITY.md #7) and the forward reads
    # only the canonical keys — compare aliases against their canonicals.
    alias_map = {}
    if method == "gaviko":
        from gaviko_tpu.models.gaviko import aliases

        alias_map = aliases(model.spec)
    for k in final_t:
        ours = final_j[alias_map.get(k, k)]
        diff = float(np.abs(np.asarray(ours) - final_t[k]).max())
        assert diff < 2e-4, f"{method} {k}: max diff {diff}"


def test_adam_clip_update_math_matches_torch_exactly():
    """Unit-level: identical synthetic grads -> identical clip+Adam updates."""
    import torch

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 8).astype(np.float32)
    grads = [rng.randn(4, 8).astype(np.float32) * s for s in (3.0, 0.5, 1e-6)]

    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([p], lr=1e-3, eps=1e-8)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([p], 1.0)
        opt.step()
    want = p.detach().numpy()

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3, eps=1e-8))
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), want, atol=2e-7)
