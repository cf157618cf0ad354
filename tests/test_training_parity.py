"""Training-trajectory parity: starting from IDENTICAL weights and feeding
IDENTICAL batches, our jit train step (TFAM + optax AdamW + per-epoch cosine
annealing + BCE) must track a torch oracle (nn.MultiheadAttention blocks +
torch AdamW + CosineAnnealingLR + BCEWithLogitsLoss) step for step.

This pins the full optimizer stack — not just the forward — against the
reference's exact training recipe (TFAM/train_and_eval.py:53-58,162)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from tests.test_tfam import CLASSES, D, FF, HEADS, LAYERS, TorchOracle, _config
from vimoclip_tpu import losses
from vimoclip_tpu.models import TFAM
from vimoclip_tpu.models.torch_compat import tfam_params_from_torch
from vimoclip_tpu.train.state import TrainState, cosine_annealing_schedule, make_adamw

EPOCHS, STEPS_PER_EPOCH = 3, 2


def test_train_trajectory_matches_torch():
    torch.manual_seed(42)
    oracle = TorchOracle("cross").train()
    rng = np.random.default_rng(0)

    # identical starting weights
    state_dict = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = tfam_params_from_torch(state_dict, num_layers=LAYERS, d_model=D)
    cfg = _config("cross")
    # dropout must be off for determinism across frameworks
    import dataclasses

    cfg = dataclasses.replace(cfg, dropout=0.0, mlp_dropout=0.0)
    model = TFAM(config=cfg, num_classes=CLASSES)

    # reference recipe: AdamW(1e-4, wd=0.1) + CosineAnnealingLR per epoch
    schedule = cosine_annealing_schedule(1e-4, EPOCHS, STEPS_PER_EPOCH, 1e-6)
    tx = make_adamw(schedule, weight_decay=0.1)
    state = TrainState.create(params, tx)

    opt = torch.optim.AdamW(oracle.parameters(), lr=1e-4, weight_decay=0.1)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=EPOCHS, eta_min=1e-6)
    criterion = nn.BCEWithLogitsLoss()

    @jax.jit
    def step(state, rgb, motion, mr, mf, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, rgb, motion, mr, mf,
                                 deterministic=True)
            return losses.bce_with_logits(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    b, t = 4, 9
    jax_losses, torch_losses = [], []
    for epoch in range(EPOCHS):
        for _ in range(STEPS_PER_EPOCH):
            rgb = rng.normal(size=(b, t, D)).astype(np.float32)
            motion = rng.normal(size=(b, t - 1, D)).astype(np.float32)
            lens = rng.integers(3, t + 1, size=b)
            # reference-collate invariant: arrays are padded exactly to the
            # batch max (the torch oracle fed longer arrays would pool over
            # positions the reference never creates)
            lens[0] = t
            mr = np.arange(t)[None, :] < lens[:, None]
            mf = np.arange(t - 1)[None, :] < (lens - 1)[:, None]
            y = (rng.random((b, CLASSES)) < 0.2).astype(np.float32)

            state, jl = step(state, jnp.asarray(rgb), jnp.asarray(motion),
                             jnp.asarray(mr), jnp.asarray(mf), jnp.asarray(y))
            jax_losses.append(float(jl))

            opt.zero_grad()
            out = oracle(torch.from_numpy(rgb), torch.from_numpy(motion),
                         torch.from_numpy(mr), torch.from_numpy(mf))
            tl = criterion(out, torch.from_numpy(y))
            tl.backward()
            opt.step()
            torch_losses.append(tl.detach().item())
        sched.step()

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-5)
    # and the loss actually moved (optimizer did something)
    assert jax_losses[-1] != jax_losses[0]


def test_student_train_trajectory_matches_torch():
    """Stage-1 recipe parity: from identical weights, our jit student train
    step (cosine distillation on teacher[:, :-1] + pos-weighted BCE + Adam,
    reference train.py:66,98-99) tracks the torch recipe step for step —
    the stage-1 counterpart of the TFAM trajectory test above."""
    import torch.nn.functional as F

    from tests.test_student import CFG as SCFG, CLASSES as SCLASSES, _torch_oracle
    from vimoclip_tpu.models.clip_convert import clip_vision_params_from_hf
    from vimoclip_tpu.models.student import StudentModel
    from vimoclip_tpu.models.torch_compat import residual_mlp_params_from_torch
    from vimoclip_tpu.train.state import make_adam

    hf, rmlp, head = _torch_oracle()
    hf.train(False)  # CLIP has no dropout by default; keep eval-mode parity

    params = {
        "visual_encoder": clip_vision_params_from_hf(
            {k: v.numpy() for k, v in hf.state_dict().items()}, SCFG
        ),
        "residual_mlp": residual_mlp_params_from_torch(
            {f"residual_mlp.{k}": v.numpy() for k, v in rmlp.state_dict().items()}
        ),
        "head_dense1": {"kernel": head[0].weight.detach().numpy().T.copy(),
                        "bias": head[0].bias.detach().numpy().copy()},
        "head_dense2": {"kernel": head[2].weight.detach().numpy().T.copy(),
                        "bias": head[2].bias.detach().numpy().copy()},
    }
    model = StudentModel(vision_config=SCFG, num_classes=SCLASSES)
    tx = make_adam(1e-3)
    state = TrainState.create(params, tx)

    torch_params = (list(hf.parameters()) + list(rmlp.parameters())
                    + list(head.parameters()))
    opt = torch.optim.Adam(torch_params, lr=1e-3)
    pos_w = 9.0

    @jax.jit
    def step(state, pixels, teacher, y):
        def loss_fn(p):
            _, distill, logits = model.apply(
                {"params": p}, pixels, preprocessed=True
            )
            d = losses.distillation_loss(distill, teacher[:, :-1], "cosine")
            c = losses.classification_loss(logits, y, pos_w)
            return d + c

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    def torch_losses_fn(pixels, teacher, y):
        b, t = pixels.shape[:2]
        flat = torch.from_numpy(
            pixels.reshape(b * t, 32, 32, 3).transpose(0, 3, 1, 2).copy()
        )
        emb = hf(flat).image_embeds.view(b, t, -1)
        distill = rmlp(emb)
        logits = head(emb.mean(dim=1))
        # reference cosine distillation (losses.py:24-40)
        tt = torch.from_numpy(teacher[:, :-1].copy())
        eps = 1e-5
        sn = distill / distill.norm(dim=-1, keepdim=True).clamp(min=eps)
        tn = tt / tt.norm(dim=-1, keepdim=True).clamp(min=eps)
        cos = (sn * tn).sum(-1).clamp(-1 + eps, 1 - eps)
        d = (1.0 - cos).mean()
        # reference pos-weighted BCE (losses.py:61-63)
        yt = torch.from_numpy(y.copy())
        pw = torch.full((SCLASSES,), pos_w) * yt + 1.0
        c = F.binary_cross_entropy_with_logits(logits, yt, pos_weight=pw)
        return d + c

    rng = np.random.default_rng(7)
    b, t = 2, 4
    jl, tl = [], []
    for _ in range(6):
        pixels = rng.normal(size=(b, t - 1, 32, 32, 3)).astype(np.float32)
        teacher = rng.normal(size=(b, t, SCFG.projection_dim)).astype(np.float32)
        y = (rng.random((b, SCLASSES)) < 0.3).astype(np.float32)

        state, loss = step(state, jnp.asarray(pixels), jnp.asarray(teacher),
                           jnp.asarray(y))
        jl.append(float(loss))

        opt.zero_grad()
        loss_t = torch_losses_fn(pixels, teacher, y)
        loss_t.backward()
        opt.step()
        tl.append(loss_t.detach().item())

    np.testing.assert_allclose(jl, tl, rtol=5e-4, atol=5e-5)
    assert jl[-1] != jl[0]
