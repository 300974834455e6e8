"""Full-stack fixed-noise parity: reference torch UNetSD_T2VBase +
DiffusionDDIM.ddim_sample_loop (with CFG) vs our UNet (weights through
the checkpoint importer) + scan'd DDIM loop. Same x_T, same text
embeddings -> final latents must match. This is the 'noise oracle'
integration test from SURVEY.md §7 (deterministic DDIM needs no
per-step noise, so only x_T has to be shared)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL
from vgen_tpu.diffusion.ddim import DiffusionDDIM
from vgen_tpu.utils.ckpt import remap_state_dict, translate_unet

from .ref_loader import load_ref_ddim, load_ref_unet_t2v

torch.manual_seed(0)

UNET = dict(in_dim=4, dim=32, y_dim=48, context_dim=1024, out_dim=4,
            dim_mult=[1, 2], num_heads=2, head_dim=16, num_res_blocks=1,
            attn_scales=[1.0], dropout=0.0, temporal_attention=True,
            use_checkpoint=False)
SCHED = dict(schedule="linear_sd",
             schedule_param={"num_timesteps": 100, "init_beta": 0.00085,
                             "last_beta": 0.0120,
                             "zero_terminal_snr": False},
             mean_type="eps", var_type="fixed_small", loss_type="mse",
             noise_strength=0.0)


def test_e2e_ddim_cfg_parity():
    ref_unet_mod = load_ref_unet_t2v()
    ref_ddim_mod = load_ref_ddim()
    ref = ref_unet_mod.UNetSD_T2VBase(**UNET).eval()
    ref_diff = ref_ddim_mod.DiffusionDDIM(**SCHED)

    mine = MODEL.build(dict(UNET, type="UNetSD_T2VBase"))
    diff = DiffusionDDIM(**SCHED)

    b, f, h, w = 1, 2, 16, 16
    x0j = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    rng = np.random.RandomState(0)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    zero_y = rng.randn(b, 7, 1024).astype(np.float32)
    params = mine.init(jax.random.PRNGKey(0), x0j, t0, y=jnp.asarray(y))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "e2e", strict=True)

    xt = rng.randn(b, 4, f, h, w).astype(np.float32)
    gs = 5.0
    steps = 10

    with torch.no_grad():
        ref_out = ref_diff.ddim_sample_loop(
            noise=torch.from_numpy(xt), model=ref,
            model_kwargs=[{"y": torch.from_numpy(y)},
                          {"y": torch.from_numpy(zero_y)}],
            guide_scale=gs, ddim_timesteps=steps)

    yj, zj = jnp.asarray(y), jnp.asarray(zero_y)

    def model_fn(x, t):
        tb = jnp.broadcast_to(t, (x.shape[0],)) if t.ndim == 0 else t
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([tb, tb], axis=0)
        ctx = jnp.concatenate([yj, zj], axis=0)
        out = mine.apply(params, x2, t2, y=ctx)
        y_out, u_out = jnp.split(out, 2, axis=0)
        return diff.classifier_free_guidance(y_out, u_out, gs)

    noise_j = jnp.asarray(xt.transpose(0, 2, 3, 4, 1))
    out = diff.ddim_sample_loop(jax.random.PRNGKey(1), noise_j, model_fn,
                                ddim_timesteps=steps)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=2e-2, atol=2e-2)
    # and they should be meaningfully non-trivial
    assert float(jnp.abs(out).mean()) > 0.05


def test_e2e_ddim_cfg_parity_fused_interpret(monkeypatch):
    """Same fixed-noise CFG-DDIM chain, but through the EXACT code path
    the TPU headline number rides on: bf16 model + fused-TT dispatch
    (Pallas interpreter on CPU). Asserts the fused kernel really ran
    (dispatch can silently fall back) and that the final latents still
    match the torch reference at a bf16-wide tolerance (VERDICT r4 #4).
    """
    from vgen_tpu.models import blocks
    from vgen_tpu.ops import fused_tt

    ref_unet_mod = load_ref_unet_t2v()
    ref_ddim_mod = load_ref_ddim()
    # head_dim 16 is not fusable (dispatch requires lane-aligned heads);
    # use the model zoo's head_dim 64 at a tiny width
    unet = dict(UNET, dim=64, num_heads=1, head_dim=64)
    ref = ref_unet_mod.UNetSD_T2VBase(**unet).eval()
    ref_diff = ref_ddim_mod.DiffusionDDIM(**SCHED)

    mine = MODEL.build(dict(unet, type="UNetSD_T2VBase"), dtype=jnp.bfloat16)
    diff = DiffusionDDIM(**SCHED)

    b, f, h, w = 1, 2, 16, 16
    x0j = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    rng = np.random.RandomState(7)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    zero_y = rng.randn(b, 7, 1024).astype(np.float32)
    params = mine.init(jax.random.PRNGKey(0), x0j, t0, y=jnp.asarray(y))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "e2e", strict=True)

    xt = rng.randn(b, 4, f, h, w).astype(np.float32)
    gs, steps = 5.0, 10

    with torch.no_grad():
        ref_out = ref_diff.ddim_sample_loop(
            noise=torch.from_numpy(xt), model=ref,
            model_kwargs=[{"y": torch.from_numpy(y)},
                          {"y": torch.from_numpy(zero_y)}],
            guide_scale=gs, ddim_timesteps=steps)

    hits = []
    real_inner = fused_tt.fused_tt_inner

    def counting_inner(*a, **k):
        hits.append(1)
        return real_inner(*a, **k)

    monkeypatch.setattr(fused_tt, "fused_tt_inner", counting_inner)
    monkeypatch.setattr(blocks, "FUSED_TT", "interpret")

    yj, zj = jnp.asarray(y), jnp.asarray(zero_y)

    def model_fn(x, t):
        tb = jnp.broadcast_to(t, (x.shape[0],)) if t.ndim == 0 else t
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([tb, tb], axis=0)
        ctx = jnp.concatenate([yj, zj], axis=0)
        out = mine.apply(params, x2, t2, y=ctx)
        y_out, u_out = jnp.split(out, 2, axis=0)
        return diff.classifier_free_guidance(y_out, u_out, gs)

    noise_j = jnp.asarray(xt.transpose(0, 2, 3, 4, 1))
    out = diff.ddim_sample_loop(jax.random.PRNGKey(1), noise_j, model_fn,
                                ddim_timesteps=steps)
    assert hits, "fused dispatch never fired — gate regressed"
    got = np.asarray(out, np.float32).transpose(0, 4, 1, 2, 3)
    want = ref_out.numpy()
    # bf16 compute + 10 chained steps: wider bound than the f32 test
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 0.1, f"rel err {rel}"
    assert float(jnp.abs(out).mean()) > 0.05


@pytest.mark.slow
def test_e2e_ddim_parity_fused_tconv_interpret(monkeypatch):
    """Fixed-noise DDIM chain through the fused-TemporalConvBlock dispatch
    (ops/fused_tconv.py, Pallas interpreter on CPU) vs the torch
    reference. The tconv gate only admits the model zoo's real widths
    (c in {320, 640}), so this runs a dim=320 single-level UNet at a tiny
    spatial grid — the kernel sees the exact channel width the headline
    records ride on. Asserts the dispatch actually fired (VERDICT r4 #4,
    extended to the r5 tconv kernel)."""
    from vgen_tpu.models import blocks
    from vgen_tpu.ops import fused_tconv

    ref_unet_mod = load_ref_unet_t2v()
    ref_ddim_mod = load_ref_ddim()
    unet = dict(UNET, dim=320, dim_mult=[1], num_heads=5, head_dim=64)
    ref = ref_unet_mod.UNetSD_T2VBase(**unet).eval()
    ref_diff = ref_ddim_mod.DiffusionDDIM(**SCHED)

    mine = MODEL.build(dict(unet, type="UNetSD_T2VBase"), dtype=jnp.bfloat16)
    diff = DiffusionDDIM(**SCHED)

    b, f, h, w = 1, 2, 8, 8
    x0j = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    rng = np.random.RandomState(11)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    params = mine.init(jax.random.PRNGKey(0), x0j, t0, y=jnp.asarray(y))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "e2e", strict=True)

    xt = rng.randn(b, 4, f, h, w).astype(np.float32)
    steps = 3

    with torch.no_grad():
        ref_out = ref_diff.ddim_sample_loop(
            noise=torch.from_numpy(xt), model=ref,
            model_kwargs={"y": torch.from_numpy(y)},
            ddim_timesteps=steps)

    hits = []
    real_chain = fused_tconv.fused_temporal_conv_chain

    def counting_chain(*a, **k):
        hits.append(1)
        return real_chain(*a, **k)

    monkeypatch.setattr(fused_tconv, "fused_temporal_conv_chain",
                        counting_chain)
    # route ONLY the tconv kernel through interpret (the TT kernel's gate
    # keys on the same-named flag pair; keep it off so this test isolates
    # the tconv path)
    monkeypatch.setattr(blocks, "FUSED_TCONV", "interpret")
    monkeypatch.setattr(blocks, "FUSED_TT", "off")

    yj = jnp.asarray(y)

    def model_fn(x, t):
        tb = jnp.broadcast_to(t, (x.shape[0],)) if t.ndim == 0 else t
        return mine.apply(params, x, tb, y=yj)

    noise_j = jnp.asarray(xt.transpose(0, 2, 3, 4, 1))
    out = diff.ddim_sample_loop(jax.random.PRNGKey(1), noise_j, model_fn,
                                ddim_timesteps=steps)
    assert hits, "fused tconv dispatch never fired — gate regressed"
    got = np.asarray(out, np.float32).transpose(0, 4, 1, 2, 3)
    want = ref_out.numpy()
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert rel < 0.1, f"rel err {rel}"
    assert float(jnp.abs(out).mean()) > 0.05
