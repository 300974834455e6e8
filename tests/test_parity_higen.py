"""Parity: reference torch UNetSD_HiGen (random weights) vs ours."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL
from vgen_tpu.utils.ckpt import remap_state_dict, translate_unet

from .ref_loader import REF, _ensure_stub_registry, _ensure_stub_unet_deps, _load
import pytest

torch.manual_seed(0)

CFG = dict(in_dim=4, dim=32, y_dim=48, context_dim=1024, out_dim=4,
           dim_mult=[1, 2], num_heads=2, head_dim=16, num_res_blocks=1,
           attn_scales=[1.0], dropout=0.0, temporal_attention=True,
           use_checkpoint=False, num_tokens=4, context_embedding_depth=2)


def load_ref_higen():
    _ensure_stub_registry()
    _ensure_stub_unet_deps()
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    pkg = types.ModuleType("refunet")
    pkg.__path__ = [f"{REF}/tools/modules/unet"]
    sys.modules.setdefault("refunet", pkg)
    if "refunet.util" not in sys.modules:
        _load("refunet.util", f"{REF}/tools/modules/unet/util.py",
              package="refunet")
    return _load("refunet.unet_higen",
                 f"{REF}/tools/modules/unet/unet_higen.py", package="refunet")


@pytest.mark.slow
def test_higen_forward_parity():
    refmod = load_ref_higen()
    ref = refmod.UNetSD_HiGen(**CFG).eval()
    mine = MODEL.build(dict(CFG, type="UNetSD_HiGen"))

    b, f, h, w = 1, 4, 16, 16
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 48))
    sp0 = jnp.zeros((b, h, w, 4))
    mc0 = jnp.zeros((b, f), jnp.int32)
    ac0 = jnp.zeros((b, f, 32))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y=y0, spat_prior=sp0,
                       motion_cond=mc0, appearance_cond=ac0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "higen",
                              strict=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_unet([p.key for p in path][1:]) for path, _ in flat}
    unused = set(sd.keys()) - mapped
    assert not unused, f"unused torch keys: {sorted(unused)[:8]}"

    rng = np.random.RandomState(1)
    x = rng.randn(b, 4, f, h, w).astype(np.float32)
    y = rng.randn(b, 7, 48).astype(np.float32)
    sp = rng.randn(b, 4, h, w).astype(np.float32)
    mc = np.array([[500, 500, 500, 500]])
    ac = rng.rand(b, f, 32).astype(np.float32)
    t = np.array([123])

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      y=torch.from_numpy(y),
                      spat_prior=torch.from_numpy(sp),
                      motion_cond=torch.from_numpy(mc),
                      appearance_cond=torch.from_numpy(ac))

    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(t), y=jnp.asarray(y),
                     spat_prior=jnp.asarray(sp.transpose(0, 2, 3, 1)),
                     motion_cond=jnp.asarray(mc),
                     appearance_cond=jnp.asarray(ac))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=3e-3, atol=3e-3)


@pytest.mark.slow
def test_higen_single_frame_temporal_noop():
    """Phase-1 (f=1): temporal blocks must be identity (WoImg semantics)."""
    mine = MODEL.build(dict(CFG, type="UNetSD_HiGen"))
    b, h, w = 1, 16, 16
    x = jnp.zeros((b, 1, h, w, 4))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 7, 48))
    ac = jnp.ones((b, 1, 32))
    mc = jnp.zeros((b, 1), jnp.int32)
    params = mine.init(jax.random.PRNGKey(0), x, t, y=y, motion_cond=mc,
                       appearance_cond=ac)
    out = mine.apply(params, x, t, y=y, motion_cond=mc, appearance_cond=ac)
    assert out.shape == (b, 1, h, w, 4)
    assert np.isfinite(np.asarray(out)).all()
