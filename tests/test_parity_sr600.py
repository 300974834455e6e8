"""Parity: reference torch UNetSD_SR600 (random weights) vs ours through
the checkpoint importer (FreeU boosts, Fourier filter, asymmetric
down/up padding)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL
from vgen_tpu.models.unet_sr600 import fourier_filter
from vgen_tpu.utils.ckpt import remap_state_dict, translate_unet

from .ref_loader import REF, _ensure_stub_registry, _ensure_stub_unet_deps, _load
import pytest

torch.manual_seed(0)

CFG = dict(in_dim=4, dim=32, y_dim=64, context_dim=1024, out_dim=4,
           dim_mult=[1, 2], num_heads=2, head_dim=16, num_res_blocks=1,
           attn_scales=[1.0], use_scale_shift_norm=True, dropout=0.0,
           temporal_attention=True, use_checkpoint=False)


def load_ref_sr600():
    _ensure_stub_registry()
    _ensure_stub_unet_deps()
    # Fourier_filter calls .cuda() on its mask (unet_sr600.py:38)
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    pkg = types.ModuleType("refunet")
    pkg.__path__ = [f"{REF}/tools/modules/unet"]
    sys.modules.setdefault("refunet", pkg)
    if "refunet.util" not in sys.modules:
        _load("refunet.util", f"{REF}/tools/modules/unet/util.py",
              package="refunet")
    return _load("refunet.unet_sr600",
                 f"{REF}/tools/modules/unet/unet_sr600.py", package="refunet")


def test_fourier_filter_matches():
    refmod = load_ref_sr600()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 12, 6).astype(np.float32)  # NHWC
    mine = fourier_filter(jnp.asarray(x), threshold=1, scale=0.6)
    ref = refmod.Fourier_filter(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                threshold=1, scale=0.6)
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 3, 1, 2),
                               ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sr600_forward_parity():
    refmod = load_ref_sr600()
    ref = refmod.UNetSD_SR600(**CFG).eval()
    mine = MODEL.build(dict(CFG, type="UNetSD_SR600"))

    b, f, h, w = 1, 2, 16, 16
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 1024))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "sr600",
                              strict=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_unet([p.key for p in path][1:]) for path, _ in flat}
    assert not (set(sd.keys()) - mapped)

    rng = np.random.RandomState(1)
    x = rng.randn(b, 4, f, h, w).astype(np.float32)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    t = np.array([321])
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(y))
    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(t), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=3e-3, atol=3e-3)


@pytest.mark.slow
def test_sr600_odd_even_shapes():
    """SR600 down-pad/up-trim keeps spatial dims through the UNet for the
    even heights the 720p path uses (88 and 90 latents)."""
    mine = MODEL.build(dict(CFG, type="UNetSD_SR600"))
    for h, w in [(16, 20), (22, 40)]:
        x = jnp.zeros((1, 2, h, w, 4))
        t = jnp.zeros((1,), jnp.int32)
        y = jnp.zeros((1, 7, 1024))
        params = mine.init(jax.random.PRNGKey(0), x, t, y)
        out = mine.apply(params, x, t, y)
        assert out.shape == (1, 2, h, w, 4), (h, w, out.shape)
