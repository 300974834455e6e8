"""Parity: reference torch UNetSD_I2VGen (random weights) vs ours through
the checkpoint importer; plus adaptive pooling golden vs torch."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL
from vgen_tpu.models.unet_i2vgen import adaptive_avg_pool2d
from vgen_tpu.utils.ckpt import remap_state_dict, translate_unet

from .ref_loader import REF, _ensure_stub_registry, _ensure_stub_unet_deps, _load

torch.manual_seed(0)

CFG = dict(in_dim=4, dim=32, y_dim=48, context_dim=1024, concat_dim=4,
           out_dim=4, dim_mult=[1, 2], num_heads=2, head_dim=16,
           num_res_blocks=1, attn_scales=[1.0], dropout=0.0,
           temporal_attention=True, use_checkpoint=False, num_tokens=4,
           default_fps=8)


def load_ref_i2vgen():
    _ensure_stub_registry()
    _ensure_stub_unet_deps()
    pkg = types.ModuleType("refunet")
    pkg.__path__ = [f"{REF}/tools/modules/unet"]
    sys.modules.setdefault("refunet", pkg)
    if "refunet.util" not in sys.modules:
        _load("refunet.util", f"{REF}/tools/modules/unet/util.py",
              package="refunet")
    return _load("refunet.unet_i2vgen",
                 f"{REF}/tools/modules/unet/unet_i2vgen.py", package="refunet")


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.RandomState(0)
    for (h, w) in [(32, 32), (88, 160), (33, 57)]:
        x = rng.randn(2, h, w, 3).astype(np.float32)
        mine = adaptive_avg_pool2d(jnp.asarray(x), (32, 32))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (32, 32))
        np.testing.assert_allclose(np.asarray(mine).transpose(0, 3, 1, 2),
                                   ref.numpy(), rtol=1e-5, atol=1e-5,
                                   err_msg=f"{h}x{w}")


@pytest.mark.slow
def test_i2vgen_forward_parity():
    refmod = load_ref_i2vgen()
    # reference forward unconditionally calls .cuda() on the position
    # masks (:283) — patch torch.Tensor.cuda to identity on CPU
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self

    ref = refmod.UNetSD_I2VGen(**CFG).eval()
    mine = MODEL.build(dict(CFG, type="UNetSD_I2VGen"))

    b, f, h, w = 1, 4, 16, 16
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 1024))
    li0 = jnp.zeros((b, 1, h, w, 4))
    im0 = jnp.zeros((b, CFG["y_dim"]))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y=y0, image=im0,
                       local_image=li0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "i2vgen",
                              strict=True)

    # full coverage both ways
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_unet([p.key for p in path][1:]) for path, _ in flat}
    unused = set(sd.keys()) - mapped
    assert not unused, f"torch keys not consumed: {sorted(unused)[:8]}"

    rng = np.random.RandomState(1)
    x = rng.randn(b, 4, f, h, w).astype(np.float32)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    local = rng.randn(b, 4, 1, h, w).astype(np.float32)
    image = rng.randn(b, CFG["y_dim"]).astype(np.float32)
    t = np.array([42])
    fps = np.array([8])

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      y=torch.from_numpy(y), image=torch.from_numpy(image),
                      local_image=torch.from_numpy(local),
                      fps=torch.from_numpy(fps))

    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(t), y=jnp.asarray(y),
                     image=jnp.asarray(image),
                     local_image=jnp.asarray(local.transpose(0, 2, 3, 4, 1)),
                     fps=jnp.asarray(fps))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=3e-3, atol=3e-3)
