"""Parity: reference torch UNetSD_TFT2V (random weights) vs ours through
the checkpoint importer, with depth/sketch/local_image/image conditions."""

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

COMPS = ["text", "depthmap", "sketch", "local_image", "image", "mask",
         "motion", "canny", "single_sketch"]
CFG = dict(in_dim=4, dim=32, y_dim=48, context_dim=1024, concat_dim=8,
           out_dim=4, dim_mult=[1, 2], num_heads=2, head_dim=16,
           num_res_blocks=1, attn_scales=[1.0], dropout=0.0,
           temporal_attention=True, use_checkpoint=False, num_tokens=4,
           misc_dropout=0.5, training=False)
RES = [32, 32]


def load_ref_tft2v():
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
    return _load("refunet.unet_tf2tv",
                 f"{REF}/tools/modules/unet/unet_tf2tv.py", package="refunet")


class _Cfg:
    video_compositions = COMPS
    resolution = RES


@pytest.mark.slow
def test_tft2v_forward_parity():
    refmod = load_ref_tft2v()
    ref = refmod.UNetSD_TFT2V(config=_Cfg(), **CFG).eval()

    mine = MODEL.build(dict(CFG, type="UNetSD_TFT2V",
                            video_compositions=COMPS, resolution=RES))
    b, f, h, w = 1, 2, 4, 4  # latent 4x4 for pixel 32x32
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 1024))
    px = (b, f, RES[1], RES[0])
    cond0 = dict(depth=jnp.zeros(px + (1,)), sketch=jnp.zeros(px + (1,)),
                 local_image=jnp.zeros(px + (3,)), masked=jnp.zeros(px + (4,)),
                 motion=jnp.zeros(px + (2,)), canny=jnp.zeros(px + (1,)),
                 single_sketch=jnp.zeros(px + (1,)),
                 image=jnp.zeros((b, 1, 1024)))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y=y0, **cond0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "tft2v",
                              strict=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_unet([p.key for p in path][1:]) for path, _ in flat}
    unused = set(sd.keys()) - mapped
    assert not unused, f"unused torch keys: {sorted(unused)[:8]}"

    rng = np.random.RandomState(1)
    x = rng.randn(b, 4, f, h, w).astype(np.float32)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    t = np.array([17])
    conds_t = {
        "depth": rng.randn(b, 1, f, RES[1], RES[0]).astype(np.float32),
        "sketch": rng.randn(b, 1, f, RES[1], RES[0]).astype(np.float32),
        "local_image": rng.randn(b, 3, f, RES[1], RES[0]).astype(np.float32),
        "image": rng.randn(b, 1, 1024).astype(np.float32),
    }
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      y=torch.from_numpy(y),
                      **{k: torch.from_numpy(v) for k, v in conds_t.items()})

    conds_j = {k: jnp.asarray(v.transpose(0, 2, 3, 4, 1))
               for k, v in conds_t.items() if v.ndim == 5}
    conds_j["image"] = jnp.asarray(conds_t["image"])
    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(t), y=jnp.asarray(y), **conds_j)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=3e-3, atol=3e-3)
