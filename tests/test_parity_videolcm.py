"""Parity: reference torch UNetSD_VideoLCM (random weights) vs ours
through the checkpoint importer, including the t_w guidance-scale
plumbing (whose addition into the timestep embedding is disabled in the
reference, unet_videolcm.py:713-714)."""

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

torch.manual_seed(0)

COMPS = ["text", "image"]
CFG = dict(in_dim=4, dim=32, y_dim=48, context_dim=1024, concat_dim=8,
           out_dim=4, dim_mult=[1, 2], num_heads=2, head_dim=16,
           num_res_blocks=1, attn_scales=[1.0], dropout=0.0,
           temporal_attention=True, use_checkpoint=False, num_tokens=4,
           misc_dropout=0.5, training=False)
RES = [32, 32]


def load_ref_videolcm():
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
    return _load("refunet.unet_videolcm",
                 f"{REF}/tools/modules/unet/unet_videolcm.py",
                 package="refunet")


class _Cfg:
    video_compositions = COMPS
    resolution = RES


def test_videolcm_forward_parity():
    refmod = load_ref_videolcm()
    ref = refmod.UNetSD_VideoLCM(config=_Cfg(), **CFG).eval()

    mine = MODEL.build(dict(CFG, type="UNetSD_VideoLCM",
                            video_compositions=COMPS, resolution=RES))
    b, f, h, w = 1, 2, 4, 4
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 1024))
    tw0 = jnp.zeros((b,))
    img0 = jnp.zeros((b, 1, 1024))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y=y0, image=img0,
                       t_w=tw0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    # The reference's time_embed_w is commented out (unet_videolcm.py:
    # 278-283), so our guidance_embedding leaves — kept so trained LCM
    # students can store w-conditioning — are the ONLY ones allowed to
    # stay at init.
    params = remap_state_dict(params, sd, translate_unet, "videolcm",
                              strict=False)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    unmatched = []
    for path, _ in flat:
        segs = [p.key for p in path][1:]
        tkey = translate_unet(segs)
        if tkey is None or tkey not in sd:
            unmatched.append(".".join(segs))
    assert all("guidance_embedding" in k for k in unmatched), unmatched
    mapped = {translate_unet([p.key for p in path][1:]) for path, _ in flat}
    unused = set(sd.keys()) - mapped
    assert not unused, f"unused torch keys: {sorted(unused)[:8]}"

    rng = np.random.RandomState(1)
    x = rng.randn(b, 4, f, h, w).astype(np.float32)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    img = rng.randn(b, 1, 1024).astype(np.float32)
    t = np.array([421])
    t_w = np.full((b,), 7.5, np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      t_w=torch.from_numpy(t_w), y=torch.from_numpy(y),
                      image=torch.from_numpy(img))
    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(t), t_w=jnp.asarray(t_w),
                     y=jnp.asarray(y), image=jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=3e-3, atol=3e-3)

    # t_w must be a no-op on the output (reference disables the add)
    out2 = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                      jnp.asarray(t), t_w=jnp.asarray(100.0 * t_w),
                      y=jnp.asarray(y), image=jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)
