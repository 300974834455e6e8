"""Parity: reference torch UNetSD_DreamVideo (random weights) vs ours
through the checkpoint importer, with spatial+temporal adapters active
and a CLIP-image adapter condition (incl. adapter_condition_lam)."""

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
           use_checkpoint=False, training=False,
           spatial_adapter_list=["self_attention", "cross_attention",
                                 "feedforward"],
           spatial_adapter_position_list=["parallel", "parallel", "parallel"],
           spatial_adapter_hidden_dim=8,
           temporal_adapter_list=["self_attention", "feedforward"],
           temporal_adapter_position_list=["parallel", "parallel",
                                           "parallel"],
           temporal_adapter_condition_dim=1024,
           temporal_adapter_hidden_dim=8)


def load_ref_dreamvideo():
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
    return _load("refunet.unet_dreamvideo",
                 f"{REF}/tools/modules/unet/unet_dreamvideo.py",
                 package="refunet")


@pytest.mark.slow
def test_dreamvideo_forward_parity():
    refmod = load_ref_dreamvideo()
    ref = refmod.UNetSD_DreamVideo(**CFG).eval()
    mine = MODEL.build(dict(CFG, type="UNetSD_DreamVideo"))

    b, f, h, w = 1, 4, 16, 16
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 1024))
    ac0 = jnp.zeros((b, 1024))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y=y0,
                       adapter_condition=ac0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "dreamvideo",
                              strict=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_unet([p.key for p in path][1:]) for path, _ in flat}
    unused = set(sd.keys()) - mapped
    assert not unused, f"unused torch keys: {sorted(unused)[:8]}"

    rng = np.random.RandomState(1)
    x = rng.randn(b, 4, f, h, w).astype(np.float32)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    ac = rng.randn(b, 1, 1024).astype(np.float32)  # ref y_image [b,1,dim]
    t = np.array([123])

    for lam in (1.0, 0.35):
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                          y=torch.from_numpy(y),
                          y_image=torch.from_numpy(ac), ag_strength=lam)
        out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                         jnp.asarray(t), y=jnp.asarray(y),
                         adapter_condition=jnp.asarray(ac[:, 0]),
                         adapter_condition_lam=lam)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3), ref_out.numpy(),
            rtol=3e-3, atol=3e-3,
            err_msg=f"DreamVideo parity failed at ag_strength={lam}")


@pytest.mark.slow
def test_dreamvideo_adapter_zero_init_identity():
    """With FRESH adapters (zero-init up projections) the model must
    equal the ADAPTER-FREE backbone sharing the same weights (reference
    zero-init, util.py:516-518) — and be condition-independent."""
    base_cfg = {k: v for k, v in CFG.items()
                if not k.startswith(("spatial_adapter", "temporal_adapter"))}
    mine = MODEL.build(dict(CFG, type="UNetSD_DreamVideo"))
    backbone = MODEL.build(dict(base_cfg, type="UNetSD_DreamVideo"))

    b, f, h, w = 1, 2, 16, 16
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 1024))
    ac0 = jnp.zeros((b, 1024))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y=y0,
                       adapter_condition=ac0)
    bb_params = backbone.init(jax.random.PRNGKey(1), x0, t0, y=y0)

    # graft the shared-backbone weights from the adapter model into the
    # adapter-free tree (adapter-only leaves have no counterpart)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_b, treedef_b = jax.tree_util.tree_flatten_with_path(bb_params)
    leaves = []
    for path, leaf in flat_b:
        assert path in flat_a, f"backbone leaf missing in adapter tree: {path}"
        leaves.append(flat_a[path])
    bb_params = jax.tree_util.tree_unflatten(treedef_b, leaves)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, f, h, w, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(b, 7, 1024).astype(np.float32))
    ac = jnp.asarray(rng.randn(b, 1024).astype(np.float32))
    t = jnp.asarray([7])

    out_cond = mine.apply(params, x, t, y=y, adapter_condition=ac,
                          adapter_condition_lam=1.0)
    out_nocond = mine.apply(params, x, t, y=y)
    out_backbone = backbone.apply(bb_params, x, t, y=y)
    np.testing.assert_allclose(np.asarray(out_cond), np.asarray(out_nocond),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_cond),
                               np.asarray(out_backbone),
                               rtol=1e-5, atol=1e-5)
