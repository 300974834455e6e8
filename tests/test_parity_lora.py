"""Parity: reference torch UNetSD_LoRA (random weights) vs our
UNetSD_T2VBase+use_lora through the checkpoint importer."""

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

CFG = dict(in_dim=4, dim=32, y_dim=48, context_dim=1024, out_dim=4,
           dim_mult=[1, 2], num_heads=2, head_dim=16, num_res_blocks=1,
           attn_scales=[1.0], dropout=0.0, temporal_attention=True,
           use_checkpoint=False, use_lora=True, lora_rank=4)


def load_ref_lora():
    _ensure_stub_registry()
    _ensure_stub_unet_deps()
    pkg = types.ModuleType("refunet")
    pkg.__path__ = [f"{REF}/tools/modules/unet"]
    sys.modules.setdefault("refunet", pkg)
    if "refunet.util" not in sys.modules:
        _load("refunet.util", f"{REF}/tools/modules/unet/util.py",
              package="refunet")
    return _load("refunet.unet_lora",
                 f"{REF}/tools/modules/unet/unet_lora.py", package="refunet")


def test_lora_forward_parity():
    refmod = load_ref_lora()
    ref = refmod.UNetSD_LoRA(**CFG).eval()
    mine = MODEL.build(dict(CFG, type="UNetSD_LoRA"))

    b, f, h, w = 1, 2, 16, 16
    x0 = jnp.zeros((b, f, h, w, 4))
    t0 = jnp.zeros((b,), jnp.int32)
    y0 = jnp.zeros((b, 7, 1024))
    params = mine.init(jax.random.PRNGKey(0), x0, t0, y=y0)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "lora", strict=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_unet([p.key for p in path][1:]) for path, _ in flat}
    unused = set(sd.keys()) - mapped
    assert not unused, f"unused torch keys: {sorted(unused)[:8]}"

    rng = np.random.RandomState(1)
    x = rng.randn(b, 4, f, h, w).astype(np.float32)
    y = rng.randn(b, 7, 1024).astype(np.float32)
    t = np.array([77])
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(y))
    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(t), y=jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=3e-3, atol=3e-3)


def test_lora_zero_init_is_identity():
    """At init the LoRA branches are zero => output equals the base
    (non-LoRA) model with the same base weights."""
    mine_lora = MODEL.build(dict(CFG, type="UNetSD_LoRA"))
    mine_base = MODEL.build(dict(CFG, type="UNetSD_T2VBase", use_lora=False))
    b, f, h, w = 1, 2, 16, 16
    x = jnp.asarray(np.random.RandomState(2).randn(b, f, h, w, 4),
                    jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 7, 1024))
    p_lora = mine_lora.init(jax.random.PRNGKey(0), x, t, y=y)
    p_base = mine_base.init(jax.random.PRNGKey(0), x, t, y=y)
    # same seed -> identical base weights (lora params extra)
    o1 = mine_lora.apply(p_lora, x, t, y=y)
    o2 = mine_base.apply(p_base, x, t, y=y)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
