"""THE parity test: reference torch UNet/VAE with random weights ->
checkpoint importer -> our flax models. Outputs must match numerically.

This validates simultaneously (a) the architecture re-implementation and
(b) the torch->flax key mapping, without needing the released multi-GB
checkpoints (SURVEY §7 stage 4 parity, done with random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL
from vgen_tpu.utils.ckpt import (remap_state_dict, translate_unet,
                                 translate_vae)

from .ref_loader import load_ref_autoencoder, load_ref_unet_t2v

torch.manual_seed(0)

# context_dim must be 1024: the reference decoder hardcodes context_dim=1024
# in its SpatialTransformers (unet_t2v.py:184) — any other value crashes the
# reference itself. All shipped configs use 1024.
UNET_CFG = dict(in_dim=4, dim=32, y_dim=1024, context_dim=1024, out_dim=4,
                dim_mult=[1, 2], num_heads=2, head_dim=16, num_res_blocks=1,
                attn_scales=[1.0, 0.5], dropout=0.0, temporal_attention=True,
                use_checkpoint=False, use_fps_condition=True)


def j(x):
    return jnp.asarray(x.detach().numpy())


@pytest.fixture(scope="module")
def unet_pair():
    refmod = load_ref_unet_t2v()
    ref = refmod.UNetSD_T2VBase(**UNET_CFG).eval()

    mine = MODEL.build(dict(UNET_CFG, type="UNetSD_T2VBase"))
    x = jnp.zeros((1, 2, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 7, 1024))
    params = mine.init(jax.random.PRNGKey(0), x, t, y=y)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_unet, "unet", strict=True)
    return ref, mine, params


def test_unet_key_coverage(unet_pair):
    """Every flax leaf mapped (strict=True in fixture) and every torch key
    consumed."""
    ref, mine, params = unet_pair
    sd = ref.state_dict()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = set()
    for path, _ in flat:
        segs = [p.key for p in path]
        if segs[0] == "params":
            segs = segs[1:]
        mapped.add(translate_unet(segs))
    unused = set(sd.keys()) - mapped
    assert not unused, f"torch keys not consumed: {sorted(unused)[:8]}"


@pytest.mark.slow
def test_unet_forward_parity(unet_pair):
    ref, mine, params = unet_pair
    rng = np.random.RandomState(0)
    b, f, h, w = 2, 4, 16, 16
    x = rng.randn(b, 4, f, h, w).astype(np.float32)   # torch layout
    t = np.array([3, 500])
    y = rng.randn(b, 7, 1024).astype(np.float32)
    fps = np.array([8, 8])

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      y=torch.from_numpy(y), fps=torch.from_numpy(fps))

    x_j = jnp.asarray(x.transpose(0, 2, 3, 4, 1))     # [b,f,h,w,c]
    out = mine.apply(params, x_j, jnp.asarray(t), y=jnp.asarray(y),
                     fps=jnp.asarray(fps))
    out_t = np.asarray(out).transpose(0, 4, 1, 2, 3)  # back to torch layout
    np.testing.assert_allclose(out_t, ref_out.numpy(), rtol=2e-3, atol=2e-3)


def test_unet_unconditional_parity(unet_pair):
    ref, mine, params = unet_pair
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 2, 16, 16).astype(np.float32)
    t = np.array([10])
    zero_y = rng.randn(1, 7, 1024).astype(np.float32)

    with torch.no_grad():
        ref.zero_y = torch.from_numpy(zero_y)
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t), y=None)

    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                     jnp.asarray(t), y=None, zero_y=jnp.asarray(zero_y))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3),
                               ref_out.numpy(), rtol=2e-3, atol=2e-3)


VAE_DD = {"double_z": True, "z_channels": 4, "resolution": 64,
          "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": [1, 2],
          "num_res_blocks": 1, "attn_resolutions": [], "dropout": 0.0}


def test_vae_parity():
    refmod = load_ref_autoencoder()
    ref = refmod.AutoencoderKL(ddconfig=dict(VAE_DD), embed_dim=4,
                               pretrained=None).eval()

    from vgen_tpu.core import AUTO_ENCODER
    ae = AUTO_ENCODER.build({"type": "AutoencoderKL", "ddconfig": VAE_DD,
                             "embed_dim": 4})
    ae.init_random(jax.random.PRNGKey(0), image_size=32)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    ae.params = remap_state_dict(ae.params, sd, translate_vae, "vae",
                                 strict=True)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments_ref = ref.quant_conv(ref.encoder(torch.from_numpy(x)))
    moments = ae.module.apply(ae.params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                              method="encode_moments")
    np.testing.assert_allclose(np.asarray(moments).transpose(0, 3, 1, 2),
                               moments_ref.numpy(), rtol=2e-3, atol=2e-3)

    z = rng.randn(2, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        dec_ref = ref.decode(torch.from_numpy(z))
    dec = ae.decode(jnp.asarray(z.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(dec).transpose(0, 3, 1, 2),
                               dec_ref.numpy(), rtol=2e-3, atol=2e-3)
