"""Parity: flax annotator nets vs the reference torch implementations
with random weights through the key translators."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import torch

import vgen_tpu  # noqa: F401
from vgen_tpu.data.annotator_keys import (translate_midas, translate_pidinet,
                                          translate_sketch_gan)
from vgen_tpu.models.annotator_nets import (MiDaS, PiDiNetConverted,
                                            SketchSimplification)
from vgen_tpu.utils.ckpt import remap_state_dict

from .ref_loader import REF, _load
import pytest

torch.manual_seed(0)


@pytest.mark.slow
def test_pidinet_parity():
    ref_mod = _load("ref_pidinet", f"{REF}/tools/annotator/sketch/pidinet.py")
    pdcs = ref_mod.config_model_converted("carv4")
    ref = ref_mod.PiDiNet(20, pdcs, dil=8, sa=True, convert=True).eval()

    mine = PiDiNetConverted(inplane=20, dil=8, sa=True)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = mine.init(jax.random.PRNGKey(0), x0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_pidinet, "pidinet",
                              strict=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_pidinet([p.key for p in path][1:])
              for path, _ in flat}
    assert not (set(sd.keys()) - mapped)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref_out.numpy(), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_sketch_gan_parity():
    ref_mod = _load("ref_sketch",
                    f"{REF}/tools/annotator/sketch/sketch_simplification.py")
    ref = ref_mod.SketchSimplification(mean=0.9664114577640158,
                                       std=0.0858381272736797).eval()
    mine = SketchSimplification()
    x0 = jnp.zeros((1, 32, 32, 1))
    params = mine.init(jax.random.PRNGKey(0), x0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_sketch_gan, "sketch",
                              strict=True)

    rng = np.random.RandomState(2)
    x = rng.rand(1, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref_out.numpy(), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_pidinet_sketch_pipeline(tmp_path):
    """End-to-end annotators.pidinet_sketch: synthetic torch checkpoints
    (raw pixel-difference weights, 'state_dict' nesting, 'module.'
    prefix) -> numpy fold -> flax forward vs the reference pipeline
    sketch = 1 - cleaner(1 - pidinet(norm(x)))."""
    from vgen_tpu.data import annotators

    ref_pidi_mod = _load("ref_pidinet2",
                         f"{REF}/tools/annotator/sketch/pidinet.py")
    ref_gan_mod = _load("ref_sketch2",
                        f"{REF}/tools/annotator/sketch/sketch_simplification.py")
    # raw (unconverted) pidinet, as shipped in table5_pidinet.pth
    raw = ref_pidi_mod.PiDiNet(60, ref_pidi_mod.config_model("carv4"),
                               dil=24, sa=True, convert=False)
    raw_sd = raw.state_dict()
    torch.save({"state_dict": {f"module.{k}": v for k, v in raw_sd.items()}},
               tmp_path / "pidi.pth")
    gan = ref_gan_mod.SketchSimplification(
        mean=0.9664114577640158, std=0.0858381272736797).eval()
    torch.save(gan.state_dict(), tmp_path / "gan.pth")

    # reference pipeline: converted pidinet + cleaner
    conv_sd = ref_pidi_mod.convert_pidinet(raw_sd, "carv4")
    ref_pidi = ref_pidi_mod.PiDiNet(
        60, ref_pidi_mod.config_model_converted("carv4"), dil=24, sa=True,
        convert=True).eval()
    ref_pidi.load_state_dict(conv_sd)

    rng = np.random.RandomState(4)
    frames_u8 = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    x = (frames_u8.astype(np.float32) / 255.0 - np.asarray(mean)) \
        / np.asarray(std)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).astype(np.float32))
    with torch.no_grad():
        ref_out = 1.0 - gan(1.0 - ref_pidi(xt))

    out = annotators.pidinet_sketch(
        frames_u8, (32, 32), weights_path=str(tmp_path / "pidi.pth"),
        cleaner_path=str(tmp_path / "gan.pth"))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref_out.numpy(),
                               rtol=3e-3, atol=3e-3)


@pytest.mark.slow
def test_midas_parity():
    ref_mod = _load("ref_depth", f"{REF}/tools/annotator/depth/__init__.py")
    ref = ref_mod.MiDaS(image_size=64, patch_size=16, dim=64,
                        neck_dims=[32, 32, 64, 64], fusion_dim=32,
                        num_heads=4, num_layers=4).eval()
    mine = MiDaS(image_size=64, patch_size=16, dim=64,
                 neck_dims=(32, 32, 64, 64), fusion_dim=32, num_heads=4,
                 num_layers=4)
    x0 = jnp.zeros((1, 64, 64, 3))
    params = mine.init(jax.random.PRNGKey(0), x0)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_midas, "midas",
                              strict=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = {translate_midas([p.key for p in path][1:]) for path, _ in flat}
    # the deepest fusion block's resConfUnit1 is constructed but never
    # called in the reference (fusion4 gets a single input) — dead weights
    unused = {k for k in set(sd.keys()) - mapped
              if not k.startswith("fusion4.layer1.")}
    assert not unused, sorted(unused)[:6]

    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    out = mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref_out.numpy(), rtol=5e-3, atol=5e-3)
