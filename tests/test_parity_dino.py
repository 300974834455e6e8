"""DINO ViT-S/16 random-weight parity vs the reference's vendored DINO
(reference metric/dino/vision_transformer.py:vit_small) — the feature
extractor behind the DreamVideo DINO-I metric
(metric/cal_metric_DreamVideo.py).

Same treatment as the UNets: strict key coverage through the torch
importer + forward parity on random weights/inputs.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vgen_tpu.models.dino import DINOViT, translate_dino
from vgen_tpu.utils.ckpt import remap_state_dict

REF = "/root/reference"


def _load(name, path, package=None):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    if package:
        mod.__package__ = package
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dino_pair():
    # vision_transformer.py does `from .utils import trunc_normal_` —
    # give it a real package parent with the reference utils module
    pkg = types.ModuleType("refdino")
    pkg.__path__ = [f"{REF}/metric/dino"]
    sys.modules["refdino"] = pkg
    _load("refdino.utils", f"{REF}/metric/dino/utils.py", "refdino")
    vt = _load("refdino.vision_transformer",
               f"{REF}/metric/dino/vision_transformer.py", "refdino")

    torch.manual_seed(0)
    ref = vt.vit_small(patch_size=16).eval()

    mine = DINOViT()
    params = mine.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_dino, "dino",
                              strict=True)
    return ref, mine, params, sd


def test_dino_key_coverage(dino_pair):
    """strict=True in the fixture proves every flax leaf mapped; here:
    every torch key consumed (no silently-dropped weights)."""
    ref, mine, params, sd = dino_pair
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = set()
    for path, _ in flat:
        segs = [p.key for p in path]
        if segs[0] == "params":
            segs = segs[1:]
        mapped.add(translate_dino(segs))
    unused = set(sd.keys()) - mapped
    assert not unused, f"torch keys not consumed: {sorted(unused)[:8]}"


@pytest.mark.slow
def test_dino_forward_parity(dino_pair):
    """cls features must match the reference on random weights+input."""
    ref, mine, params, _ = dino_pair
    rng = np.random.RandomState(1)
    x = rng.randn(2, 224, 224, 3).astype(np.float32) * 0.5

    with torch.no_grad():
        # reference takes NCHW
        theirs = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(mine.apply(params, jnp.asarray(x)))
    assert ours.shape == theirs.shape == (2, 384)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
