"""CLIP tests: BPE tokenizer golden vs the reference open_clip tokenizer
(loaded in isolation with ftfy stubbed), tower shape contracts."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vgen_tpu  # noqa: F401
from vgen_tpu.core import EMBEDDER
from vgen_tpu.models.clip import CLIPModule, SimpleTokenizer

REF_TOK = "/root/reference/utils/reward/open_clip/tokenizer.py"


def load_ref_tokenizer():
    if "ftfy" not in sys.modules:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    spec = importlib.util.spec_from_file_location("ref_tokenizer", REF_TOK)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_tokenizer"] = mod
    spec.loader.exec_module(mod)
    return mod


PROMPTS = [
    "A panda eating bamboo on a rock.",
    "a beautiful sunset over the ocean, 4k, cinematic",
    "Distorted, discontinuous, Ugly, blurry, low resolution, motionless, "
    "static, disfigured, disconnected limbs, Ugly faces, incomplete arms",
    "papers & citations: 100% (test-case)!",
    "",
]


def test_tokenizer_matches_reference():
    ref = load_ref_tokenizer()
    mine = SimpleTokenizer()
    theirs = ref.tokenize(PROMPTS).numpy()
    ours = mine(PROMPTS)
    np.testing.assert_array_equal(ours, theirs)


def test_tokenizer_truncation():
    mine = SimpleTokenizer()
    long = "word " * 200
    out = mine([long])
    assert out.shape == (1, 77)
    assert out[0, -1] == mine.eot


def test_text_tower_shapes_and_penultimate():
    m = CLIPModule(arch="ViT-H-14")
    tokens = jnp.zeros((2, 77), jnp.int32).at[:, 0].set(49406).at[:, 1].set(49407)
    shapes = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), tokens, None))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    # text tower of ViT-H-14 is ~354M params
    assert 3.0e8 < n < 4.5e8, n

    out = jax.eval_shape(
        lambda p: m.apply(p, tokens, 1, method="encode_text_hidden"), shapes)
    assert out.shape == (2, 77, 1024)
    pooled = jax.eval_shape(
        lambda p: m.apply(p, tokens, 1, method="encode_text_pooled"), shapes)
    assert pooled[0].shape == (2, 1024) and pooled[1].shape == (2, 77, 1024)


@pytest.mark.slow
def test_tiny_clip_end_to_end():
    """A scaled-down arch runs concretely: text + vision."""
    from vgen_tpu.models import clip as clipmod
    clipmod.ARCHS["tiny"] = dict(
        embed_dim=16,
        text=dict(width=32, heads=2, layers=2),
        vision=dict(width=32, heads=2, layers=2, patch=8, image_size=32))
    emb = EMBEDDER.build({"type": "FrozenOpenCLIPTextVisualEmbedder",
                          "arch": "tiny", "layer": "penultimate",
                          "vit_resolution": [32, 32],
                          "pretrained": None})
    emb.init_random(jax.random.PRNGKey(0))
    img = jnp.zeros((2, 32, 32, 3))
    xi, xt, x = emb(image=img, text=["hello world", "a cat"])
    assert xi.shape == (2, 16)
    assert xt.shape == (2, 16)
    assert x.shape == (2, 77, 32)
    assert np.isfinite(np.asarray(x)).all()


def test_causal_mask_effect():
    """Future tokens must not influence earlier positions."""
    from vgen_tpu.models import clip as clipmod
    clipmod.ARCHS.setdefault("tiny", dict(
        embed_dim=16,
        text=dict(width=32, heads=2, layers=2),
        vision=dict(width=32, heads=2, layers=2, patch=8, image_size=32)))
    emb = EMBEDDER.build({"type": "FrozenOpenCLIPEmbedder", "arch": "tiny",
                          "layer": "last", "pretrained": None})
    emb.init_random(jax.random.PRNGKey(0))
    t1 = jnp.zeros((1, 77), jnp.int32).at[:, :5].set(
        jnp.asarray([49406, 10, 20, 30, 49407]))
    t2 = t1.at[:, 50].set(99)  # change a late token
    o1 = np.asarray(emb(t1))
    o2 = np.asarray(emb(t2))
    np.testing.assert_allclose(o1[:, :5], o2[:, :5], atol=1e-5)
    assert not np.allclose(o1[:, 50], o2[:, 50], atol=1e-5)


def test_tokenizer_mojibake_repair():
    """_clean_text repairs UTF-8-as-latin1 mojibake like ftfy.fix_text
    (reference open_clip tokenizer.py), so malformed-unicode prompts
    tokenize identically to their well-formed spelling; well-formed
    accents are untouched."""
    from vgen_tpu.models.clip import _clean_text

    assert _clean_text("CafÃ© terrace at night") == "café terrace at night"
    # double-encoded mojibake also converges
    bad2 = "Café".encode("utf-8").decode("latin-1") \
        .encode("utf-8").decode("latin-1")
    assert _clean_text(bad2) == "café"
    # well-formed text is a no-op
    assert _clean_text("Café au lait") == "café au lait"
    assert _clean_text("a dog") == "a dog"
