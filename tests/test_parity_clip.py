"""CLIP tower parity: reference bundled open_clip (random weights) ->
``translate_clip`` importer -> our flax towers. Closes VERDICT r3 missing
#1 — the conditioning stack was the one reference-backed compute path
with no numerical oracle.

Oracle: /root/reference/utils/reward/open_clip/model.py (CLIP class) +
transformer.py, instantiated tiny on CPU torch. Covers:
  * text tower full-depth pooled embedding (CLIP.encode_text,
    model.py:232-245)
  * penultimate-layer token features — the conditioning actually fed to
    every UNet (reference clip_embedder.py:61-68 runs resblocks[:-1]
    then ln_final)
  * vision tower CLS embedding (VisionTransformer.forward,
    transformer.py:458-504: pool CLS -> ln_post -> proj)
  * strict both-way key coverage through translate_clip (utils/ckpt.py)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import vgen_tpu  # noqa: F401
from vgen_tpu.models.clip import ARCHS, CLIPModule
from vgen_tpu.utils.ckpt import remap_state_dict, translate_clip

from .ref_loader import load_ref_open_clip

torch.manual_seed(0)

# tiny towers; vision heads = width // head_width = 2 on the ref side
ARCHS.setdefault("ViT-parity-test", dict(
    embed_dim=32,
    text=dict(width=64, heads=2, layers=3),
    vision=dict(width=64, heads=2, layers=2, patch=16, image_size=32)))


def _apply_ref_text_penultimate(ref, tokens_t):
    """The reference embedders' 'penultimate' path: resblocks[:-1] then
    ln_final (clip_embedder.py:55-72), reproduced on the fork's CLIP."""
    x = ref.token_embedding(tokens_t) + ref.positional_embedding
    x = x.permute(1, 0, 2)
    for r in list(ref.transformer.resblocks)[:-1]:
        x = r(x, attn_mask=ref.attn_mask)
    x = x.permute(1, 0, 2)
    return ref.ln_final(x)


@pytest.fixture(scope="module")
def clip_pair():
    m = load_ref_open_clip()
    ref = m.CLIP(
        embed_dim=32,
        vision_cfg=dict(width=64, layers=2, head_width=32, patch_size=16,
                        image_size=32),
        text_cfg=dict(context_length=77, vocab_size=49408, width=64,
                      heads=2, layers=3)).eval()

    mine = CLIPModule(arch="ViT-parity-test")
    tokens = jnp.zeros((1, 77), jnp.int32)
    img = jnp.zeros((1, 32, 32, 3))
    params = mine.init(jax.random.PRNGKey(0), tokens, img)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = remap_state_dict(params, sd, translate_clip, "clip",
                              strict=True)
    return ref, mine, params


def _tokens(rng, b=2):
    """Random token rows shaped like real prompts: sot, words, eot, pad.
    eot (49407) must be the max id in each row — the reference pools by
    argmax (model.py:243)."""
    out = np.zeros((b, 77), np.int64)
    for i in range(b):
        n = int(rng.randint(3, 20))
        out[i, 0] = 49406
        out[i, 1:n + 1] = rng.randint(1, 49000, size=n)
        out[i, n + 1] = 49407
    return out


def test_clip_key_coverage(clip_pair):
    """strict=True in the fixture covers flax->torch; check torch->flax:
    every reference key except logit_scale (a loss-time scalar our
    conditioning towers don't carry) must be consumed."""
    ref, mine, params = clip_pair
    sd = ref.state_dict()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapped = set()
    for path, _ in flat:
        segs = [p.key for p in path]
        if segs[0] == "params":
            segs = segs[1:]
        mapped.add(translate_clip(segs))
    unused = set(sd.keys()) - mapped - {"logit_scale", "attn_mask"}
    assert not unused, f"torch keys not consumed: {sorted(unused)[:8]}"


def test_text_pooled_parity(clip_pair):
    ref, mine, params = clip_pair
    rng = np.random.RandomState(1)
    tok = _tokens(rng)
    with torch.no_grad():
        ref_out = ref.encode_text(torch.from_numpy(tok))
    pooled, _ = mine.apply(params, jnp.asarray(tok, jnp.int32), 0,
                           method="encode_text_pooled")
    np.testing.assert_allclose(np.asarray(pooled), ref_out.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_text_penultimate_hidden_parity(clip_pair):
    """The actual UNet conditioning: penultimate token features."""
    ref, mine, params = clip_pair
    rng = np.random.RandomState(2)
    tok = _tokens(rng)
    with torch.no_grad():
        ref_hid = _apply_ref_text_penultimate(ref, torch.from_numpy(tok))
    hid = mine.apply(params, jnp.asarray(tok, jnp.int32), 1,
                     method="encode_text_hidden")
    np.testing.assert_allclose(np.asarray(hid), ref_hid.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_vision_cls_parity(clip_pair):
    ref, mine, params = clip_pair
    rng = np.random.RandomState(3)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)  # torch NCHW
    with torch.no_grad():
        ref_out = ref.encode_image(torch.from_numpy(img))
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))    # NHWC
    out = mine.apply(params, img_j, method="encode_image")
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_pooled_uses_eot_position(clip_pair):
    """Changing a pad token AFTER eot must not change the pooled output
    (causal mask + argmax pooling), while changing a word token must."""
    ref, mine, params = clip_pair
    rng = np.random.RandomState(4)
    tok = _tokens(rng, b=1)
    base, _ = mine.apply(params, jnp.asarray(tok, jnp.int32), 0,
                         method="encode_text_pooled")
    tok2 = tok.copy()
    tok2[0, 50] = 123  # beyond eot
    after, _ = mine.apply(params, jnp.asarray(tok2, jnp.int32), 0,
                          method="encode_text_pooled")
    np.testing.assert_allclose(np.asarray(base), np.asarray(after),
                               rtol=1e-6, atol=1e-6)
    tok3 = tok.copy()
    tok3[0, 1] = 321  # a word token
    changed, _ = mine.apply(params, jnp.asarray(tok3, jnp.int32), 0,
                            method="encode_text_pooled")
    assert not np.allclose(np.asarray(base), np.asarray(changed), atol=1e-4)
