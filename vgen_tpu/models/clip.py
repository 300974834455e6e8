"""OpenCLIP ViT-H/14 text + vision towers and frozen embedder wrappers.

TPU-native re-implementation of the reference CLIP conditioning stack
(reference: tools/modules/clip_embedder.py:12-370, backed there by the
open_clip package + bundled fork utils/reward/open_clip/). Here the
towers are flax modules (NHWC vision, fused attention) and the wrappers
hold (module, params) pairs loaded from a converted checkpoint.

The BPE tokenizer is an independent implementation of the CLIP BPE
algorithm; the merge table is DATA loaded at runtime from a configurable
path (models/bpe_simple_vocab_16e6.txt.gz, the standard public asset).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import unicodedata
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import regex as re
from flax import linen as nn

from ..core.registry import EMBEDDER
from ..ops.attention import attention

Dtype = Any

# OpenCLIP normalization constants (reference tools/modules/config.py:77-78)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

ARCHS = {
    # embed_dim, text(width, heads, layers), vision(width, heads, layers, patch)
    "ViT-H-14": dict(embed_dim=1024,
                     text=dict(width=1024, heads=16, layers=24),
                     vision=dict(width=1280, heads=16, layers=32, patch=14,
                                 image_size=224)),
    # small arch for smoke tests / CI (not a released checkpoint)
    "ViT-tiny-test": dict(embed_dim=1024,
                          text=dict(width=64, heads=2, layers=2),
                          vision=dict(width=64, heads=2, layers=2, patch=16,
                                      image_size=32)),
    # smallest possible towers for multi-process CPU tests, where two
    # processes share one core and compile time dominates
    "ViT-micro-test": dict(embed_dim=32,
                           text=dict(width=32, heads=2, layers=1),
                           vision=dict(width=32, heads=2, layers=1, patch=16,
                                       image_size=32)),
}

_VOCAB_SEARCH_PATHS = (
    "models/bpe_simple_vocab_16e6.txt.gz",
    os.path.expanduser("~/.cache/vgen_tpu/bpe_simple_vocab_16e6.txt.gz"),
    "/root/reference/utils/reward/open_clip/bpe_simple_vocab_16e6.txt.gz",
)


# --------------------------------------------------------------------------- #
# BPE tokenizer (independent implementation of the CLIP BPE scheme)
# --------------------------------------------------------------------------- #
@functools.lru_cache()
def _byte_unicode_table():
    """Reversible byte -> printable-unicode mapping (GPT-2/CLIP scheme).
    Insertion order matters: printable bytes first, then the remapped
    rest — the BPE vocab is built from these values in order, so the
    ordering defines token ids."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1)))
    mapping = {b: chr(b) for b in keep}
    extra = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + extra)
            extra += 1
    return mapping


def _fix_mojibake(text: str) -> str:
    """Minimal ftfy.fix_text equivalent for its dominant case: UTF-8
    bytes mis-decoded as windows-1252/latin-1 ('mojibake', e.g.
    'CafÃ©' -> 'Café'). The reference tokenizer runs the full ftfy
    (utils/reward/open_clip/tokenizer.py whitespace_clean/basic_clean);
    ftfy is unavailable here, so prompts with malformed unicode would
    otherwise tokenize differently. Like ftfy, repeats until stable
    (double-encoded input) and leaves well-formed text untouched — a
    genuine 'é' re-encodes to a lone 0xE9 byte that is NOT valid UTF-8,
    so the round-trip fails and the original is kept."""
    for _ in range(3):
        if not any(ord(c) > 127 for c in text):
            break
        for enc in ("cp1252", "latin-1"):
            try:
                fixed = text.encode(enc).decode("utf-8")
                break
            except (UnicodeEncodeError, UnicodeDecodeError):
                fixed = None
        if fixed is None or fixed == text:
            break
        text = fixed
    return unicodedata.normalize("NFC", text)


def _clean_text(text: str) -> str:
    # ftfy-equivalent mojibake repair + html unescape twice + whitespace
    # collapse + lowercase (reference open_clip tokenizer.py behavior)
    text = _fix_mojibake(text)
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class SimpleTokenizer:
    """CLIP BPE tokenizer. 49408-token vocab: 256 bytes + 256 byte+'</w>'
    + 48894 merges + <start_of_text>/<end_of_text>."""

    PAT = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
        r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", re.IGNORECASE)

    def __init__(self, bpe_path: Optional[str] = None,
                 context_length: int = 77):
        if bpe_path is None:
            for cand in _VOCAB_SEARCH_PATHS:
                if os.path.exists(cand):
                    bpe_path = cand
                    break
        if bpe_path is None or not os.path.exists(bpe_path):
            raise FileNotFoundError(
                "CLIP BPE vocab not found; place bpe_simple_vocab_16e6.txt.gz "
                f"in one of {_VOCAB_SEARCH_PATHS}")
        self.context_length = context_length
        self.byte_encoder = _byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [c + "</w>" for c in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.vocab_size = len(self.encoder)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in re.findall(self.PAT, _clean_text(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def __call__(self, texts: Union[str, Sequence[str]],
                 context_length: Optional[int] = None) -> np.ndarray:
        """Tokenize to a padded [n, context_length] int32 array; overlong
        prompts are truncated with the final token forced to eot (the
        reference's open_clip.tokenize behavior)."""
        if isinstance(texts, str):
            texts = [texts]
        n_ctx = context_length or self.context_length
        out = np.zeros((len(texts), n_ctx), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > n_ctx:
                ids = ids[:n_ctx]
                ids[-1] = self.eot
            out[i, :len(ids)] = ids
        return out


# --------------------------------------------------------------------------- #
# towers (flax)
# --------------------------------------------------------------------------- #
class MHA(nn.Module):
    """Packed-qkv multihead attention (torch nn.MultiheadAttention layout
    for direct checkpoint mapping)."""
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, bias=None):
        b, s, c = x.shape
        d = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.heads, d)
        k = k.reshape(b, s, self.heads, d)
        v = v.reshape(b, s, self.heads, d)
        o = attention(q, k, v, bias=bias).reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(o)


class ResidualAttentionBlock(nn.Module):
    """epsilon=1e-5 on every LayerNorm matches torch; CLIP token
    embeddings have std~0.02, where flax's 1e-6 default shifts the
    normalized output by ~1% (caught by tests/test_parity_clip.py)."""
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, bias=None):
        x = x + MHA(self.heads, dtype=self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x), bias)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * x.shape[-1], dtype=self.dtype, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class TextTransformer(nn.Module):
    """CLIP text tower. ``skip_last`` drops the final N resblocks
    ('penultimate' conditioning = skip_last 1, reference
    clip_embedder.py:61-68); ln_final is always applied."""
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    embed_dim: int = 1024
    dtype: Optional[Dtype] = None

    def setup(self):
        self.token_embedding = nn.Embed(self.vocab_size, self.width,
                                        dtype=self.dtype)
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width))
        self.resblocks = [ResidualAttentionBlock(self.heads, dtype=self.dtype)
                          for _ in range(self.layers)]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))

    def causal_mask(self):
        s = self.context_length
        return jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, -jnp.inf)

    def hidden(self, tokens, skip_last: int = 0, token_override=None):
        """Token-level features [b, ctx, width] after ln_final.
        ``token_override``: replacement token embeddings (textual
        inversion hook, reference clip_embedder.py:347-357)."""
        x = self.token_embedding(tokens) if token_override is None else token_override
        x = x + self.positional_embedding
        mask = self.causal_mask()
        n = len(self.resblocks) - skip_last
        for r in self.resblocks[:n]:
            x = r(x, mask)
        return self.ln_final(x)

    def token_embed(self, tokens):
        """Raw token embeddings (pre-positional) — the hook point for
        textual inversion (reference clip_embedder.py:347-357)."""
        return self.token_embedding(tokens)

    def pooled(self, tokens, skip_last: int = 0):
        """(pooled [b, embed_dim], token features [b, ctx, width]):
        eot-position feature through text_projection (reference
        clip_embedder.py:196-200)."""
        x = self.hidden(tokens, skip_last)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot] @ self.text_projection
        return pooled, x

    def __call__(self, tokens, skip_last: int = 0):
        return self.hidden(tokens, skip_last)


class VisionTransformer(nn.Module):
    """CLIP ViT vision tower; input [b, H, W, 3] normalized to CLIP stats.
    Returns the projected CLS embedding [b, embed_dim]."""
    width: int = 1280
    heads: int = 16
    layers: int = 32
    patch: int = 14
    image_size: int = 224
    embed_dim: int = 1024
    dtype: Optional[Dtype] = None

    def setup(self):
        self.conv1 = nn.Conv(self.width, (self.patch, self.patch),
                             strides=(self.patch, self.patch), use_bias=False,
                             dtype=self.dtype)
        n_tokens = (self.image_size // self.patch) ** 2 + 1
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(self.width ** -0.5),
            (self.width,))
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(self.width ** -0.5),
            (n_tokens, self.width))
        self.ln_pre = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.resblocks = [ResidualAttentionBlock(self.heads, dtype=self.dtype)
                          for _ in range(self.layers)]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.proj = self.param("proj",
                               nn.initializers.normal(self.width ** -0.5),
                               (self.width, self.embed_dim))

    def __call__(self, x):
        b = x.shape[0]
        h = self.conv1(x).reshape(b, -1, self.width)
        cls = jnp.broadcast_to(self.class_embedding, (b, 1, self.width))
        h = jnp.concatenate([cls, h], axis=1) + self.positional_embedding
        h = self.ln_pre(h)
        for r in self.resblocks:
            h = r(h)
        h = self.ln_post(h[:, 0])
        return h @ self.proj


class CLIPModule(nn.Module):
    """Combined text+vision model (the open_clip 'model' object)."""
    arch: str = "ViT-H-14"
    dtype: Optional[Dtype] = None

    def setup(self):
        a = ARCHS[self.arch]
        self.text = TextTransformer(embed_dim=a["embed_dim"], **a["text"],
                                    dtype=self.dtype)
        self.visual = VisionTransformer(embed_dim=a["embed_dim"],
                                        **a["vision"], dtype=self.dtype)

    def encode_text_hidden(self, tokens, skip_last=0):
        return self.text.hidden(tokens, skip_last)

    def encode_text_pooled(self, tokens, skip_last=0):
        return self.text.pooled(tokens, skip_last)

    def encode_image(self, images):
        return self.visual(images)

    def embed_tokens(self, tokens):
        return self.text.token_embed(tokens)

    def encode_text_hidden_override(self, token_override, tokens,
                                    skip_last=0):
        return self.text.hidden(tokens, skip_last,
                                token_override=token_override)

    def __call__(self, tokens, images):  # for init
        return (self.text.pooled(tokens)[0],
                self.visual(images) if images is not None else None)


def clip_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB [b,h,w,3] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (images - mean) / std


# --------------------------------------------------------------------------- #
# frozen embedder wrappers (registry-facing; hold module + params)
# --------------------------------------------------------------------------- #
class _FrozenCLIPBase:
    def __init__(self, pretrained=None, arch: str = "ViT-H-14",
                 max_length: int = 77, layer: str = "last",
                 vit_resolution=(224, 224), dtype=None, **kwargs):
        assert layer in ("last", "penultimate")
        self.arch = arch
        self.max_length = max_length
        self.layer_idx = 0 if layer == "last" else 1
        self.vit_resolution = tuple(vit_resolution)
        self.pretrained = pretrained
        self.module = CLIPModule(arch=arch, dtype=dtype)
        self.params = None
        self._tokenizer = None

    @property
    def tokenizer(self) -> SimpleTokenizer:
        if self._tokenizer is None:
            self._tokenizer = SimpleTokenizer(context_length=self.max_length)
        return self._tokenizer

    def init_random(self, key):
        tokens = jnp.zeros((1, self.max_length), jnp.int32)
        sz = ARCHS[self.arch]["vision"]["image_size"]
        img = jnp.zeros((1, sz, sz, 3))
        # jit: eager init dispatches thousands of tiny initializer ops
        # one-by-one — ~minutes through the axon TPU tunnel
        self.params = jax.jit(
            lambda k: self.module.init(k, tokens, img))(key)
        return self.params

    def load_params(self, params):
        self.params = params
        return self

    def tokenize(self, texts):
        return jnp.asarray(self.tokenizer(texts))

    def _tokens(self, text):
        if isinstance(text, (str, list, tuple)) and not isinstance(
                text, jnp.ndarray):
            return self.tokenize(text)
        return jnp.asarray(text)


@EMBEDDER.register_class()
class FrozenOpenCLIPEmbedder(_FrozenCLIPBase):
    """Text-only token features (reference clip_embedder.py:12-72)."""

    def __call__(self, text):
        tokens = self._tokens(text)
        return self.module.apply(self.params, tokens, self.layer_idx,
                                 method="encode_text_hidden")

    encode = __call__


@EMBEDDER.register_class()
class FrozenOpenCLIPVisualEmbedder(_FrozenCLIPBase):
    """Image embedding; ``white_image`` is the zero-condition image the
    reference feeds for unconditioned branches (clip_embedder.py:94-95)."""

    def white_image(self, batch: int = 1):
        white = jnp.ones((batch,) + self.vit_resolution + (3,))
        return clip_preprocess(white)

    def __call__(self, image):
        return self.module.apply(self.params, image, method="encode_image")

    encode = __call__


@EMBEDDER.register_class()
class FrozenOpenCLIPTextVisualEmbedder(_FrozenCLIPBase):
    """(image_emb, pooled_text, token_features) triple
    (reference clip_embedder.py:144-227)."""

    def __call__(self, image=None, text=None):
        xi = None
        if image is not None:
            xi = self.module.apply(self.params, image, method="encode_image")
        xt, x = None, None
        if text is not None:
            tokens = self._tokens(text)
            xt, x = self.module.apply(self.params, tokens, self.layer_idx,
                                      method="encode_text_pooled")
        return xi, xt, x

    encode = __call__


@EMBEDDER.register_class()
class FrozenOpenCLIPCustomEmbedder(_FrozenCLIPBase):
    """Text embedder with an embedding_manager hook applied to the token
    embeddings before the positional embedding (textual inversion;
    reference clip_embedder.py:305-370)."""

    def __call__(self, text, embedding_manager=None, manager_params=None):
        tokens = self._tokens(text)
        tok_emb = self.module.apply(self.params, tokens,
                                    method="embed_tokens")
        if embedding_manager is not None:
            tok_emb = embedding_manager.apply(
                manager_params or embedding_manager.params, tokens, tok_emb)
        return self.module.apply(self.params, tok_emb, tokens,
                                 self.layer_idx,
                                 method="encode_text_hidden_override")

    encode = __call__


@EMBEDDER.register_class()
class FrozenOpenCLIPEmbedderZero(FrozenOpenCLIPTextVisualEmbedder):
    """TextVisual variant with a cached white-image 'zero feature'
    (reference clip_embedder.py:230-300)."""

    def zero_feature(self):
        white = jnp.ones((1,) + self.vit_resolution + (3,))
        return self.module.apply(self.params, clip_preprocess(white),
                                 method="encode_image")
