"""Textual-inversion EmbeddingManager.

TPU-native re-implementation of the reference manager
(reference: tools/modules/embedding_manager.py:26-178): placeholder
strings (e.g. "*") map to learned embedding rows that replace the token
embedding output before the positional embedding. Functional style: the
learnable params live in a plain dict pytree (optimizer-friendly), and
``apply`` is pure.

Single-vector replacement is a vectorized where(); multi-vector insertion
(+ progressive words) shifts the sequence to make room for the extra
vectors (reference :91-116).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import EMBEDMANAGER

logger = logging.getLogger(__name__)

PROGRESSIVE_SCALE = 2000


@EMBEDMANAGER.register_class()
class EmbeddingManager:
    """Holds placeholder->token ids and learnable embedding params."""

    def __init__(self, embedder, placeholder_strings: Sequence[str] = ("*",),
                 initializer_words: Optional[Sequence[str]] = None,
                 per_image_tokens: bool = False,
                 num_vectors_per_token: int = 1,
                 progressive_words: bool = False, token_dim: int = 1024,
                 **kwargs):
        self.embedder = embedder
        self.max_vectors_per_token = num_vectors_per_token
        self.progressive_words = progressive_words
        self.progressive_counter = 0
        self.token_dim = token_dim

        tokenizer = embedder.tokenizer
        self.string_to_token: Dict[str, int] = {}
        params: Dict[str, np.ndarray] = {}
        self.initial_embeddings: Dict[str, np.ndarray] = {}

        token_table = None
        if embedder.params is not None:
            token_table = np.asarray(
                embedder.params["params"]["text"]["token_embedding"]["embedding"])

        for idx, s in enumerate(placeholder_strings):
            ids = tokenizer.encode(s)
            assert len(ids) == 1, f"placeholder {s!r} must be a single token"
            self.string_to_token[s] = int(ids[0])
            if initializer_words and idx < len(initializer_words) \
                    and token_table is not None:
                w_ids = tokenizer.encode(initializer_words[idx])
                init = token_table[w_ids[0]]
                params[s] = np.repeat(init[None], num_vectors_per_token, 0)
                self.initial_embeddings[s] = params[s].copy()
            else:
                params[s] = np.random.rand(
                    num_vectors_per_token, token_dim).astype(np.float32)
        self.params = {k: jnp.asarray(v) for k, v in params.items()}

    # ------------------------------------------------------------------ #
    def apply(self, params, tokenized_text, embedded_text):
        """Replace placeholder-token embeddings (reference forward :77-118).

        tokenized_text: [b, n] int; embedded_text: [b, n, d]. Pure in
        ``params`` so it differentiates for textual-inversion training.
        """
        if self.progressive_words:
            self.progressive_counter += 1
            max_step = 1 + self.progressive_counter // PROGRESSIVE_SCALE
        else:
            max_step = self.max_vectors_per_token

        for s, token in self.string_to_token.items():
            emb = params[s]
            nvec = min(emb.shape[0], max_step)
            if self.max_vectors_per_token == 1:
                mask = (tokenized_text == token)[..., None]
                embedded_text = jnp.where(mask, emb[0], embedded_text)
            else:
                embedded_text = self._insert_multi(tokenized_text,
                                                   embedded_text, token,
                                                   emb[:nvec])
        return embedded_text

    @staticmethod
    def _insert_multi(tokens, embedded, token: int, emb):
        """Insert nvec rows at the placeholder position, shifting the rest
        (single placeholder per prompt, the practical DreamVideo case)."""
        b, n, d = embedded.shape
        nvec = emb.shape[0]
        pos = jnp.argmax((tokens == token).astype(jnp.int32), axis=1)  # [b]
        has = jnp.any(tokens == token, axis=1)
        idx = jnp.arange(n)[None, :]                        # [1, n]
        p = pos[:, None]
        # output row i: i < p -> embedded[i]; p <= i < p+nvec -> emb[i-p];
        # i >= p+nvec -> embedded[i-nvec+1]
        shifted = jnp.take_along_axis(
            embedded, jnp.clip(idx - nvec + 1, 0, n - 1)[..., None], axis=1)
        ins = emb[jnp.clip(idx - p, 0, nvec - 1)]
        out = jnp.where((idx >= p)[..., None] & (idx < p + nvec)[..., None],
                        ins, jnp.where((idx < p)[..., None], embedded, shifted))
        return jnp.where(has[:, None, None], out, embedded)

    def apply_with_text(self, params, tokenized_text, embedded_text):
        """Additive variant (reference forward_with_text :135-144)."""
        for s, token in self.string_to_token.items():
            mask = (tokenized_text == token)[..., None]
            embedded_text = jnp.where(mask, embedded_text + params[s][0],
                                      embedded_text)
        return embedded_text

    # ------------------------------------------------------------------ #
    def save(self, path: str):
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 **{k: np.asarray(v) for k, v in self.params.items()},
                 _tokens=np.asarray(
                     [[self.string_to_token[k]] for k in self.params]))
        logger.info("saved embeddings to %s", path)

    def load(self, path: str):
        if path.endswith(".pth") or not os.path.exists(path) and \
                os.path.exists(path.replace(".npz", ".pth")):
            # torch textual-inversion checkpoint (reference save :145-150)
            import torch
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            for s, tok in ckpt["string_to_token"].items():
                self.string_to_token[s] = int(tok)
            for s, p in ckpt["string_to_param"].items():
                self.params[s] = jnp.asarray(p.detach().numpy())
        else:
            data = np.load(path if path.endswith(".npz") else path + ".npz")
            for k in self.params:
                if k in data:
                    self.params[k] = jnp.asarray(data[k])
        return self

    def embedding_norms_squared(self, params=None):
        p = params or self.params
        allp = jnp.concatenate(list(p.values()), axis=0)
        return (allp * allp).sum(axis=-1)

    def embedding_to_coarse_loss(self, params=None):
        """Regularize toward the initializer words (reference :168-178)."""
        p = params or self.params
        loss = 0.0
        n = max(len(self.initial_embeddings), 1)
        for k, coarse in self.initial_embeddings.items():
            d = p[k] - jnp.asarray(coarse)
            loss = loss + (d @ d.T).sum() / n
        return loss
