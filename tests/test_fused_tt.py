"""Fused TemporalTransformer kernel vs the flax module composition.

The fused path (ops/fused_tt.py) must reproduce the unfused
TemporalTransformer inner block — LN1 -> attn1 -> LN2 -> attn2 -> LN3 ->
GEGLU FF -> proj_out (models/blocks.py:399-437; reference
tools/modules/unet/util.py:1189-1286) — bitwise up to bf16 accumulation
ordering. Runs the Pallas kernels in interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgen_tpu.models.blocks import BasicTransformerBlock
from vgen_tpu.ops import fused_tt


def _make_inner_params(key, c, heads, dim_head, c_out):
    """Init a BasicTransformerBlock + proj_out and return (params, ref_fn)
    computing the unfused inner: block_0(x) @ Wpo + bpo."""
    from flax import linen as nn

    class Inner(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = BasicTransformerBlock(
                heads=heads, dim_head=dim_head, dropout=0.0,
                has_cross=True, deterministic=True, dtype=jnp.bfloat16,
                name="block_0")(x, None)
            return nn.Dense(c_out, dtype=jnp.bfloat16, name="proj_out")(x)

    m = Inner()
    x0 = jnp.zeros((2, 4, c), jnp.bfloat16)
    params = m.init(key, x0)["params"]
    return params, lambda p, x: m.apply({"params": p}, x)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


@pytest.mark.parametrize("c,heads,c_out,f,bhw", [
    (320, 5, 320, 16, 136),   # c320 TT (mega-kernel), ragged rows
    (512, 8, 320, 16, 128),   # init TT: inner 512 -> proj_out 320
    (320, 5, 320, 8, 130),    # 8-frame bucket
    (320, 5, 320, 32, 64),    # 32-frame bucket
])
def test_fused_block_matches_flax(c, heads, c_out, f, bhw):
    key = jax.random.PRNGKey(0)
    params, ref_fn = _make_inner_params(key, c, heads, 64, c_out)
    x = (jax.random.normal(jax.random.PRNGKey(1), (bhw, f, c))
         * 0.5).astype(jnp.bfloat16)
    want = ref_fn(params, x)
    got = fused_tt.fused_tt_block(x, params, heads=heads, dim_head=64,
                                  interpret=True)
    assert got.shape == (bhw, f, c_out)
    assert _rel_err(got, want) < 2e-2


def test_fused_split_matches_flax_c640():
    c, heads, f, bhw = 640, 10, 16, 72
    key = jax.random.PRNGKey(2)
    params, ref_fn = _make_inner_params(key, c, heads, 64, c)
    x = (jax.random.normal(jax.random.PRNGKey(3), (bhw, f, c))
         * 0.5).astype(jnp.bfloat16)
    want = ref_fn(params, x)
    got = fused_tt.fused_tt_inner(x, params, heads=heads, dim_head=64,
                                  interpret=True)
    assert got.shape == want.shape
    assert _rel_err(got, want) < 2e-2


def test_fusable_dispatch():
    bf16 = jnp.bfloat16
    assert fused_tt.fusable(16, 320, 5, 64, bf16)
    assert fused_tt.fusable(32, 640, 10, 64, bf16)
    assert fused_tt.fusable(1, 512, 8, 64, bf16)       # image batch
    assert not fused_tt.fusable(16, 1280, 20, 64, bf16)  # weights > VMEM
    assert not fused_tt.fusable(24, 320, 5, 64, bf16)    # 128 % 24 != 0
    assert not fused_tt.fusable(16, 320, 5, 64, jnp.float32)
    assert not fused_tt.fusable(16, 320, 4, 64, bf16)    # c != h*dh


def test_fused_tt_module_path_matches_unfused():
    """TemporalTransformer with the fusion flag forced on (interpret) must
    match the module's unfused output on the same params."""
    from vgen_tpu.models import blocks
    from vgen_tpu.models.blocks import TemporalTransformer

    tt = TemporalTransformer(heads=5, dim_head=64, deterministic=True,
                             dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.PRNGKey(4), (2, 16, 8, 9, 320))
         * 0.5).astype(jnp.bfloat16)
    params = tt.init(jax.random.PRNGKey(5), x)
    want = tt.apply(params, x)
    old = blocks.FUSED_TT
    blocks.FUSED_TT = "interpret"
    try:
        got = tt.apply(params, x)
    finally:
        blocks.FUSED_TT = old
    assert got.shape == want.shape
    assert _rel_err(got, want) < 2e-2
