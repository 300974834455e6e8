"""Sequence-parallel attention over a device mesh (ring + all-gather).

A NEW capability relative to the reference (SURVEY.md §5.7): the
reference caps sequences at 32 frames / 14k spatial tokens per GPU and
has no sequence parallelism. On TPU the natural scaling axis for 720p+
video is the token axis — shard q/k/v over a mesh axis and either

  * ``allgather_attention`` — all-gather K/V once, attend locally
    (one collective, memory O(S) per device — right when K/V fit), or
  * ``ring_attention``     — pass K/V blocks around the ring with
    ``ppermute`` while merging online-softmax partial results
    (memory O(S/P) per device — right at very long sequence).

Both run inside ``shard_map`` with tokens sharded over ``axis_name``;
the math rides the same fused dense attention as the single-chip path
(vgen_tpu/ops/attention.py), so numerics match the unsharded op.

Partial results are merged in log-space: given normalized partials
(o1, lse1), (o2, lse2) over disjoint key sets,
  lse = logaddexp(lse1, lse2);  o = o1*exp(lse1-lse) + o2*exp(lse2-lse).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .attention import _dense_fwd


def _merge(o1, lse1, o2, lse2):
    """Merge two normalized partial attention results (log-space)."""
    lse = jnp.logaddexp(lse1, lse2)
    w1 = jnp.exp(lse1 - lse)[..., None]
    w2 = jnp.exp(lse2 - lse)[..., None]
    return (o1.astype(jnp.float32) * w1
            + o2.astype(jnp.float32) * w2).astype(o1.dtype), lse


def ring_attention(q, k, v, axis_name: str, scale: float | None = None):
    """Attention with q/k/v sharded over tokens on ``axis_name``
    (call inside shard_map / pjit). q,k,v: per-device [BH, S_local, D].
    K/V blocks rotate around the ring via ppermute; each step attends
    the local queries against the visiting block and merges partials.
    """
    scale = scale if scale is not None else 1.0 / q.shape[-1] ** 0.5
    p = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]

    o, lse = _dense_fwd(q, k, v, scale)

    def step(i, carry):
        o, lse, kb, vb = carry
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        ob, lseb = _dense_fwd(q, kb, vb, scale)
        o, lse = _merge(o, lse, ob, lseb)
        return o, lse, kb, vb

    o, lse, _, _ = jax.lax.fori_loop(1, p, step, (o, lse, k, v))
    return o


def allgather_attention(q, k, v, axis_name: str,
                        scale: float | None = None):
    """Attention with q/k/v sharded over tokens on ``axis_name``; K/V
    all-gathered once, then local fused attention (one collective)."""
    scale = scale if scale is not None else 1.0 / q.shape[-1] ** 0.5
    kg = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    vg = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    o, _ = _dense_fwd(q, kg, vg, scale)
    return o


def sp_attention(q, k, v, mesh, axis: str = "tensor",
                 mode: str = "ring"):
    """Convenience wrapper: shard [B, S, H, D] inputs over tokens on
    ``axis`` of ``mesh`` and run ring / all-gather attention via
    shard_map. Returns the same value as the unsharded op."""
    from jax.sharding import PartitionSpec as P

    b, s, h, d = q.shape
    fn = ring_attention if mode == "ring" else allgather_attention

    def local(qb, kb, vb):
        bh = qb.shape[0] * qb.shape[2]
        q2 = qb.transpose(0, 2, 1, 3).reshape(bh, qb.shape[1], d)
        k2 = kb.transpose(0, 2, 1, 3).reshape(bh, kb.shape[1], d)
        v2 = vb.transpose(0, 2, 1, 3).reshape(bh, vb.shape[1], d)
        o = fn(q2, k2, v2, axis)
        return o.reshape(qb.shape[0], h, qb.shape[1], d).transpose(0, 2, 1, 3)

    spec = P(None, axis, None, None)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
