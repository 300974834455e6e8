"""Collective utilities + distributed algorithms.

TPU-native equivalent of the reference distributed runtime
(reference: utils/distributed.py:13-430). On TPU, tensor collectives are
XLA primitives inside pjit/shard_map programs (psum/pmean/all_gather/
ppermute over a named mesh axis) rather than NCCL calls on eager tensors;
this module provides:

  * thin world-size-aware wrappers mirroring the reference's API surface
    (no-op when the axis is absent/size 1 — reference :44-64);
  * object (pickle) collectives over hosts via multihost_utils,
    replacing the gloo-group generalized_all_gather (:192-240);
  * differentiable collectives: in JAX psum/all_gather are natively
    differentiable, so DiffAllGather/DiffAllReduce/DiffScatter/DiffCopy
    (:302-365) reduce to documented aliases with the same autodiff
    semantics;
  * spherical_kmeans (:369-405) and sinkhorn (:407-430) as jnp
    implementations whose cluster/row statistics reduce over an optional
    mesh axis.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp


def _has_axis(axis_name) -> bool:
    if axis_name is None:
        return False
    names = axis_name if isinstance(axis_name, (tuple, list)) else (axis_name,)
    try:
        for n in names:
            jax.lax.axis_index(n)
        return True
    except NameError:
        return False


def world_size(axis_name: Optional[str] = None) -> int:
    """Axis size inside shard_map/pjit; process count outside."""
    if axis_name is not None:
        try:
            return jax.lax.axis_size(axis_name)
        except NameError:
            pass
    return jax.process_count()


def get_rank(axis_name: Optional[str] = None):
    if axis_name is not None:
        try:
            return jax.lax.axis_index(axis_name)
        except NameError:
            pass
    return jax.process_index()


# ------------------------------------------------------------------ #
# tensor collectives (no-ops without a mesh axis, reference :44-64)
# ------------------------------------------------------------------ #
def all_reduce(x, axis_name: Optional[str] = None, op: str = "sum"):
    if not _has_axis(axis_name):
        return x
    if op == "sum":
        return jax.lax.psum(x, axis_name)
    if op == "mean":
        return jax.lax.pmean(x, axis_name)
    if op == "max":
        return jax.lax.pmax(x, axis_name)
    if op == "min":
        return jax.lax.pmin(x, axis_name)
    raise ValueError(op)


def all_gather(x, axis_name: Optional[str] = None, axis: int = 0):
    if not _has_axis(axis_name):
        return x[None] if axis == 0 else x
    return jax.lax.all_gather(x, axis_name, axis=axis)


def reduce_scatter(x, axis_name: Optional[str] = None):
    if not _has_axis(axis_name):
        return x
    return jax.lax.psum_scatter(x, axis_name)


def broadcast(x, axis_name: Optional[str] = None, src: int = 0):
    """Everyone takes src's copy (via all_gather indexing)."""
    if not _has_axis(axis_name):
        return x
    return jax.lax.all_gather(x, axis_name, axis=0)[src]


def ppermute_shift(x, axis_name: str, shift: int = 1):
    """send/recv equivalent: ring shift by ``shift`` (reference
    send/recv/isend/irecv :241-275 collapse to ppermute on TPU)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def reduce_dict(d: dict, axis_name: Optional[str] = None, average: bool = True):
    """Mean/sum a dict of scalars across the axis (reference :107-141)."""
    op = "mean" if average else "sum"
    return {k: all_reduce(v, axis_name, op) for k, v in d.items()}


# differentiable collectives: psum/all_gather ARE differentiable in JAX.
# These aliases keep the reference API (:302-365) with identical vjp
# semantics: all_gather's vjp splits the cotangent; psum's vjp is
# identity; scatter's vjp all-gathers; copy's vjp all-reduces.
diff_all_gather = all_gather
diff_all_reduce = all_reduce


def diff_scatter(x, axis_name: Optional[str] = None):
    """Take this rank's shard of a replicated tensor (vjp = all-gather)."""
    if not _has_axis(axis_name):
        return x
    i = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    return jax.lax.dynamic_slice_in_dim(x, i * (x.shape[0] // n),
                                        x.shape[0] // n, 0)


def diff_copy(x, axis_name: Optional[str] = None):
    """Identity forward, all-reduce backward (reference DiffCopy)."""
    if not _has_axis(axis_name):
        return x

    @jax.custom_vjp
    def _copy(v):
        return v

    def fwd(v):
        return v, None

    def bwd(_, g):
        return (jax.lax.psum(g, axis_name),)

    _copy.defvjp(fwd, bwd)
    return _copy(x)


# ------------------------------------------------------------------ #
# object (pickle) collectives across hosts (reference gloo path)
# ------------------------------------------------------------------ #
def generalized_all_gather(obj: Any) -> list:
    """Gather arbitrary picklable objects from all host processes
    (reference :192-240; gloo byte-tensor padding becomes
    multihost_utils)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    import pickle

    payload = pickle.dumps(obj)
    max_len = int(multihost_utils.process_allgather(
        jnp.asarray(len(payload))).max())
    padded = payload + b"\0" * (max_len - len(payload))
    arr = jnp.frombuffer(padded, dtype=jnp.uint8)
    gathered = multihost_utils.process_allgather(arr)
    lengths = multihost_utils.process_allgather(jnp.asarray(len(payload)))
    return [pickle.loads(bytes(bytearray(g))[:int(n)])
            for g, n in zip(gathered, lengths)]


def broadcast_object(obj: Any, src: int = 0) -> Any:
    return generalized_all_gather(obj)[src]


def generalized_gather(obj: Any, dst: int = 0) -> list:
    """Gather picklable objects TO one rank (reference
    utils/distributed.py:192-240): the ``dst`` process gets the full
    list, everyone else gets []. JAX multihost collectives are
    symmetric (every host participates in the allgather), so this is
    the allgather with the reference's asymmetric return contract."""
    out = generalized_all_gather(obj)
    return out if jax.process_index() == dst else []


# ------------------------------------------------------------------ #
# distributed algorithms (reference :369-430)
# ------------------------------------------------------------------ #
def spherical_kmeans(feats: jnp.ndarray, num_clusters: int,
                     num_iters: int = 10,
                     axis_name: Optional[str] = None,
                     key=None) -> jnp.ndarray:
    """EM spherical k-means with all-reduced cluster statistics
    (reference :369-405). feats: [n, d] (assumed L2-normalizable)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    idx = jax.random.choice(key, feats.shape[0], (num_clusters,),
                            replace=feats.shape[0] < num_clusters)
    centers = feats[idx]

    def step(centers, _):
        sims = feats @ centers.T                      # [n, k]
        assign = jnp.argmax(sims, axis=1)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=feats.dtype)
        sums = onehot.T @ feats                       # [k, d]
        counts = onehot.sum(axis=0)                   # [k]
        sums = all_reduce(sums, axis_name)
        counts = all_reduce(counts, axis_name)
        new = sums / jnp.maximum(counts[:, None], 1e-8)
        new = new / (jnp.linalg.norm(new, axis=-1, keepdims=True) + 1e-8)
        # keep old center for empty clusters
        new = jnp.where(counts[:, None] > 0, new, centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=num_iters)
    return centers


def sinkhorn(scores: jnp.ndarray, eps: float = 0.05, num_iters: int = 3,
             axis_name: Optional[str] = None) -> jnp.ndarray:
    """Sinkhorn-Knopp normalization with all-reduced row sums
    (reference :407-430). scores: [n, k] local shard of the global
    assignment problem."""
    q = jnp.exp(scores / eps).T                       # [k, n_local]
    n_global = q.shape[1] * world_size(axis_name)
    q = q / all_reduce(q.sum(), axis_name)

    def step(q, _):
        rows = all_reduce(q.sum(axis=1, keepdims=True), axis_name)
        q = q / jnp.maximum(rows, 1e-12) / q.shape[0]
        cols = q.sum(axis=0, keepdims=True)
        q = q / jnp.maximum(cols, 1e-12) / n_global
        return q, None

    q, _ = jax.lax.scan(step, q, None, length=num_iters)
    return (q * n_global).T
