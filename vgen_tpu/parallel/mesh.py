"""Device mesh + sharding rules (the distributed runtime).

TPU-native replacement for the reference's NCCL/DDP/FSDP stack
(reference: utils/distributed.py, DDP wrap train_t2v_enterance.py:171,
fairscale FSDP train_t2v_instructvideo_entrance.py:200-204). Instead of
per-GPU processes + collective calls, parallelism is declared as shardings
over a jax Mesh and XLA inserts the collectives over ICI:

  axes: ("data", "fsdp", "tensor")
    * batch is sharded over ("data", "fsdp") — pure DP uses data only;
      with fsdp > 1 the gradient reduce-scatter + param all-gather pattern
      is what fairscale FSDP does, derived automatically by SPMD.
    * parameters are sharded over "fsdp" along their largest divisible
      axis (ZeRO-3 style), replicated when too small to matter.
    * "tensor" is reserved for megatron-style sharding of attention/mlp
      blocks (threaded through rules below for large Dense kernels).

EMA/optimizer state inherit parameter shardings through pjit — the
reference's manual key-strided "sharded EMA" (train_t2v_enterance.py:
157-159) falls out for free.
"""

from __future__ import annotations

import logging
import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

AXES = ("data", "fsdp", "tensor")


def create_mesh(data: Optional[int] = None, fsdp: int = 1, tensor: int = 1,
                devices=None) -> Mesh:
    """Build a ("data","fsdp","tensor") mesh over the available devices.
    ``data`` defaults to filling whatever fsdp*tensor leaves."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, \
        f"mesh {data}x{fsdp}x{tensor} != {n} devices"
    arr = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, AXES)


def batch_spec() -> P:
    """Batch sharding: leading axis over data+fsdp."""
    return P(("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec_for(shape: Tuple[int, ...], fsdp_size: int,
                   min_size: int) -> P:
    """ZeRO-3 rule: shard the largest axis divisible by fsdp_size."""
    if fsdp_size <= 1 or math.prod(shape) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[axis] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(params, mesh: Mesh, min_size: int = 2 ** 16):
    """NamedSharding tree for a parameter pytree (FSDP over 'fsdp')."""
    fsdp_size = mesh.shape["fsdp"]

    def rule(leaf):
        return NamedSharding(mesh, _fsdp_spec_for(leaf.shape, fsdp_size,
                                                  min_size))

    return jax.tree.map(rule, params)


def shard_params(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Device-put a param tree according to the FSDP rules."""
    shardings = param_shardings(params, mesh, min_size)
    return jax.tree.map(jax.device_put, params, shardings)


def logical_axis_rules_summary(params, mesh: Mesh) -> dict:
    """Debug helper: histogram of sharding specs chosen for the tree."""
    shardings = param_shardings(params, mesh)
    counts: dict = {}
    for s in jax.tree.leaves(shardings):
        counts[str(s.spec)] = counts.get(str(s.spec), 0) + 1
    return counts
