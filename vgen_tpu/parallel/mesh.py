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


# megatron-style tensor-parallel rules for 2D Dense kernels, keyed by the
# owning module's name (last path segment before 'kernel'):
#   column-parallel (shard OUTPUT dim): qkv projections + MLP up-proj —
#     activations become tensor-sharded, no collective needed yet.
#   row-parallel (shard INPUT dim): output projections + MLP down-proj —
#     XLA inserts the all-reduce that completes the megatron pattern.
_TP_COL = ("to_q", "to_k", "to_v", "proj", "fc_in", "fc1", "qkv", "to_qkv")
_TP_ROW = ("to_out", "fc_out", "fc2", "proj_out")


def _tp_axis_for(path: Tuple[str, ...], shape: Tuple[int, ...]):
    """Return the axis to shard over 'tensor' (or None) for this leaf."""
    if len(shape) != 2 or not path or path[-1] != "kernel":
        return None
    owner = path[-2] if len(path) >= 2 else ""
    if owner in _TP_COL:
        return 1
    if owner in _TP_ROW:
        return 0
    return None


def param_shardings(params, mesh: Mesh, min_size: int = 2 ** 16,
                    tensor_parallel: bool = True):
    """NamedSharding tree for a parameter pytree: megatron tensor
    parallelism over 'tensor' for attention/MLP Dense kernels (when the
    mesh has a tensor axis >1), ZeRO-3 FSDP over 'fsdp' for the rest
    (and for the remaining axis of TP-sharded kernels)."""
    fsdp_size = mesh.shape["fsdp"]
    tp_size = mesh.shape.get("tensor", 1)

    def rule(path, leaf):
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        shape = leaf.shape
        if tensor_parallel and tp_size > 1:
            tp_axis = _tp_axis_for(names, shape)
            if tp_axis is not None and shape[tp_axis] % tp_size == 0:
                spec = [None, None]
                spec[tp_axis] = "tensor"
                other = 1 - tp_axis
                if (math.prod(shape) >= min_size
                        and shape[other] % fsdp_size == 0 and fsdp_size > 1):
                    spec[other] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, _fsdp_spec_for(shape, fsdp_size,
                                                  min_size))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Device-put a param tree according to the FSDP rules."""
    shardings = param_shardings(params, mesh, min_size)
    return jax.tree.map(jax.device_put, params, shardings)


def spatial_infer_mesh(min_devices: int = 2, devices=None) -> Optional[Mesh]:
    """1-D ("sp",) mesh over all local devices for spatially-sharded
    inference (the reference's use_zero_infer analog: big-activations
    inference that one chip cannot hold). Returns None single-device.

    ``devices`` overrides jax.devices() — e.g. a TopologyDescription's
    virtual devices for AOT compilation (tools_dev/mem_sharded_720p.py).
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) < min_devices:
        return None
    return Mesh(np.asarray(devices), ("sp",))


def constrain_spatial(x, mesh: Optional[Mesh], axis: int = -3):
    """Constrain activation sharding: split the latent HEIGHT axis over
    the ("sp",) mesh. GSPMD propagates through the UNet — convolutions
    get halo exchanges, attention gets K/V all-gathers — so every skip
    activation lives 1/P per chip (at 720p the skips are ~9 GB total:
    the difference between one chip OOMing and a v5e-8 cruising)."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding
    spec = [None] * x.ndim
    spec[axis % x.ndim] = "sp"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def logical_axis_rules_summary(params, mesh: Mesh) -> dict:
    """Debug helper: histogram of sharding specs chosen for the tree."""
    shardings = param_shardings(params, mesh)
    counts: dict = {}
    for s in jax.tree.leaves(shardings):
        counts[str(s.spec)] = counts.get(str(s.spec), 0) + 1
    return counts
