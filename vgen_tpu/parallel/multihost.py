"""Multi-host (DCN) runtime initialization + host-local batch assembly.

TPU-native replacement for the reference's multi-node rendezvous
(reference: utils/distributed.py:13-43 generalized_init via env
RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT; per-engine wiring
tools/train/train_t2v_enterance.py:44-48, ``--init_method`` flag
utils/config.py:36-39). Instead of one NCCL process group per GPU, each
HOST runs one process; ``jax.distributed.initialize`` connects them over
DCN and every jit program then spans the global device mesh, with XLA
routing collectives over ICI within a slice and DCN across slices.

Call :func:`init_distributed` BEFORE any other JAX API touches a device
(it must precede backend initialization) — the CLI entry points
(train_net.py / inference.py) do this right after parsing the config.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

logger = logging.getLogger(__name__)

_INITIALIZED = False


def init_distributed(init_method: Optional[str] = None) -> Tuple[int, int]:
    """Initialize the JAX multi-process runtime from the environment.

    Env rendezvous mirrors the reference exactly: ``WORLD_SIZE`` > 1
    triggers multi-process mode, ``RANK`` is this process's id, and the
    coordinator is ``MASTER_ADDR:MASTER_PORT`` (reference
    utils/distributed.py:24-43) unless ``init_method`` ("tcp://host:port",
    reference utils/config.py:36-39) overrides it.

    Returns (process_id, num_processes). No-op (0, 1) when WORLD_SIZE is
    absent/1, so single-host runs need no environment at all — the same
    behavior as the reference's world_size==1 short-circuit.
    """
    global _INITIALIZED
    world = int(os.environ.get("WORLD_SIZE", 1))
    if world <= 1:
        return 0, 1

    import jax

    # NB: do NOT call jax.process_count()/devices() here — they would
    # initialize the XLA backend and make distributed init impossible
    if _INITIALIZED:
        return jax.process_index(), jax.process_count()

    rank = int(os.environ.get("RANK", 0))
    if os.environ.get("MASTER_ADDR"):
        # explicit env rendezvous wins (reference reads MASTER_ADDR/PORT
        # from the env in every entrance)
        coordinator = (f"{os.environ['MASTER_ADDR']}:"
                       f"{os.environ.get('MASTER_PORT', '29500')}")
    elif init_method:
        coordinator = str(init_method).replace("tcp://", "")
    else:
        coordinator = "127.0.0.1:29500"

    # CPU backend (tests / local smoke): cross-process collectives need
    # the gloo implementation; must be set before backend init.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # noqa: BLE001 — older jax has no such option
            pass

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=world, process_id=rank)
    _INITIALIZED = True
    logger.info("jax.distributed initialized: process %d/%d via %s",
                rank, world, coordinator)
    return rank, world


def global_batch(mesh, x, spec=None):
    """Assemble a global batch array from THIS HOST's local data.

    Single-process: a plain sharded device_put. Multi-process: each host
    contributes its local shard (``jax.make_array_from_process_local_data``)
    — the multihost analog of the reference's DistributedSampler feeding
    each DDP rank its slice (train_t2v_enterance.py:125-132). The local
    leading dim times process_count gives the global batch.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    from .mesh import batch_spec

    sharding = NamedSharding(mesh, spec if spec is not None else batch_spec())
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def replicate_to_mesh(mesh, x):
    """Replicate a host-identical array onto every device of the mesh
    (valid multihost only when all hosts hold the same values)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = np.asarray(x)
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
