"""Small utilities (reference utils/util.py:3-16, utils/multi_port.py)."""

from __future__ import annotations

import socket
from typing import Any, Optional

import jax
import numpy as np


def to_device(batch: Any, sharding=None) -> Any:
    """Recursive batch mover (reference to_device): numpy leaves ->
    device arrays (optionally with a NamedSharding); strings pass through."""
    def move(x):
        if isinstance(x, (np.ndarray, np.generic)):
            return jax.device_put(x, sharding) if sharding is not None \
                else jax.device_put(x)
        return x

    return jax.tree.map(move, batch,
                        is_leaf=lambda x: isinstance(x, (np.ndarray, str)))


def find_free_port() -> int:
    """Free TCP port (reference utils/multi_port.py:4-8). On TPU pods the
    coordinator address comes from the runtime, but the helper remains for
    jax.distributed.initialize setups."""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]
