"""Subprocess worker for the 2-process multihost test.

Launched by tests/test_multihost.py with WORLD_SIZE=2, RANK=i,
MASTER_ADDR/PORT set and JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=2, so the two processes form a
4-device global CPU mesh over gloo — the DCN-analog validation of the
multi-host runtime (reference runs multi-node via the same env
rendezvous, utils/distributed.py:13-43).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vgen_tpu.parallel.multihost import init_distributed  # noqa: E402

rank, world = init_distributed()

import jax  # noqa: E402

assert jax.process_count() == world == 2, (jax.process_count(), world)
assert jax.device_count() == 4, jax.device_count()

import yaml  # noqa: E402

import vgen_tpu.engines  # noqa: E402,F401
from vgen_tpu.core import ENGINE  # noqa: E402

with open("configs/t2v_train_micro.yaml") as f:
    cfg = yaml.safe_load(f)
cfg.update({
    "num_steps": 2,
    "batch_size": 4,          # global batch; 2 samples per host
    "log_dir": sys.argv[1],
})

state = ENGINE.build(dict(type=cfg["TASK_TYPE"]), cfg_update=cfg)

import optax  # noqa: E402

norm = float(optax.global_norm(state["params"]))
loss_like = float(optax.global_norm(state["ema"]))
print(f"MHCHECK rank={rank} step={int(state['step'])} "
      f"pnorm={norm:.6f} enorm={loss_like:.6f}", flush=True)
