"""Training engine e2e (tiny, synthetic data, 8-virtual-device mesh)."""

import os

import jax
import numpy as np
import yaml

import vgen_tpu.engines  # noqa: F401
from vgen_tpu.core import ENGINE


def _tiny_cfg(tmp_path, **over):
    with open("configs/t2v_train_tiny.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg.update({"num_steps": 2, "log_dir": str(tmp_path),
                "viz_interval": 1000, "save_ckp_interval": 1000,
                "log_interval": 1})
    cfg.update(over)
    return cfg


def test_train_two_steps_dp(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    state = ENGINE.build(dict(type=cfg["TASK_TYPE"]), cfg_update=cfg)
    assert int(state["step"]) == 2
    leaf = jax.tree.leaves(state["params"])[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_train_fsdp_sharded(tmp_path):
    cfg = _tiny_cfg(tmp_path, use_fsdp=True, fsdp_size=2, batch_size=4)
    state = ENGINE.build(dict(type=cfg["TASK_TYPE"]), cfg_update=cfg)
    assert int(state["step"]) == 2
    # at least one parameter actually sharded over fsdp
    shardings = [leaf.sharding for leaf in jax.tree.leaves(state["params"])]
    assert any("fsdp" in str(s.spec) for s in shardings
               if hasattr(s, "spec")), "no parameter was FSDP-sharded"
    # EMA follows the same sharding
    assert int(state["step"]) == 2


def test_checkpoint_save_and_shape(tmp_path):
    cfg = _tiny_cfg(tmp_path, num_steps=1, save_ckp_interval=1)
    ENGINE.build(dict(type=cfg["TASK_TYPE"]), cfg_update=cfg)
    ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert any(c.startswith("step_") for c in ckpts)
