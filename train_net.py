"""Training dispatcher: ``python train_net.py --cfg configs/X.yaml [K V ...]``

Same CLI as the reference (reference: train_net.py:14-18): load the yaml
config, dispatch on TASK_TYPE through the ENGINE registry.
"""

import vgen_tpu.engines  # noqa: F401 — registers all engines
from vgen_tpu.core import ENGINE, Config
from vgen_tpu.parallel.multihost import init_distributed

if __name__ == "__main__":
    cfg_update = Config(load=True).cfg_dict
    # multi-host rendezvous via WORLD_SIZE/RANK/MASTER_ADDR env (reference
    # train_t2v_enterance.py:44-48) — must precede any device use
    init_distributed(cfg_update.get("init_method"))
    ENGINE.build(dict(type=cfg_update["TASK_TYPE"]), cfg_update=cfg_update)
