"""Inference dispatcher: ``python inference.py --cfg configs/X.yaml [K V ...]``

Same CLI as the reference (reference: inference.py:14-18): load the yaml
config, dispatch on TASK_TYPE through the INFER_ENGINE registry.
"""

import vgen_tpu.engines  # noqa: F401 — registers all engines
from vgen_tpu.core import INFER_ENGINE, Config
from vgen_tpu.parallel.multihost import init_distributed

if __name__ == "__main__":
    cfg_update = Config(load=True).cfg_dict
    # multi-host rendezvous via WORLD_SIZE/RANK/MASTER_ADDR env (reference
    # per-engine NCCL init, e.g. inference_i2vgen_entrance.py:99)
    init_distributed(cfg_update.get("init_method"))
    INFER_ENGINE.build(dict(type=cfg_update["TASK_TYPE"]),
                       cfg_update=cfg_update)
