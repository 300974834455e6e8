"""Developer script: dump a model's (torch-convention) key list to JSON —
produces the sd_keys_path files the Pretrain strategies consume
(reference: test_func/save_targer_keys.py).

  python test_func/save_target_keys.py --cfg configs/t2v_train.yaml \
      key_filter temporal out keys.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL, Config
from vgen_tpu.core.config import AttrDict
from vgen_tpu.utils.ckpt import translate_unet


def main():
    cfg = Config(load=True).cfg_dict
    ucfg = dict(cfg["UNet"])
    model = MODEL.build(ucfg)
    from vgen_tpu.engines.infer_t2v import model_init_kwargs
    kw = model_init_kwargs(AttrDict(cfg), 8, 8, frames=2)
    x = jnp.zeros((1, 2, 8, 8, ucfg.get("in_dim", 4)))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 7, ucfg.get("context_dim", 1024)))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t,
                                               y=y, **kw))
    keys = set()
    for path, _ in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        segs = [p.key for p in path]
        if segs[0] == "params":
            segs = segs[1:]
        keys.add(translate_unet(segs))

    flt = cfg.get("key_filter")
    if flt:
        keys = {k for k in keys if flt in k}
    out_path = cfg.get("out", "target_keys.json")
    with open(out_path, "w") as f:
        json.dump(sorted(keys), f, indent=1)
    print(f"wrote {len(keys)} keys to {out_path}")


if __name__ == "__main__":
    main()
