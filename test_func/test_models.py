"""Developer script: build cfg.UNet, count params, one dummy forward,
FLOPs estimate (reference: test_func/test_models.py:17-56).

  python test_func/test_models.py --cfg configs/t2v_train.yaml
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vgen_tpu  # noqa: F401
from vgen_tpu.core import MODEL, Config


def main():
    cfg = Config(load=True).cfg_dict
    ucfg = dict(cfg["UNet"])
    model = MODEL.build(ucfg)

    b, f, h, w = 1, 16, 32, 56  # reference dummy [1,4,16,32,56]
    x = jnp.zeros((b, f, h, w, ucfg.get("in_dim", 4)))
    t = jnp.zeros((b,), jnp.int32)
    y = jnp.zeros((b, 77, ucfg.get("context_dim", 1024)))
    from vgen_tpu.engines.infer_t2v import model_init_kwargs
    from vgen_tpu.core.config import AttrDict
    kw = model_init_kwargs(AttrDict(cfg), h, w, frames=f)

    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t,
                                               y=y, **kw))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    print(f"UNet {ucfg['type']}: {n/1e6:.2f}M parameters")

    # FLOPs via XLA cost analysis (replaces ptflops/thop)
    params = model.init(jax.random.PRNGKey(0), x, t, y=y, **kw)
    lowered = jax.jit(lambda p: model.apply(p, x, t, y=y, **kw)).lower(params)
    cost = lowered.compile().cost_analysis()
    flops = (cost or {}).get("flops")
    if flops:
        print(f"forward FLOPs: {flops/1e9:.1f} GFLOPs")
    out = model.apply(params, x, t, y=y, **kw)
    print("forward output:", out.shape, out.dtype)


if __name__ == "__main__":
    main()
