"""Developer script: VAE encode/decode round-trip visual check
(reference: test_func/test_EndDec.py).

  python test_func/test_enc_dec.py --cfg configs/t2v_train.yaml [image path]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

import vgen_tpu  # noqa: F401
from vgen_tpu.core import AUTO_ENCODER, Config
from vgen_tpu.data import transforms as T


def main():
    cfg = Config(load=True).cfg_dict
    ae = AUTO_ENCODER.build(dict(cfg["auto_encoder"]))
    pretrained = cfg["auto_encoder"].get("pretrained")
    ae.init_random(jax.random.PRNGKey(0), image_size=64)
    if pretrained and os.path.exists(pretrained):
        from vgen_tpu.utils.ckpt import load_vae_params
        ae.load_params(load_vae_params(pretrained, ae.params, strict=False))
        print(f"loaded VAE weights from {pretrained}")
    else:
        print("VAE running with RANDOM weights (round-trip will be noise)")

    img_path = cfg.get("test_image", "data/test_img.png")
    img = np.asarray(Image.open(img_path).convert("RGB"))
    x = T.normalize(T.to_tensor(img[None]),
                    cfg.get("mean", (0.5,) * 3), cfg.get("std", (0.5,) * 3))
    z = ae.encode_first_stage(jnp.asarray(x), jax.random.PRNGKey(1),
                              cfg.get("scale_factor", 0.18215))
    rec = ae.decode(z / cfg.get("scale_factor", 0.18215))
    rec = np.clip(np.asarray(rec)[0] * 0.5 + 0.5, 0, 1)
    out = os.path.join(cfg.get("log_dir", "workspace"), "enc_dec_roundtrip.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    Image.fromarray((rec * 255).astype(np.uint8)).save(out)
    print(f"x {x.shape} -> z {z.shape} -> rec {rec.shape}; wrote {out}")


if __name__ == "__main__":
    main()
