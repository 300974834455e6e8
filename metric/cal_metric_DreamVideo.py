"""DreamVideo evaluation metrics: CLIP-T, CLIP-I, DINO-I, Temporal Consistency.

TPU-native equivalent of the reference evaluator
(reference: metric/cal_metric_DreamVideo.py:22-211, metric/README.MD:3-24):
  * CLIP-T  — mean cosine similarity between each generated frame's CLIP
    image embedding and the prompt's CLIP text embedding.
  * CLIP-I  — mean cosine similarity between generated frames and the
    reference subject images, in CLIP image space.
  * DINO-I  — same, in DINO ViT-S/16 feature space.
  * Temporal Consistency — mean cosine similarity between consecutive
    frames' CLIP embeddings.

Usage:
  python metric/cal_metric_DreamVideo.py --video_dir D --ref_image_dir R \
      --prompt_file P [--clip_ckpt models/open_clip_pytorch_model.bin]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def cosine(a, b):
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    return (a * b).sum(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video_dir", required=True)
    ap.add_argument("--ref_image_dir", default=None)
    ap.add_argument("--prompt_file", default=None)
    ap.add_argument("--clip_ckpt", default="models/open_clip_pytorch_model.bin")
    ap.add_argument("--dino_ckpt", default="models/dino_deitsmall16.pth")
    ap.add_argument("--arch", default="ViT-H-14")
    args = ap.parse_args()

    from vgen_tpu.core import EMBEDDER
    from vgen_tpu.data import transforms as T
    from vgen_tpu.data.video_io import read_video_frames
    from vgen_tpu.models.dino import DINO_MEAN, DINO_STD, DINOViT, translate_dino
    from vgen_tpu.utils.ckpt import (load_torch_checkpoint, remap_state_dict,
                                     load_clip_params)
    from PIL import Image

    clip = EMBEDDER.build({"type": "FrozenOpenCLIPTextVisualEmbedder",
                           "arch": args.arch, "layer": "last",
                           "pretrained": args.clip_ckpt})
    clip.init_random(jax.random.PRNGKey(0))
    if os.path.exists(args.clip_ckpt):
        clip.load_params(load_clip_params(args.clip_ckpt, clip.params,
                                          strict=False))

    dino = DINOViT()
    dino_params = dino.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 224, 224, 3)))
    have_dino = os.path.exists(args.dino_ckpt)
    if have_dino:
        sd = load_torch_checkpoint(args.dino_ckpt)
        dino_params = remap_state_dict(dino_params, sd, translate_dino,
                                       "dino", strict=False)

    def clip_img(frames01):
        x = T.normalize(frames01, (0.48145466, 0.4578275, 0.40821073),
                        (0.26862954, 0.26130258, 0.27577711))
        x = jax.image.resize(jnp.asarray(x),
                             (x.shape[0], 224, 224, 3), "bilinear")
        return clip.module.apply(clip.params, x, method="encode_image")

    def dino_img(frames01):
        x = T.normalize(frames01, DINO_MEAN, DINO_STD)
        x = jax.image.resize(jnp.asarray(x),
                             (x.shape[0], 224, 224, 3), "bilinear")
        return dino.apply(dino_params, x)

    prompts = {}
    if args.prompt_file and os.path.exists(args.prompt_file):
        with open(args.prompt_file) as f:
            for line in f:
                line = line.strip()
                if line and "|||" in line:
                    k, _, v = line.partition("|||")
                    prompts[k.strip()] = v.strip()
                elif line:
                    prompts.setdefault("_default", line)

    ref_feats_clip = ref_feats_dino = None
    if args.ref_image_dir and os.path.isdir(args.ref_image_dir):
        imgs = []
        for fn in sorted(os.listdir(args.ref_image_dir)):
            if fn.lower().endswith((".png", ".jpg", ".jpeg")):
                imgs.append(np.asarray(
                    Image.open(os.path.join(args.ref_image_dir, fn))
                    .convert("RGB"), np.float32) / 255.0)
        if imgs:
            imgs = np.stack([np.asarray(
                Image.fromarray((im * 255).astype(np.uint8))
                .resize((224, 224))) for im in imgs]).astype(np.float32) / 255
            ref_feats_clip = clip_img(imgs)
            if have_dino:
                ref_feats_dino = dino_img(imgs)

    results = {"clip_t": [], "clip_i": [], "dino_i": [], "temp_cons": []}
    videos = [f for f in sorted(os.listdir(args.video_dir))
              if f.endswith((".mp4", ".gif"))]
    for vid in videos:
        frames = read_video_frames(os.path.join(args.video_dir, vid))
        frames01 = frames.astype(np.float32) / 255.0
        feats = clip_img(frames01)

        # temporal consistency (reference: consecutive-frame CLIP cosine)
        results["temp_cons"].append(float(cosine(feats[:-1], feats[1:]).mean()))

        prompt = prompts.get(vid, prompts.get("_default"))
        if prompt:
            _, txt, _ = clip(text=[prompt])
            results["clip_t"].append(float(cosine(feats, txt).mean()))
        if ref_feats_clip is not None:
            sims = cosine(feats[:, None, :], ref_feats_clip[None])
            results["clip_i"].append(float(sims.mean()))
        if ref_feats_dino is not None:
            df = dino_img(frames01)
            sims = cosine(df[:, None, :], ref_feats_dino[None])
            results["dino_i"].append(float(sims.mean()))

    out = {k: (float(np.mean(v)) if v else None) for k, v in results.items()}
    out["num_videos"] = len(videos)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
