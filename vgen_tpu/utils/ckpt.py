"""PyTorch-checkpoint -> flax parameter importer.

The reference ships torch ``.pth`` checkpoints (UNet variants, SD-2.1 VAE,
open_clip ViT-H); this module converts them into our flax parameter trees
by mechanical path translation + transposition (the TPU analog of the
reference's 2D->video key remapper, tools/modules/unet/util.py:32-176,
and its ckpt loaders, e.g. tools/modules/autoencoder.py:64-73).

Conventions handled:
  torch Linear [out,in]         -> flax Dense kernel [in,out]
  torch Conv2d [O,I,kh,kw]      -> flax Conv kernel [kh,kw,I,O]
  torch Conv3d [O,I,kt,kh,kw]   -> flax Conv kernel [kt,kh,kw,I,O]
  torch Conv1d k=1 [O,I,1]      -> flax Dense kernel [in,out] (squeeze)
  torch Norm weight             -> flax scale
  torch Embedding weight        -> flax embedding (no transpose)

Each model family has a path-translation function; `remap_state_dict`
walks OUR param tree, derives the torch key for every leaf, converts, and
reports coverage both ways (unconsumed torch keys / unfilled flax leaves).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to {key: np.ndarray} (CPU, no grad state)."""
    import torch  # local import: torch is a conversion-time-only dep

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "non_ema"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items() if hasattr(v, "shape")}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Keep keys under ``prefix`` with it removed (reference strips
    'first_stage_model.', autoencoder.py:64-73)."""
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return out or dict(sd)


def _convert(torch_w: np.ndarray, flax_leaf_name: str,
             flax_shape: Tuple[int, ...]) -> np.ndarray:
    if flax_leaf_name in ("bias", "scale", "embedding", "positional_embedding",
                          "class_embedding", "text_projection", "proj"):
        return torch_w.reshape(flax_shape) if torch_w.shape != tuple(flax_shape) \
            else torch_w
    if flax_leaf_name == "kernel":
        if torch_w.ndim == 2:
            return torch_w.T
        if torch_w.ndim == 3:  # Conv1d k=1 used as Dense
            if len(flax_shape) == 2:
                return torch_w[:, :, 0].T
            return torch_w.transpose(2, 1, 0)
        if torch_w.ndim == 4:
            return torch_w.transpose(2, 3, 1, 0)
        if torch_w.ndim == 5:
            return torch_w.transpose(2, 3, 4, 1, 0)
    return torch_w


def remap_state_dict(flax_params, torch_sd: Dict[str, np.ndarray],
                     translate: Callable[[List[str]], Optional[str]],
                     label: str = "model", strict: bool = True):
    """Fill a flax param tree from a torch state dict via ``translate``
    (flax path segments -> torch key). Reports coverage."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    used = set()
    leaves = []
    missing = []
    for path, leaf in flat:
        segs = [p.key for p in path]
        if segs and segs[0] == "params":
            segs = segs[1:]
        tkey = translate(segs)
        if tkey is not None and tkey in torch_sd:
            w = _convert(torch_sd[tkey], segs[-1], leaf.shape)
            if w.shape != leaf.shape:
                raise ValueError(
                    f"[{label}] shape mismatch {tkey}: torch {w.shape} "
                    f"vs flax {'.'.join(segs)} {leaf.shape}")
            leaves.append(jnp.asarray(w, dtype=leaf.dtype))
            used.add(tkey)
        else:
            missing.append((".".join(segs), tkey))
            leaves.append(leaf)
    unused = [k for k in torch_sd if k not in used]
    if missing:
        msg = f"[{label}] {len(missing)} flax leaves not found in checkpoint "\
              f"(e.g. {missing[:4]})"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    if unused:
        logger.info("[%s] %d torch keys unused (e.g. %s)", label, len(unused),
                    unused[:4])
    return jax.tree_util.tree_unflatten(treedef, leaves)


# --------------------------------------------------------------------------- #
# UNet family translation (reference param naming, tools/modules/unet/*)
# --------------------------------------------------------------------------- #
_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias",
         "embedding": "weight"}


def translate_unet(segs: List[str]) -> Optional[str]:
    """vgen_tpu UNet flax path -> reference torch key."""
    out: List[str] = []
    i = 0
    n = len(segs)
    while i < n:
        s = segs[i]
        m = re.fullmatch(r"(input_blocks|output_blocks|middle_block)_(\d+)(?:_(\d+))?", s)
        if m:
            base, a, b = m.group(1), m.group(2), m.group(3)
            if base == "input_blocks" and b is not None and segs[i + 1] == "conv" \
                    and segs[i + 2] in ("kernel", "bias"):
                # standalone Downsample: torch appends the module itself
                out.append(f"input_blocks.{a}.op")
                i += 2
                continue
            out.append(f"{base}.{a}" + (f".{b}" if b is not None else ""))
            i += 1
            continue
        if s in ("time_embed", "fps_embedding", "asim_embedding",
                 "msim_embedding"):
            nxt = segs[i + 1]
            out.append(f"{s}.{0 if nxt == 'fc1' else 2}")
            i += 2
            continue
        # HiGen context transformer (unet_higen.py:154-173)
        if s == "context_embedding" and i + 1 < n and segs[i + 1] in (
                "input_mapping", "output_mapping", "tokens") or (
                s == "context_embedding" and i + 1 < n
                and segs[i + 1].startswith("block_")):
            nxt = segs[i + 1]
            if nxt.startswith("block_"):
                d = nxt.split("_")[1]
                out.append(f"context_embedding.context_transformer.{d}")
            else:
                out.append(f"context_embedding.{nxt}")
            i += 2
            continue
        # I2VGen conditioning stems (unet_i2vgen.py naming)
        if s == "context_embedding_fc1":
            out.append("context_embedding.0"); i += 1; continue
        if s == "context_embedding_fc2":
            out.append("context_embedding.2"); i += 1; continue
        m = re.fullmatch(r"local_image_concat_(\d)", s)
        if m:  # Sequential(Conv,SiLU,Conv,SiLU,Conv) -> 0,2,4
            out.append(f"local_image_concat.{int(m.group(1)) * 2}")
            i += 1; continue
        m = re.fullmatch(r"local_image_embedding_(\d)", s)
        if m:  # Sequential(Conv,SiLU,Pool,Conv,SiLU,Conv) -> 0,3,5
            out.append(f"local_image_embedding.{(0, 3, 5)[int(m.group(1))]}")
            i += 1; continue
        if s == "local_temporal_encoder":
            out.append("local_temporal_encoder"); i += 1; continue
        # TFT2V/VideoComposer condition stems (unet_tf2tv.py:291-381)
        m = re.fullmatch(r"stem_(\w+)", s)
        if m:
            comp = m.group(1)
            prefix = {"depthmap": "depth_embedding",
                      "mask": "masked_embedding"}.get(comp,
                                                      f"{comp}_embedding")
            nxt = segs[i + 1]
            if nxt in ("conv1", "conv2", "conv3"):
                idx = {"conv1": 0, "conv2": 3, "conv3": 5}[nxt]
                out.append(f"{prefix}.{idx}")
                i += 2
                continue
            if nxt == "after":
                # mask stem's temporal encoder is named mask_embedding_after
                after = {"mask": "mask_embedding_after"}.get(
                    comp, f"{prefix}_after")
                out.append(after)
                i += 2
                continue
        if s == "pre_image_fc1":
            out.append("pre_image_condition.0"); i += 1; continue
        if s == "pre_image_fc2":
            out.append("pre_image_condition.2"); i += 1; continue
        if s == "hist_fc1":
            out.append("hist_context_embedding.0"); i += 1; continue
        if s == "hist_fc2":
            out.append("hist_context_embedding.2"); i += 1; continue
        if s == "guidance_embedding":
            nxt = segs[i + 1]
            out.append(f"guidance_embedding.{0 if nxt == 'fc1' else 2}")
            i += 2
            continue
        # TransformerV2 internals (blocks.TransformerV2 naming)
        m = re.fullmatch(r"attn_(\d+)", s)
        if m:
            d = m.group(1)
            nxt = segs[i + 1]
            if nxt == "norm":
                out.append(f"layers.{d}.0.norm"); i += 2; continue
            if nxt == "to_qkv":
                out.append(f"layers.{d}.0.fn.to_qkv"); i += 2; continue
            if nxt == "to_out":
                out.append(f"layers.{d}.0.fn.to_out.0"); i += 2; continue
        m = re.fullmatch(r"ff_in_(\d+)", s)
        if m:
            out.append(f"layers.{m.group(1)}.1.net.0.0"); i += 1; continue
        m = re.fullmatch(r"ff_out_(\d+)", s)
        if m:
            out.append(f"layers.{m.group(1)}.1.net.2"); i += 1; continue
        if s == "out_norm" and i == 0:
            out.append("out.0")
            i += 2  # skip GroupNorm32 inner 'norm'
            continue
        if s == "out_conv" and i == 0:
            out.append("out.2")
            i += 1
            continue
        # ResBlock internals
        if s == "in_norm":
            out.append("in_layers.0"); i += 2; continue
        if s == "in_conv":
            out.append("in_layers.2"); i += 1; continue
        if s == "emb_proj":
            out.append("emb_layers.1"); i += 1; continue
        if s == "out_norm":
            out.append("out_layers.0"); i += 2; continue
        if s == "out_conv":
            out.append("out_layers.3"); i += 1; continue
        if s == "skip":
            out.append("skip_connection"); i += 1; continue
        if s == "temporal_conv":
            out.append("temopral_conv"); i += 1; continue  # reference typo
        m = re.fullmatch(r"conv(\d)_norm", s)
        if m:
            out.append(f"conv{m.group(1)}.0"); i += 2; continue
        m = re.fullmatch(r"conv(\d)_conv", s)
        if m:
            k = m.group(1)
            out.append(f"conv{k}." + ("2" if k == "1" else "3"))
            i += 1
            continue
        # transformer internals
        m = re.fullmatch(r"block_(\d+)", s)
        if m:
            out.append(f"transformer_blocks.{m.group(1)}"); i += 1; continue
        if s == "to_out":
            out.append("to_out.0"); i += 1; continue
        if s == "ff":
            nxt = segs[i + 1]
            if nxt == "geglu":
                out.append("ff.net.0.proj"); i += 3; continue
            out.append("ff.net.2"); i += 2; continue
        if s == "norm" and i + 1 < n and segs[i + 1] == "norm":
            out.append("norm"); i += 2; continue  # GroupNorm32 wrapper
        if s in ("kernel", "bias", "scale", "embedding"):
            out.append(_LEAF[s]); i += 1; continue
        out.append(s)
        i += 1
    return ".".join(out)


# --------------------------------------------------------------------------- #
# VAE translation (SD first-stage naming)
# --------------------------------------------------------------------------- #
def translate_vae(segs: List[str]) -> Optional[str]:
    out: List[str] = []
    i = 0
    while i < len(segs):
        s = segs[i]
        m = re.fullmatch(r"(down|up)_(\d+)_block_(\d+)", s)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}.block.{m.group(3)}")
            i += 1
            continue
        m = re.fullmatch(r"(down|up)_(\d+)_attn_(\d+)", s)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}.attn.{m.group(3)}")
            i += 1
            continue
        m = re.fullmatch(r"down_(\d+)_downsample", s)
        if m:
            out.append(f"down.{m.group(1)}.downsample"); i += 1; continue
        m = re.fullmatch(r"up_(\d+)_upsample", s)
        if m:
            out.append(f"up.{m.group(1)}.upsample"); i += 1; continue
        m = re.fullmatch(r"mid_(block_\d+|attn_\d+)", s)
        if m:
            out.append(f"mid.{m.group(1)}"); i += 1; continue
        if s in ("kernel", "bias", "scale"):
            out.append(_LEAF[s]); i += 1; continue
        out.append(s)
        i += 1
    return ".".join(out)


# --------------------------------------------------------------------------- #
# CLIP translation (open_clip naming)
# --------------------------------------------------------------------------- #
def translate_clip(segs: List[str]) -> Optional[str]:
    out: List[str] = []
    i = 0
    while i < len(segs):
        s = segs[i]
        if s == "text":
            i += 1
            continue  # open_clip text params are top-level
        if s == "visual":
            out.append("visual"); i += 1; continue
        m = re.fullmatch(r"resblocks_(\d+)", s)
        if m:
            out.append(f"transformer.resblocks.{m.group(1)}"); i += 1; continue
        if s == "attn":
            nxt = segs[i + 1]
            if nxt == "in_proj":
                leaf = segs[i + 2]
                out.append("attn.in_proj_" + _LEAF[leaf])
                return ".".join(out)
            out.append("attn"); i += 1; continue
        if s == "mlp_fc":
            out.append("mlp.c_fc"); i += 1; continue
        if s == "mlp_proj":
            out.append("mlp.c_proj"); i += 1; continue
        if s in ("kernel", "bias", "scale", "embedding"):
            out.append(_LEAF[s]); i += 1; continue
        out.append(s)
        i += 1
    # raw Parameters have no .weight suffix in open_clip. Match on the
    # exact segment — a suffix match would also strip out_proj.weight /
    # mlp.c_proj.weight (caught by tests/test_parity_clip.py)
    if (len(out) >= 2 and out[-1] == "weight" and out[-2] in
            ("positional_embedding", "class_embedding", "text_projection",
             "proj", "logit_scale")):
        out = out[:-1]
    return ".".join(out)


# --------------------------------------------------------------------------- #
# engine-facing loader
# --------------------------------------------------------------------------- #
def load_unet_params(path: str, flax_params, strict: bool = True):
    sd = load_torch_checkpoint(path)
    return remap_state_dict(flax_params, sd, translate_unet, "unet", strict)


def load_vae_params(path: str, flax_params, strict: bool = True):
    sd = strip_prefix(load_torch_checkpoint(path), "first_stage_model.")
    return remap_state_dict(flax_params, sd, translate_vae, "vae", strict)


def load_clip_params(path: str, flax_params, strict: bool = True):
    sd = load_torch_checkpoint(path)
    return remap_state_dict(flax_params, sd, translate_clip, "clip", strict)


def load_model_weights(test_model: str, cfg, unet_params, clip_encoder,
                       autoencoder):
    """Load the main UNet from cfg.test_model; VAE/CLIP from their own
    ``pretrained`` paths when present (reference engines load each
    separately, e.g. inference_text2video_entrance.py:122-161)."""
    import os

    unet_params = load_unet_params(test_model, unet_params, strict=False)
    logger.info("loaded UNet weights from %s", test_model)

    vae_path = cfg.auto_encoder.get("pretrained")
    if vae_path and os.path.exists(vae_path):
        autoencoder.load_params(load_vae_params(vae_path, autoencoder.params,
                                                strict=False))
        logger.info("loaded VAE weights from %s", vae_path)
    clip_path = cfg.embedder.get("pretrained")
    if clip_path and os.path.exists(clip_path):
        clip_encoder.load_params(load_clip_params(clip_path,
                                                  clip_encoder.params,
                                                  strict=False))
        logger.info("loaded CLIP weights from %s", clip_path)
    return unet_params, clip_encoder, autoencoder
