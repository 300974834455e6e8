"""torch->flax key translations for the annotator networks."""

from __future__ import annotations

import re
from typing import List, Optional

from ..utils.ckpt import _LEAF


def translate_pidinet(segs: List[str]) -> Optional[str]:
    """flax PiDiNetConverted path -> reference pidinet state-dict key
    (reference pidinet.py naming: init_block, blockS_J.{conv1,conv2,
    shortcut}, dilations.N.{conv1,conv2_K}, attentions.N.{conv1,conv2},
    conv_reduces.N.conv, classifier)."""
    out = []
    i = 0
    while i < len(segs):
        s = segs[i]
        m = re.fullmatch(r"(dilations|attentions|conv_reduces)_(\d)", s)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}")
            if m.group(1) == "conv_reduces":
                out.append("conv")
            i += 1
            continue
        if s in ("kernel", "bias", "scale"):
            out.append(_LEAF[s]); i += 1; continue
        out.append(s)
        i += 1
    return ".".join(out)


def translate_sketch_gan(segs: List[str]) -> Optional[str]:
    """flax SketchSimplification layer_{i} -> reference Sequential index
    (conv/ReLU pairs: layer i -> torch index 2*i)."""
    out = []
    i = 0
    while i < len(segs):
        s = segs[i]
        m = re.fullmatch(r"layer_(\d+)", s)
        if m:
            out.append(f"layers.{2 * int(m.group(1))}")
            i += 1
            continue
        if s in ("kernel", "bias", "scale"):
            out.append(_LEAF[s]); i += 1; continue
        out.append(s)
        i += 1
    return ".".join(out)


def translate_midas(segs: List[str]) -> Optional[str]:
    """flax MiDaS path -> reference depth/__init__.py state-dict key."""
    out = []
    i = 0
    n = len(segs)
    while i < n:
        s = segs[i]
        if s in ("pos_embedding", "cls_embedding"):
            return s
        m = re.fullmatch(r"blocks_(\d+)", s)
        if m:
            out.append(f"blocks.{m.group(1)}")
            i += 1
            continue
        m = re.fullmatch(r"fc(\d)", s)
        if m and not (out and out[-1].startswith("blocks.")):
            # neck Sequential(Linear, GELU) -> .0 (block MLPs handled below)
            out.append(f"fc{m.group(1)}.0"); i += 1; continue
        m = re.fullmatch(r"conv(\d)_([abc])", s)
        if m:  # neck Sequentials: indices 0,1,2 (conv3 has only 0,2)
            stage, part = m.group(1), m.group(2)
            if stage == "3":
                idx = {"a": 0, "c": 1}[part]
            else:
                idx = {"a": 0, "b": 1, "c": 2}[part]
            out.append(f"conv{stage}.{idx}")
            i += 1
            continue
        m = re.fullmatch(r"fusion(\d)", s)
        if m:
            out.append(f"fusion{m.group(1)}"); i += 1; continue
        m = re.fullmatch(r"head_(\d)", s)
        if m:
            out.append(f"head.{m.group(1)}"); i += 1; continue
        # MiDaSBlock internals (reference AttentionBlock :57-77 naming:
        # attn.to_qkv / attn.proj / mlp.0 / mlp.2)
        if s == "qkv":
            out.append("attn.to_qkv"); i += 1; continue
        if s == "proj" and out and out[-1].startswith("blocks."):
            out.append("attn.proj"); i += 1; continue
        if s == "fc1" and out and out[-1].startswith("blocks."):
            out.append("mlp.0"); i += 1; continue
        if s == "fc2" and out and out[-1].startswith("blocks."):
            out.append("mlp.2"); i += 1; continue
        # MiDaSResidual convs: Sequential(ReLU, Conv, ReLU, Conv) -> 1, 3
        if s == "conv1" and out and ("layer1" in out[-1] or "layer2" in out[-1]):
            out.append("residual.1"); i += 1; continue
        if s == "conv2" and out and ("layer1" in out[-1] or "layer2" in out[-1]):
            out.append("residual.3"); i += 1; continue
        if s in ("norm1", "norm2", "conv_out", "layer1", "layer2"):
            out.append(s); i += 1; continue
        if s in ("kernel", "bias", "scale"):
            out.append(_LEAF[s]); i += 1; continue
        out.append(s)
        i += 1
    return ".".join(out)
