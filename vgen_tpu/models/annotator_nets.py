"""Annotator networks: PiDiNet (sketch), SketchSimplification GAN, MiDaS.

TPU-native re-implementations of the condition-extractor CNNs
(reference: tools/annotator/sketch/pidinet.py:411-772,
sketch_simplification.py:15-114, tools/annotator/depth/__init__.py:78-309).
The vcomposer engine uses the CONVERTED pidinet (vanilla convs — the
pixel-difference ops folded into released weights, pidinet_bsd with
vanilla_cnn=True, reference inference_tft2v_vcomposer_entrance.py:319),
so the flax port uses plain convolutions. All NHWC.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# carv4 layer ops (reference pidinet.py:252-269); after conversion 'rd'
# becomes a 5x5 depthwise conv, the rest 3x3
CARV4 = ["cd", "ad", "rd", "cv"] * 4


class PDCBlockConverted(nn.Module):
    """Depthwise conv (3x3, or 5x5 for 'rd') + ReLU + pointwise conv,
    residual; stride-2 via maxpool + 1x1 shortcut (reference :527-556)."""
    pdc: str
    out_channels: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.stride > 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        k = 5 if self.pdc == "rd" else 3
        pad = 2 if self.pdc == "rd" else 1
        y = nn.Conv(x.shape[-1], (k, k), padding=pad,
                    feature_group_count=x.shape[-1], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        if self.stride > 1:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return y + x


class CDCM(nn.Module):
    """Compact dilation module: 1x1 + four dilated 3x3, summed
    (reference :466-489)."""
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="conv1")(x)
        out = 0
        for i, d in enumerate((5, 7, 9, 11)):
            out = out + nn.Conv(self.out_channels, (3, 3), padding=d,
                                kernel_dilation=(d, d), use_bias=False,
                                dtype=self.dtype, name=f"conv2_{i + 1}")(x)
        return out


class CSAM(nn.Module):
    """Compact spatial attention (reference :444-464)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(4, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = nn.Conv(1, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        return x * jax.nn.sigmoid(y)


class PiDiNetConverted(nn.Module):
    """pidinet_bsd (inplane 60, dil 24... reference uses inplane=60 for
    bsd: pidinet.py:732-746 — bsd: PiDiNet(60, pdcs, dil=24, sa=True)).
    Returns sigmoid edge map [b, h, w, 1]."""
    inplane: int = 60
    dil: int = 24
    sa: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        pdcs = CARV4
        planes = [self.inplane, self.inplane * 2, self.inplane * 4,
                  self.inplane * 4]
        k0 = 5 if pdcs[0] == "rd" else 3
        xi = nn.Conv(self.inplane, (k0, k0), padding=k0 // 2, use_bias=False,
                     dtype=self.dtype, name="init_block")(x)

        feats = []
        li = 1
        cur = self.inplane
        for stage, plane in enumerate(planes):
            nblocks = 3 if stage == 0 else 4
            for j in range(nblocks):
                stride = 2 if (stage > 0 and j == 0) else 1
                xi = PDCBlockConverted(pdcs[li], plane, stride=stride,
                                       dtype=self.dtype,
                                       name=f"block{stage + 1}_{j + (2 if stage == 0 else 1)}"
                                       if False else f"block{stage + 1}_{j + 1}")(xi)
                li += 1
            feats.append(xi)
        # NOTE: stage 0 uses pdcs[1:4] (init block consumed pdcs[0]); the
        # enumeration above walks pdcs[1:16] in order like the reference.

        outs = []
        for i, f in enumerate(feats):
            y = CDCM(self.dil, dtype=self.dtype, name=f"dilations_{i}")(f)
            if self.sa:
                y = CSAM(dtype=self.dtype, name=f"attentions_{i}")(y)
            y = nn.Conv(1, (1, 1), dtype=self.dtype,
                        name=f"conv_reduces_{i}")(y)
            y = jax.image.resize(y, (b, h, w, 1), method="bilinear")
            outs.append(y)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="classifier")(
            jnp.concatenate(outs, axis=-1))
        return jax.nn.sigmoid(out)


class SketchSimplification(nn.Module):
    """Sketch-simplification GAN generator (reference
    sketch_simplification.py:15-80). Input [b,h,w,1] in [0,1], sketch
    dark; h,w divisible by 8."""
    mean: float = 0.9664114577640158
    std: float = 0.0858381272736797
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = (x - self.mean) / self.std
        spec = [  # (kind, out_ch, kernel, stride)
            ("c", 48, 5, 2), ("c", 128, 3, 1), ("c", 128, 3, 1),
            ("c", 128, 3, 2), ("c", 256, 3, 1), ("c", 256, 3, 1),
            ("c", 256, 3, 2), ("c", 512, 3, 1), ("c", 1024, 3, 1),
            ("c", 1024, 3, 1), ("c", 1024, 3, 1), ("c", 1024, 3, 1),
            ("c", 512, 3, 1), ("c", 256, 3, 1),
            ("t", 256, 4, 2), ("c", 256, 3, 1), ("c", 128, 3, 1),
            ("t", 128, 4, 2), ("c", 128, 3, 1), ("c", 48, 3, 1),
            ("t", 48, 4, 2), ("c", 24, 3, 1),
        ]
        for i, (kind, ch, k, s) in enumerate(spec):
            if kind == "c":
                x = nn.Conv(ch, (k, k), strides=(s, s), padding=k // 2,
                            dtype=self.dtype, name=f"layer_{i}")(x)
            else:
                # torch ConvTranspose2d(k=4, s=2, p=1): flax padding per
                # side is k - 1 - p_torch = 2
                x = nn.ConvTranspose(ch, (k, k), strides=(s, s),
                                     padding=((2, 2), (2, 2)),
                                     transpose_kernel=True,
                                     dtype=self.dtype, name=f"layer_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                    name=f"layer_{len(spec)}")(x)
        return jax.nn.sigmoid(x)


class MiDaSBlock(nn.Module):
    """Pre-LN attention block (reference depth/__init__.py:57-77)."""
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.attention import attention
        b, s, c = x.shape
        d = c // self.heads
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        o = attention(q.reshape(b, s, self.heads, d),
                      k.reshape(b, s, self.heads, d),
                      v.reshape(b, s, self.heads, d)).reshape(b, s, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="proj")(o)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c, dtype=self.dtype, name="fc2")(h)


def _resize_align_corners(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear resize with torch ``align_corners=True`` semantics
    (corner pixels map to corners; jax.image.resize is half-pixel)."""
    b, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, :, None]
    xh = x[:, y0] * (1 - wy) + x[:, y1] * wy
    return xh[:, :, x0] * (1 - wx) + xh[:, :, x1] * wx


class MiDaSResidual(nn.Module):
    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class MiDaSFusion(nn.Module):
    """Fusion block: residual refine + 2x bilinear upsample + 1x1
    (reference :141-160)."""
    dim: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + MiDaSResidual(self.dim, dtype=self.dtype,
                                  name="layer1")(skip)
        x = MiDaSResidual(self.dim, dtype=self.dtype, name="layer2")(x)
        b, h, w, c = x.shape
        x = _resize_align_corners(x, h * 2, w * 2)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv_out")(x)


class MiDaS(nn.Module):
    """MiDaS v3.0 DPT-Large (reference :162-295): ViT-L backbone tapped
    at 4 depths, readout-concat necks, top-down fusion, depth head.
    Input [b, h, w, 3] (h, w divisible by 32); output [b, h, w, 1]."""
    image_size: int = 384
    patch_size: int = 16
    dim: int = 1024
    neck_dims: Tuple[int, ...] = (256, 512, 1024, 1024)
    fusion_dim: int = 256
    num_heads: int = 16
    num_layers: int = 24
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        p = self.patch_size
        hp, wp, grid = h // p, w // p, self.image_size // p

        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, grid * grid + 1, self.dim))
        cls = self.param("cls_embedding", nn.initializers.zeros,
                         (1, 1, self.dim))
        pos_grid = pos[:, 1:].reshape(1, grid, grid, self.dim)
        pos_grid = jax.image.resize(pos_grid, (1, hp, wp, self.dim),
                                    method="bilinear")
        pos_full = jnp.concatenate(
            [pos[:, :1], pos_grid.reshape(1, hp * wp, self.dim)], axis=1)

        t = nn.Conv(self.dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embedding")(x).reshape(b, hp * wp, self.dim)
        t = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), t],
                            axis=1) + pos_full

        stride = self.num_layers // 4
        taps = []
        li = 0
        for stage in range(4):
            for _ in range(stride):
                t = MiDaSBlock(self.num_heads, dtype=self.dtype,
                               name=f"blocks_{li}")(t)
                li += 1
            tap = jnp.concatenate(
                [t[:, 1:], jnp.broadcast_to(t[:, :1], t[:, 1:].shape)],
                axis=-1)
            tap = nn.Dense(self.dim, dtype=self.dtype,
                           name=f"fc{stage + 1}")(tap)
            tap = nn.gelu(tap, approximate=False)
            taps.append(tap.reshape(b, hp, wp, self.dim))

        # necks (reference conv1..conv4)
        n1 = nn.Conv(self.neck_dims[0], (1, 1), dtype=self.dtype,
                     name="conv1_a")(taps[0])
        n1 = nn.ConvTranspose(self.neck_dims[0], (4, 4), strides=(4, 4),
                              transpose_kernel=True,
                              dtype=self.dtype, name="conv1_b")(n1)
        n1 = nn.Conv(self.fusion_dim, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv1_c")(n1)
        n2 = nn.Conv(self.neck_dims[1], (1, 1), dtype=self.dtype,
                     name="conv2_a")(taps[1])
        n2 = nn.ConvTranspose(self.neck_dims[1], (2, 2), strides=(2, 2),
                              transpose_kernel=True,
                              dtype=self.dtype, name="conv2_b")(n2)
        n2 = nn.Conv(self.fusion_dim, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv2_c")(n2)
        n3 = nn.Conv(self.neck_dims[2], (1, 1), dtype=self.dtype,
                     name="conv3_a")(taps[2])
        n3 = nn.Conv(self.fusion_dim, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv3_c")(n3)
        n4 = nn.Conv(self.neck_dims[3], (1, 1), dtype=self.dtype,
                     name="conv4_a")(taps[3])
        n4 = nn.Conv(self.neck_dims[3], (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="conv4_b")(n4)
        n4 = nn.Conv(self.fusion_dim, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv4_c")(n4)

        f4 = MiDaSFusion(self.fusion_dim, dtype=self.dtype, name="fusion4")(n4)
        f3 = MiDaSFusion(self.fusion_dim, dtype=self.dtype,
                         name="fusion3")(f4, n3)
        f2 = MiDaSFusion(self.fusion_dim, dtype=self.dtype,
                         name="fusion2")(f3, n2)
        f1 = MiDaSFusion(self.fusion_dim, dtype=self.dtype,
                         name="fusion1")(f2, n1)

        y = nn.Conv(self.fusion_dim // 2, (3, 3), padding=1,
                    dtype=self.dtype, name="head_0")(f1)
        bb, hh, ww, cc = y.shape
        y = _resize_align_corners(y, hh * 2, ww * 2)
        y = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="head_2")(y)
        y = nn.relu(y)
        y = nn.ConvTranspose(1, (1, 1), transpose_kernel=True,
                             dtype=self.dtype, name="head_4")(y)
        return nn.relu(y)
