"""KL autoencoder (Stable Diffusion 2.1 first stage) — flax/NHWC.

TPU-native re-implementation of the reference VAE
(reference: tools/modules/autoencoder.py: Encoder :483-578, Decoder
:581-686, DiagonalGaussianDistribution :211-250, AutoencoderKL :20-158,
AutoencoderVideo :160-187). Architecture: ch=128, ch_mult [1,2,4,4],
2 res blocks/level, single-head attention at the bottleneck, GroupNorm(32,
eps 1e-6) + swish, 8x spatial compression to a 4-channel latent.

TPU design: channels-last everywhere; the frame axis folds into batch for
the whole encode/decode (the VAE is purely 2D); attention at the
bottleneck is a plain fused softmax (single head, small seq).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import AUTO_ENCODER, DISTRIBUTION

Dtype = Any


def swish(x):
    return x * jax.nn.sigmoid(x)


def norm(name, dtype=None):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


class ResnetBlock(nn.Module):
    """GN-swish-conv x2 + (1x1) shortcut (reference :276-335)."""
    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c_out = self.out_channels or x.shape[-1]
        h = norm("norm1", self.dtype)(x)
        h = swish(h)
        h = nn.Conv(c_out, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = norm("norm2", self.dtype)(h)
        h = swish(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(c_out, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != c_out:
            x = nn.Conv(c_out, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full attention over h*w tokens at the bottleneck
    (reference :338-389)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        hn = norm("norm", self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(n, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(n, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(n, h * w, c)
        s = jnp.einsum("nqc,nkc->nqk", q, k,
                       preferred_element_type=jnp.float32) * (c ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("nqk,nkc->nqc", p, v).reshape(n, h, w, c)
        o = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)
        return x + o


class DownsampleAE(nn.Module):
    """Stride-2 conv with asymmetric (0,1) padding (reference :462-480)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class UpsampleAE(nn.Module):
    """Nearest 2x + conv (reference :444-459)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    """conv_in -> levels (res x N + down) -> mid (res, attn, res) ->
    GN-swish-conv_out(2*z) (reference :483-578)."""
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dropout: float = 0.0
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        res = self.resolution
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, self.dropout, self.dtype,
                                name=f"down_{i}_block_{j}")(h, deterministic)
                if res in self.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = DownsampleAE(self.dtype, name=f"down_{i}_downsample")(h)
                res //= 2

        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic)

        h = norm("norm_out", self.dtype)(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    """conv_in -> mid -> levels reversed (res x N+1 + up) -> conv_out
    (reference :581-686)."""
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dropout: float = 0.0
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)

        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_1")(h, deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="mid_block_2")(h, deterministic)

        res = self.resolution // 2 ** (len(self.ch_mult) - 1)
        for i in reversed(range(len(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * self.ch_mult[i], self.dropout,
                                self.dtype, name=f"up_{i}_block_{j}")(
                    h, deterministic)
                if res in self.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = UpsampleAE(self.dtype, name=f"up_{i}_upsample")(h)
                res *= 2

        h = norm("norm_out", self.dtype)(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


@DISTRIBUTION.register_class()
class DiagonalGaussianDistribution:
    """Latent posterior N(mean, exp(logvar)) with sample/kl/nll/mode
    (reference :211-250). parameters: [..., 2*z] channels-last."""

    def __init__(self, parameters, deterministic: bool = False):
        self.parameters = parameters
        self.mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.std = self.var = jnp.zeros_like(self.mean)

    def sample(self, key):
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype)

    def kl(self, other=None):
        if self.deterministic:
            return jnp.asarray(0.0)
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0 - self.logvar,
                                 axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes)

    def nll(self, sample, dims=None):
        if self.deterministic:
            return jnp.asarray(0.0)
        logtwopi = jnp.log(2.0 * jnp.pi)
        axes = dims or tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes)

    def mode(self):
        return self.mean


class AutoencoderKLModule(nn.Module):
    """Encoder + Decoder + quantization convs as one flax module."""
    ddconfig: dict
    embed_dim: int = 4
    use_quant_conv: bool = True
    dtype: Optional[Dtype] = None

    def setup(self):
        dd = dict(self.ddconfig)
        self.encoder = Encoder(
            ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            z_channels=dd.get("z_channels", 4),
            double_z=dd.get("double_z", True), dropout=dd.get("dropout", 0.0),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            resolution=dd.get("resolution", 256), dtype=self.dtype)
        self.decoder = Decoder(
            ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            out_ch=dd.get("out_ch", 3), dropout=dd.get("dropout", 0.0),
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            resolution=dd.get("resolution", 256), dtype=self.dtype)
        if self.use_quant_conv:
            zc = dict(self.ddconfig).get("z_channels", 4)
            self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1),
                                      dtype=self.dtype)
            self.post_quant_conv = nn.Conv(zc, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        h = self.encoder(x)
        if self.use_quant_conv:
            h = self.quant_conv(h)
        return h

    def decode_latent(self, z):
        if self.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x, key=None, sample_posterior: bool = True):
        moments = self.encode_moments(x)
        posterior = DiagonalGaussianDistribution(moments)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        return self.decode_latent(z), posterior


class AutoencoderKL:
    """Engine-facing wrapper holding (module, params): the registry-built
    object (reference AutoencoderKL :20-158). Frozen — params are loaded
    from a pretrained checkpoint, never trained here."""

    def __init__(self, ddconfig, embed_dim: int = 4, pretrained=None,
                 use_quant_conv: bool = True, dtype=None, **kwargs):
        self.module = AutoencoderKLModule(ddconfig=dict(ddconfig),
                                          embed_dim=embed_dim,
                                          use_quant_conv=use_quant_conv,
                                          dtype=dtype)
        self.ddconfig = dict(ddconfig)
        self.pretrained = pretrained
        self.params = None  # set via load_params / init_random

    # ---- param management -------------------------------------------- #
    def init_random(self, key, image_size: int = 32):
        x = jnp.zeros((1, image_size, image_size,
                       self.ddconfig.get("in_channels", 3)))
        # jit: eager init is op-by-op (~minutes through the TPU tunnel)
        self.params = jax.jit(lambda k: self.module.init(
            k, x, sample_posterior=False))(key)
        return self.params

    def load_params(self, params):
        self.params = params
        return self

    # ---- reference API ------------------------------------------------ #
    def encode(self, x, params=None):
        """x [n,h,w,3] -> DiagonalGaussianDistribution over [n,h/8,w/8,4]."""
        p = params or self.params
        moments = self.module.apply(p, x, method="encode_moments")
        return DiagonalGaussianDistribution(moments)

    def decode(self, z, params=None):
        p = params or self.params
        return self.module.apply(p, z, method="decode_latent")

    def encode_first_stage(self, x, key, scale_factor: float = 1.0,
                           params=None):
        """Sample the posterior and scale (reference encode_firsr_stage
        :85-90 — typo kept as an alias below)."""
        return self.encode(x, params).sample(key) * scale_factor

    # reference-spelling alias (tools/modules/autoencoder.py:85)
    encode_firsr_stage = encode_first_stage


AUTO_ENCODER.register_class("AutoencoderKL")(AutoencoderKL)


@AUTO_ENCODER.register_class("AutoencoderVideo")
class AutoencoderVideo(AutoencoderKL):
    """Video variant: no quantization convs (reference :160-187)."""

    def __init__(self, ddconfig, embed_dim: int = 4, pretrained=None,
                 dtype=None, **kwargs):
        super().__init__(ddconfig, embed_dim=embed_dim, pretrained=pretrained,
                         use_quant_conv=False, dtype=dtype, **kwargs)


@AUTO_ENCODER.register_class("IdentityFirstStage")
class IdentityFirstStage:
    """Pass-through first stage (reference :190-207)."""

    def __init__(self, **kwargs):
        self.params = {}

    def encode(self, x, *a, **k):
        return x

    def decode(self, z, *a, **k):
        return z

    def encode_first_stage(self, x, key=None, scale_factor=1.0, **k):
        return x * scale_factor

    encode_firsr_stage = encode_first_stage
