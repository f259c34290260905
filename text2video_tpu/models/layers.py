"""Shared building blocks for the pose2frame renderer networks.

Conventions (TPU-first):
  * NHWC layout everywhere — C rides the 128-wide lane dimension.
  * bfloat16 activations/params by default, float32 normalisation stats.
  * Upsampling = nearest-resize + conv (no transposed convs: better XLA
    tiling, no checkerboard).
  * Reflection padding + VALID convs where the reference generator family
    (pix2pixHD/vid2vid-style) uses ReflectionPad2d.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from text2video_tpu.ops.phase_conv import (
    depth_to_space2,
    down2x_conv_phase,
    head_conv_phase,
    space_to_depth2,
    upsample2x_conv_phase,
)

Dtype = Any


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    if pad == 0:
        return x
    return jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )


class Conv(nn.Module):
    """Minimal NHWC conv with the same param tree as ``nn.Conv``
    (kernel [kh, kw, cin, cout] float32 under "kernel", bias [cout]) —
    auto-named "Conv_N" like nn.Conv, so existing checkpoints load
    unchanged (same path, shapes, and init rng stream).

    Declared setup-style so phase-form callers (ConvBlock upsample2x,
    the generator heads) can reparameterise the SAME weights into
    coarse-resolution window kernels (ops/phase_conv.py) instead of
    running the padded full-resolution conv.
    """

    features: int
    in_features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features),
            jnp.float32,
        )
        self.b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            self.w.astype(self.dtype),
            (self.stride, self.stride),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + self.b.astype(self.dtype)

    def weights(self):
        return self.w, self.b


class InstanceNorm(nn.Module):
    """Instance normalisation with float32 statistics.

    The vid2vid generator family normalises per-sample, per-channel over
    the spatial axes. Stats are computed in float32 regardless of the
    activation dtype to keep bfloat16 training stable.

    ``phase > 1``: the input is a phase tensor whose channel axis holds
    ``phase`` interleaved spatial copies of each real channel
    (ops/phase_conv.py layout). Stats pool over space AND phases —
    exactly the stats of the full-resolution map — and the (C,) params
    keep their non-phase shape, so checkpoints are layout-independent.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    phase: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, stats=None) -> jax.Array:
        # f32-accumulating reductions WITHOUT materializing an f32 copy of
        # the activation (that copy doubled HBM traffic and dominated the
        # cost at full resolution); var = E[x^2] - E[x]^2 on O(1)-scale
        # activations is numerically fine.
        #
        # ``stats``: precomputed ([B, C] mean, [B, C] var) — the fused
        # resblock kernel emits them from its f32 conv accumulator
        # (ops/fused_resblock.py), so only the affine runs here.
        c = x.shape[-1] // self.phase
        if stats is not None:
            mean, var = stats
        elif self.phase > 1:
            b, h, w, _ = x.shape
            xg = x.reshape(b, h, w, self.phase, c)
            mean = jnp.mean(xg, axis=(1, 2, 3), dtype=jnp.float32)
            m2 = jnp.mean(jnp.square(xg), axis=(1, 2, 3), dtype=jnp.float32)
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        else:
            mean = jnp.mean(x, axis=(1, 2), dtype=jnp.float32)  # [B, C]
            m2 = jnp.mean(jnp.square(x), axis=(1, 2), dtype=jnp.float32)
            var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        mul = (rstd * scale).astype(self.dtype)
        add = (bias - mean * rstd * scale).astype(self.dtype)
        if self.phase > 1:
            mul = jnp.tile(mul, (1, self.phase))
            add = jnp.tile(add, (1, self.phase))
        return x * mul[:, None, None, :] + add[:, None, None, :]


class ConvBlock(nn.Module):
    """ReflectPad -> Conv -> InstanceNorm -> ReLU (norm/act optional).

    ``upsample2x``: compute ``nearest-up(2x) -> this block`` exactly, in
    phase form at the COARSE resolution (ops/phase_conv.py) — same
    parameters and math, ~4x less MXU padding waste for narrow outputs
    and no materialised 2x intermediate. Requires kernel=3, stride=1.
    ``emit_phase`` keeps the output as a [B, h, w, 4*C] phase tensor for
    a consumer that is itself phase-aware (the generator heads).

    ``phase_stem``: the input is a full-resolution map with even H/W;
    run this (stride-1) block as a half-resolution phase window conv
    (head_conv_phase over space_to_depth2(x)) and emit the phase tensor
    — the wide full-res activation XLA would otherwise have to
    space-to-batch is never built. ``from_phase``: the input is a phase
    tensor and this is a stride-2 block; consume it directly
    (down2x_conv_phase), producing the plain half-res output. Both are
    exact reparameterisations of the same Conv parameters.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    norm: bool = True
    act: bool = True
    dtype: Dtype = jnp.bfloat16
    upsample2x: bool = False
    emit_phase: bool = False
    phase_stem: bool = False
    from_phase: bool = False
    # Run the conv through the fused Pallas resblock kernel
    # (ops/fused_resblock.py): one VMEM-resident pass emitting the conv
    # output AND the IN statistics. Same parameters, same math (stats
    # from the f32 accumulator); requires kernel=3, stride=1, norm.
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1] // 4 if self.from_phase else x.shape[-1]
        conv = Conv(
            self.features,
            in_features=in_features,
            kernel=self.kernel,
            stride=self.stride,
            dtype=self.dtype,
        )
        if self.phase_stem:
            if self.stride != 1:
                raise ValueError("phase_stem requires stride=1")
            if self.kernel != 7:
                raise ValueError("phase_stem requires kernel=7")
            k, b = conv.weights()
            y = head_conv_phase(
                space_to_depth2(x.astype(self.dtype)),
                k.astype(self.dtype),
                emit_phase=True,
            )
            y = y + jnp.tile(b, 4).astype(self.dtype)
            if self.norm:
                y = InstanceNorm(dtype=self.dtype, phase=4)(y)
            if self.act:
                y = nn.relu(y)
            return y
        if self.from_phase:
            if self.kernel != 3 or self.stride != 2:
                raise ValueError("from_phase requires kernel=3, stride=2")
            k, b = conv.weights()
            y = down2x_conv_phase(
                x.astype(self.dtype), k.astype(self.dtype)
            )
            y = y + b.astype(self.dtype)
            if self.norm:
                y = InstanceNorm(dtype=self.dtype)(y)
            if self.act:
                y = nn.relu(y)
            return y
        if self.upsample2x:
            if self.kernel != 3 or self.stride != 1:
                raise ValueError("upsample2x requires kernel=3, stride=1")
            k, b = conv.weights()
            y = upsample2x_conv_phase(
                x.astype(self.dtype), k.astype(self.dtype)
            )
            y = y + jnp.tile(b, 4).astype(self.dtype)
            if self.norm:
                y = InstanceNorm(dtype=self.dtype, phase=4)(y)
            if self.act:
                y = nn.relu(y)
            return y if self.emit_phase else depth_to_space2(y)
        if self.fused:
            if self.kernel != 3 or self.stride != 1 or not self.norm:
                raise ValueError("fused requires kernel=3, stride=1, norm")
            from text2video_tpu.ops.fused_resblock import conv3x3_stats

            k, b = conv.weights()
            y, mean, var = conv3x3_stats(x.astype(self.dtype), k, b)
            y = InstanceNorm(dtype=self.dtype)(y, stats=(mean, var))
            return nn.relu(y) if self.act else y
        x = reflect_pad(x, self.kernel // 2)
        x = conv(x)
        if self.norm:
            x = InstanceNorm(dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """Two 3x3 reflect-padded convs with a residual skip (pix2pixHD-style).

    ``fused`` routes both convs through the Pallas fused conv+IN-stats
    kernel (ops/fused_resblock.py) — identical parameters and math, one
    VMEM-resident pass per conv instead of XLA's space-to-batch layout
    copies."""

    features: int
    dtype: Dtype = jnp.bfloat16
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = ConvBlock(self.features, dtype=self.dtype, fused=self.fused)(x)
        h = ConvBlock(
            self.features, act=False, dtype=self.dtype, fused=self.fused
        )(h)
        return x + h


class Upsample(nn.Module):
    """2x nearest-neighbour upsample followed by a 3x3 conv block.

    ``phase_form``: run the mathematically-identical coarse-resolution
    phase conv instead (ConvBlock.upsample2x); ``emit_phase``
    additionally skips the final depth-to-space so a phase-aware head
    can consume the [B, h, w, 4*C] tensor directly.
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    phase_form: bool = False
    emit_phase: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.phase_form:
            return ConvBlock(
                self.features,
                dtype=self.dtype,
                upsample2x=True,
                emit_phase=self.emit_phase,
            )(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return ConvBlock(self.features, dtype=self.dtype)(x)


def downscale2x(x: jax.Array) -> jax.Array:
    """3x3 average-pool stride 2 (the multiscale-D pyramid downsampler)."""
    return nn.avg_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )
