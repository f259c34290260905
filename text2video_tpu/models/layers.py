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

Dtype = Any


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    if pad == 0:
        return x
    return jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )


class InstanceNorm(nn.Module):
    """Instance normalisation with float32 statistics.

    The vid2vid generator family normalises per-sample, per-channel over
    the spatial axes. Stats are computed in float32 regardless of the
    activation dtype to keep bfloat16 training stable.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # f32-accumulating reductions WITHOUT materializing an f32 copy of
        # the activation (that copy doubled HBM traffic and dominated the
        # cost at full resolution); var = E[x^2] - E[x]^2 on O(1)-scale
        # activations is numerically fine.
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        m2 = jnp.mean(
            jnp.square(x), axis=(1, 2), keepdims=True, dtype=jnp.float32
        )
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mul = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(self.dtype)
        add = (bias - mean[..., 0, 0, :] * jax.lax.rsqrt(var[..., 0, 0, :] + self.epsilon) * scale).astype(self.dtype)
        return x * mul + add[:, None, None, :]


class ConvBlock(nn.Module):
    """ReflectPad -> Conv -> InstanceNorm -> ReLU (norm/act optional)."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: bool = True
    act: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel // 2
        x = reflect_pad(x, pad)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.norm:
            x = InstanceNorm(dtype=self.dtype)(x)
        if self.act:
            x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """Two 3x3 reflect-padded convs with a residual skip (pix2pixHD-style)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = ConvBlock(self.features, dtype=self.dtype)(x)
        h = ConvBlock(self.features, act=False, dtype=self.dtype)(h)
        return x + h


class Upsample(nn.Module):
    """2x nearest-neighbour upsample followed by a 3x3 conv block."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return ConvBlock(self.features, dtype=self.dtype)(x)


def downscale2x(x: jax.Array) -> jax.Array:
    """3x3 average-pool stride 2 (the multiscale-D pyramid downsampler)."""
    return nn.avg_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )
