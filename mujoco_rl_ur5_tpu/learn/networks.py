"""Fully-convolutional grasp Q-networks in Flax linen.

Capability parity with the reference's torch Modules.py:
  * Perception module (Modules.py:159-194): 4-ch RGB-D input -> 64 feature
    conv, two 2x2 max-pools, ResNet basic blocks 64 -> 128 -> 256 -> 512,
    so a 200x200 input becomes a 50x50x512 feature map.
  * Single-rotation head  (Modules.py:196-241) -> `resnet()` / the softmax
    `policy_resnet()` factory (Modules.py:300-308).
  * Multidiscrete head (Modules.py:243-298): 512 -> 256 -> 128 -> 2x bilinear
    upsample -> 64 -> 2x upsample -> 1x1 conv -> 6 rotation channels with a
    sigmoid, producing a dense (H, W) x 6 grasp-probability map whose flat
    argmax is the action (flat = rot * H*W + y * W + x,
    Grasping_Agent_multidiscrete.py:254,381-386).

TPU re-design decisions (not a torch translation):
  * NHWC layout end-to-end — XLA's native conv layout on TPU; channel count
    is the minor-most (lane) dimension so 64/128/256/512 channels tile the
    8x128 vregs and the MXU exactly.
  * bfloat16 compute / float32 params ("param_dtype") — convs hit the MXU at
    full rate; BatchNorm statistics accumulate in f32 for stability.
  * Bilinear resize via `jax.image.resize` (XLA lowers this to a pair of
    matmuls on TPU) instead of torch's Upsample module.
  * The network is pure: apply(params, x) — no .to(device), no module-level
    mutable state; batch statistics live in the `batch_stats` collection.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    """ResNet-v1 basic block (3x3 + 3x3, identity or 1x1-projected skip).

    Mirrors the capability of Modules.py:92-143 (conv3x3/BasicBlock).
    """

    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="proj")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype, name="bn_proj")(residual)
        return nn.relu(y + residual)


class PerceptionModule(nn.Module):
    """4-ch RGB-D -> 512-ch feature map at 1/4 resolution.

    Capability of Modules.py:159-194: conv(4->64) + pool, blocks 64->128
    (pool) ->256->512; 200x200 -> 50x50.
    """

    dtype: Dtype = jnp.bfloat16
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool):
        w = self.widths
        x = nn.Conv(w[0], (3, 3), use_bias=False, dtype=self.dtype,
                    name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = BasicBlock(w[1], dtype=self.dtype, name="block1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = BasicBlock(w[2], dtype=self.dtype, name="block2")(x, train)
        x = BasicBlock(w[3], dtype=self.dtype, name="block3")(x, train)
        return x


def _resize2x(x):
    """2x bilinear upsample (NHWC). XLA lowers resize to MXU matmuls."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class GraspingHead(nn.Module):
    """512 -> 256 -> 128 -> up2x -> 64 -> up2x -> 1x1 conv -> `out` channels.

    Capability of Modules.py:243-298 (multidiscrete, out=6) and :196-241
    (single map, out=1)."""

    out: int = 6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = BasicBlock(256, dtype=self.dtype, name="block1")(x, train)
        x = BasicBlock(128, dtype=self.dtype, name="block2")(x, train)
        x = _resize2x(x)
        x = BasicBlock(64, dtype=self.dtype, name="block3")(x, train)
        x = _resize2x(x)
        x = nn.Conv(self.out, (1, 1), dtype=self.dtype, name="head")(x)
        return x


class MultidiscreteResnet(nn.Module):
    """Dense per-pixel-per-rotation grasp-Q network.

    apply(..., x[B,H,W,4], train) -> logits (B, rotations, H, W) in f32.
    The flat action index uses the reference layout flat = r*H*W + y*W + x
    (Grasping_Agent_multidiscrete.py:381-386), so callers can
    `logits.reshape(B, -1)` exactly like the torch `.view(-1)`.

    `sigmoid=False` returns logits (preferred: pair with the numerically
    stable BCE-with-logits loss in agent.py); `sigmoid=True` matches the
    reference's in-network sigmoid (Modules.py:284).
    """

    rotations: int = 6
    dtype: Dtype = jnp.bfloat16
    sigmoid: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        feat = PerceptionModule(dtype=self.dtype, name="perception")(x, train)
        q = GraspingHead(out=self.rotations, dtype=self.dtype,
                         name="grasping")(feat, train)
        q = q.astype(jnp.float32)
        if self.sigmoid:
            q = nn.sigmoid(q)
        return jnp.transpose(q, (0, 3, 1, 2))   # (B, rot, H, W) flat layout


def multidiscrete_resnet(number_rotations: int = 6,
                         dtype: Dtype = jnp.bfloat16) -> MultidiscreteResnet:
    """Factory, parity with MULTIDISCRETE_RESNET(n) (Modules.py:310-311)."""
    return MultidiscreteResnet(rotations=number_rotations, dtype=dtype)


def resnet(dtype: Dtype = jnp.bfloat16) -> MultidiscreteResnet:
    """Single-channel Q-map factory (Modules.py:300-304 RESNET)."""
    return MultidiscreteResnet(rotations=1, dtype=dtype)


class PolicyResnet(nn.Module):
    """Softmax-over-all-pixels policy head (Modules.py:306-308)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = MultidiscreteResnet(rotations=1, dtype=self.dtype,
                                name="net")(x, train)
        b = q.shape[0]
        return jax.nn.softmax(q.reshape(b, -1), axis=-1)


def policy_resnet(dtype: Dtype = jnp.bfloat16) -> PolicyResnet:
    return PolicyResnet(dtype=dtype)


def count_parameters(params) -> int:
    """Total trainable parameter count (Modules.py:314-325)."""
    return sum(p.size for p in jax.tree.leaves(params))
