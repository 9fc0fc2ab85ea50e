"""CLIP ModifiedResNet visual encoder (RN50 family) returning dense tokens.

Behavioural contract (reference networks/clip_arch.py:156-264):
  - 3-conv stem (3 -> width/2 stride 2 -> width/2 -> width), each BN+ReLU,
    followed by 2x average pooling (clip_arch.py:169-179, 225-230).
  - 4 bottleneck stages with anti-aliased striding: all convs stride 1, an
    AvgPool(stride) sits after conv2 and in front of the 1x1 downsample conv
    (clip_arch.py:12-57). Total stride 32.
  - `__call__` returns the flattened stage-4 feature map [b, hw, width*32]
    plus (h, w) — the reference bypasses attnpool in `forward` and returns
    patch features directly (clip_arch.py:254-255).
  - `attnpool_tokens` is the AttentionPool2d the reference repurposes as the
    dense text-space projection for RN architectures: mean token prepended,
    bicubically-interpolated positional embedding (same +0.1 scale fudge as
    the ViT), one multi-head attention layer with separate q/k/v projections
    and a c_proj to the CLIP embedding dim, returning ALL (1+hw) tokens
    (clip_arch.py:60-126; used via `self.encoder.proj` in
    networks/zutis.py:309-316).

Reference quirks reproduced/documented:
  - "dilatedRN50" carries NO actual dilation — `clip.load(arch.lstrip(
    "dilated"))` (networks/zutis.py:35) strips the prefix, and the only
    behavioural difference is that the x2 token upsample is skipped
    (networks/zutis.py:488-497). The factory maps it accordingly.
  - The reference's RN `image_to_text_space` reshapes the attnpool output
    with the *pre-projection* channel count (`networks/zutis.py:310-316`
    reuses `c` = embed_dim in the `.view`), which raises at runtime for
    every RN arch whose output_dim != embed_dim (all of them). We implement
    the evidently intended behaviour: tokens come back at `output_dim` and
    are reshaped with that.

BatchNorm is FROZEN (reference default `frozen_bn=True`,
networks/zutis.py:26,43; utils/utils.py:98-101): running statistics live as
parameters named `running_mean` / `running_var`, are wrapped in
`stop_gradient`, and the optimiser masks them out of AdamW updates
(engine/optim.py) so weight decay cannot erode them. The affine scale/bias
stay trainable, matching torch `.eval()` BN under an optimiser.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from zutis_tpu.models.layers import MultiHeadAttention
from zutis_tpu.models.vit import interpolate_pos_embed


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm with trainable affine and frozen statistics."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jax.lax.stop_gradient(
            self.param("running_mean", nn.initializers.zeros, (self.features,))
        )
        var = jax.lax.stop_gradient(
            self.param("running_var", nn.initializers.ones, (self.features,))
        )
        # Fold into a single multiply-add in float32, cast once.
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(
            self.dtype
        )
        return x * mul + add


def _avg_pool(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return nn.avg_pool(
        x, window_shape=(stride, stride), strides=(stride, stride)
    )


class Bottleneck(nn.Module):
    """Anti-aliased CLIP bottleneck (reference clip_arch.py:12-57)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: [b, h, w, c]
        conv = lambda feats, k, name: nn.Conv(  # noqa: E731
            feats, kernel_size=(k, k), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, padding=[(k // 2, k // 2)] * 2, name=name,
        )
        out_feats = self.planes * self.expansion

        y = conv(self.planes, 1, "conv1")(x)
        y = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype,
                                    name="bn1")(y))
        y = conv(self.planes, 3, "conv2")(y)
        y = nn.relu(FrozenBatchNorm(self.planes, dtype=self.dtype,
                                    name="bn2")(y))
        if self.stride > 1:
            y = _avg_pool(y, self.stride)
        y = conv(out_feats, 1, "conv3")(y)
        y = FrozenBatchNorm(out_feats, dtype=self.dtype, name="bn3")(y)

        identity = x
        if self.stride > 1 or x.shape[-1] != out_feats:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = conv(out_feats, 1, "downsample_conv")(identity)
            identity = FrozenBatchNorm(
                out_feats, dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(y + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pool returning all tokens (reference clip_arch.py:60-126).

    The positional embedding is stored for `spacial_dim**2` positions and
    bicubically interpolated to the runtime grid with the same +0.1
    scale-factor fudge as the ViT path (clip_arch.py:71-90).
    """

    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int  # input_resolution // 32
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [b, h, w, embed_dim] -> [b, 1 + h*w, output_dim]."""
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
        )
        pe = interpolate_pos_embed(pos, (h, w))
        tokens = tokens + pe.astype(tokens.dtype)[None]

        return MultiHeadAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, out_dim=self.output_dim, name="attn",
        )(tokens, tokens, tokens)


class ModifiedResNet(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)  # RN50
    width: int = 64
    output_dim: int = 1024
    heads: int = 32  # attnpool heads = width * 32 // 64
    input_resolution: int = 224
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @property
    def embed_dim(self) -> int:
        return self.width * 32

    def setup(self):
        conv = lambda feats, stride, name: nn.Conv(  # noqa: E731
            feats, kernel_size=(3, 3), strides=(stride, stride),
            use_bias=False, padding=[(1, 1), (1, 1)], dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        self.conv1 = conv(self.width // 2, 2, "conv1")
        self.bn1 = FrozenBatchNorm(self.width // 2, dtype=self.dtype)
        self.conv2 = conv(self.width // 2, 1, "conv2")
        self.bn2 = FrozenBatchNorm(self.width // 2, dtype=self.dtype)
        self.conv3 = conv(self.width, 1, "conv3")
        self.bn3 = FrozenBatchNorm(self.width, dtype=self.dtype)

        stages = []
        for si, (planes_mult, blocks) in enumerate(
            zip((1, 2, 4, 8), self.layers)
        ):
            planes = self.width * planes_mult
            stride = 1 if si == 0 else 2
            stages.append([
                Bottleneck(
                    planes, stride=(stride if bi == 0 else 1),
                    dtype=self.dtype, name=f"layer{si + 1}_{bi}",
                )
                for bi in range(blocks)
            ])
        self.stages = stages

        self.attnpool = AttentionPool2d(
            embed_dim=self.embed_dim,
            num_heads=self.heads,
            output_dim=self.output_dim,
            spacial_dim=self.input_resolution // 32,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attnpool",
        )

    def _features(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [b, 3, H, W] -> stage-4 feature map [b, H/32, W/32, embed]."""
        x = x.transpose(0, 2, 3, 1).astype(self.dtype)  # NCHW -> NHWC
        x = nn.relu(self.bn1(self.conv1(x)))
        x = nn.relu(self.bn2(self.conv2(x)))
        x = nn.relu(self.bn3(self.conv3(x)))
        x = _avg_pool(x, 2)
        for stage in self.stages:
            for block in stage:
                x = block(x)
        return x

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int, int]:
        """Dense path: ([b, hw, embed_dim] patch features, h, w) — attnpool
        NOT applied, matching reference clip_arch.py:254-255."""
        feat = self._features(x)
        b, h, w, c = feat.shape
        return feat.reshape(b, h * w, c), h, w

    def attnpool_tokens(self, grid: jnp.ndarray) -> jnp.ndarray:
        """Text-space projection for the RN family: run AttentionPool2d over
        a [b, h, w, embed_dim] grid, drop the mean token, return
        [b, h, w, output_dim] (reference networks/zutis.py:309-316, with the
        reshape corrected to the post-projection channel count)."""
        b, h, w, _ = grid.shape
        tokens = self.attnpool(grid)[:, 1:, :]
        return tokens.reshape(b, h, w, self.output_dim)

    def encode_image(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pooled path (original CLIP): attnpool's lead token -> [b, out]."""
        feat = self._features(x)
        return self.attnpool(feat)[:, 0, :]
