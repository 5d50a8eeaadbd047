"""GCAE — spatio-temporal graph-convolutional autoencoder (pose tokenizer).

Capability parity with the reference GCAE
(/root/reference/shopformer/models/gcae.py:88-549 and
/root/reference/shopformer_2/models/gcae.py:102-613):

- GraphConvolution: A·X·W with a constant normalized skeleton adjacency
- TemporalConvolution: k=9 conv along time, stride s, pad 4, + BatchNorm
- STGCNBlock: gcn -> ReLU -> tcn -> dropout -> +residual -> ReLU (1x1
  conv+BN residual when shape changes)
- Encoder: input BatchNorm over (V,C) features, 4 ST-GCN blocks with channels
  [C, 64, 64, 64, latent], temporal strides from prime factorization of
  seq_len//num_tokens (descending) with an adaptive-average-pool safety net,
  reshape to (B, num_tokens, latent*V) tokens
- Decoder: linear token expansion, ConvTranspose x2 temporal upsampling,
  exact resize to (seq_len, V), conv back to in_channels
- GCAE: encode/decode/forward -> (reconstruction, tokens);
  embedding_dim = latent_channels * num_keypoints

TPU-first design: feature-last (B, T, V, C) layout (C maps to lanes), the
graph conv is two back-to-back einsum contractions XLA tiles onto the MXU,
the adjacency and adaptive-pool matrices are compile-time constants, and all
shapes are static. Inputs in the reference's (B, C, T, V) layout are
auto-permuted.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cvsd_tpu.models.graph import (
    adaptive_pool_matrix,
    compute_strides,
    normalized_skeleton_adjacency,
)

_xavier = nn.initializers.xavier_uniform()


def _maybe_to_btvc(x: jax.Array, in_channels: int) -> Tuple[jax.Array, bool]:
    """Accept both (B,T,V,C) and the reference's (B,C,T,V)
    (reference: shopformer/models/gcae.py:344-346)."""
    if x.shape[-1] != in_channels and x.shape[1] == in_channels:
        return jnp.transpose(x, (0, 2, 3, 1)), True
    return x, False


class GraphConvolution(nn.Module):
    """Spatial graph conv: out = A @ X @ W + b over each (batch, time) slice
    (reference: shopformer/models/gcae.py:88-154)."""

    out_channels: int
    adj: np.ndarray  # (V, V) normalized, static
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, V, C)
        adj = jnp.asarray(self.adj, self.dtype)
        x = jnp.einsum("vw,btwc->btvc", adj, x.astype(self.dtype))
        return nn.Dense(self.out_channels, use_bias=self.use_bias, kernel_init=_xavier, dtype=self.dtype)(x)


class TemporalConvolution(nn.Module):
    """Temporal conv (kernel 9 along T, stride s) + BatchNorm
    (reference: shopformer/models/gcae.py:157-195)."""

    out_channels: int
    stride: int = 1
    kernel_size: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:  # (B, T, V, C)
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1),
            padding=((pad, pad), (0, 0)),
            kernel_init=_xavier,
            dtype=self.dtype,
        )(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)


class STGCNBlock(nn.Module):
    """gcn -> ReLU -> tcn -> dropout -> +residual -> ReLU
    (reference: shopformer/models/gcae.py:198-259)."""

    in_channels: int
    out_channels: int
    adj: np.ndarray
    stride: int = 1
    dropout: float = 0.0
    residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = GraphConvolution(self.out_channels, self.adj, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = TemporalConvolution(self.out_channels, stride=self.stride, dtype=self.dtype)(y, train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        if self.residual:
            if self.in_channels == self.out_channels and self.stride == 1:
                res = x
            else:
                res = nn.Conv(
                    self.out_channels,
                    kernel_size=(1, 1),
                    strides=(self.stride, 1),
                    kernel_init=_xavier,
                    dtype=self.dtype,
                )(x)
                res = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(res)
            y = y + res
        return nn.relu(y)


class GCAEEncoder(nn.Module):
    """ST-GCN encoder compressing (B,T,V,C) -> (B, num_tokens, latent*V) tokens
    (reference: shopformer/models/gcae.py:262-366; v2 stride/pool logic
    shopformer_2/models/gcae.py:272-415)."""

    in_channels: int = 2
    hidden_channels: int = 64
    latent_channels: int = 8
    num_keypoints: int = 18
    seq_len: int = 12
    num_tokens: int = 2
    num_layers: int = 4
    layout: str = "coco_with_neck"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    # reference-mirror options, used by the torch checkpoint importer
    # (utils/shopformer_import.py). Defaults = the TPU-native design.
    strides_override: Any = None  # explicit per-layer strides tuple
    token_order: str = "vc"  # 'vc' (ours, v*C+c) | 'cv' (reference, c*V+v)
    pool_to_tokens: bool = True  # False = v1: emit however many tokens remain

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x, _ = _maybe_to_btvc(x, self.in_channels)
        B, T, V, C = x.shape
        adj = normalized_skeleton_adjacency(self.num_keypoints, self.layout)

        # input BatchNorm over the (V, C) feature pair — the reference's
        # BatchNorm1d over C*V (shopformer/models/gcae.py:296, 350-355)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, axis=(-2, -1), dtype=self.dtype)(x)

        channels = [self.in_channels] + [self.hidden_channels] * (self.num_layers - 1) + [self.latent_channels]
        strides = (tuple(self.strides_override) if self.strides_override is not None
                   else compute_strides(self.seq_len, self.num_tokens, self.num_layers))
        for i in range(self.num_layers):
            x = STGCNBlock(
                channels[i], channels[i + 1], adj, stride=strides[i],
                dropout=self.dropout, dtype=self.dtype,
            )(x, train)

        t_now = x.shape[1]
        if self.pool_to_tokens and t_now != self.num_tokens:
            # adaptive average pool as a constant matmul (TPU-native form of
            # the AdaptiveAvgPool2d safety net, shopformer_2/models/gcae.py:405-415)
            P = jnp.asarray(adaptive_pool_matrix(t_now, self.num_tokens), self.dtype)
            x = jnp.einsum("ot,btvc->bovc", P, x)
            t_now = self.num_tokens
        if self.token_order == "cv":
            # reference embedding order c*V + v (shopformer/models/gcae.py:361-364)
            return jnp.transpose(x, (0, 1, 3, 2)).reshape(B, t_now, self.latent_channels * V)
        # tokens: (B, t_now, V*latent)
        return x.reshape(B, t_now, V * self.latent_channels)


class GCAEDecoder(nn.Module):
    """Token decoder: linear expansion -> ConvTranspose x2 temporal upsampling
    -> exact resize to (seq_len, V) -> conv to in_channels
    (reference: shopformer/models/gcae.py:369-478)."""

    in_channels: int = 2
    hidden_channels: int = 64
    latent_channels: int = 8
    num_keypoints: int = 18
    seq_len: int = 12
    num_tokens: int = 2
    dtype: Any = jnp.float32
    # 'tpu' (ours) | 'ref' — exact mirror of the reference decoder stack
    # (shopformer/models/gcae.py:369-478 == shopformer_2:430-530), used by
    # the torch checkpoint importer
    variant: str = "tpu"
    num_layers: int = 4
    token_order: str = "vc"

    @nn.compact
    def __call__(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        if self.variant == "ref":
            return self._ref_forward(tokens, train)
        B = tokens.shape[0]
        V = self.num_keypoints
        x = nn.Dense(V * self.hidden_channels, kernel_init=_xavier, dtype=self.dtype)(tokens)
        x = nn.relu(x)
        x = x.reshape(B, self.num_tokens, V, self.hidden_channels)

        # x2 upsampling layers until we meet/exceed seq_len
        # (reference _compute_upsample_factors, shopformer/models/gcae.py:437-449)
        n_up = max(0, math.ceil(math.log2(self.seq_len / self.num_tokens))) if self.seq_len > self.num_tokens else 0
        for _ in range(n_up):
            x = nn.ConvTranspose(
                self.hidden_channels, kernel_size=(4, 1), strides=(2, 1), padding="SAME",
                kernel_init=_xavier, dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            x = nn.relu(x)

        if x.shape[1] != self.seq_len:
            # bilinear fallback to the exact (seq_len, V) grid
            # (reference: shopformer/models/gcae.py:475-477)
            x = jax.image.resize(x, (B, self.seq_len, V, x.shape[-1]), method="linear")

        pad = 4
        x = nn.Conv(self.in_channels, kernel_size=(9, 1), padding=((pad, pad), (0, 0)),
                    kernel_init=_xavier, dtype=self.dtype)(x)
        return x  # (B, seq_len, V, in_channels)

    @staticmethod
    def ref_upsample_factors(num_tokens: int, seq_len: int, num_layers: int) -> list:
        """The reference's greedy x2 upsample plan (shopformer/models/
        gcae.py:437-449): double while it stays <= seq_len, one layer at a
        time; remainder handled by bilinear interpolation."""
        factors = [1] * num_layers
        current = num_tokens
        for i in range(num_layers):
            if current < seq_len and current * 2 <= seq_len:
                factors[i] = 2
                current *= 2
        return factors

    def _ref_forward(self, tokens: jax.Array, train: bool) -> jax.Array:
        """Exact mirror of the reference decoder (shopformer/models/
        gcae.py:369-478): Linear expansion (no activation), per-layer
        ConvTranspose(k=f, s=f) or 1x1 Conv with BN+ReLU between (not after
        the last), bilinear resize to (seq_len, V). Shape-agnostic in the
        token count (v1 may feed more tokens than `num_tokens`)."""
        B, T = tokens.shape[0], tokens.shape[1]
        V, H = self.num_keypoints, self.hidden_channels
        x = nn.Dense(V * H, kernel_init=_xavier, dtype=self.dtype)(tokens)
        if self.token_order == "cv":
            # reference embed order h*V + v -> (B, T, h, V) -> feature-last
            x = jnp.transpose(x.reshape(B, T, H, V), (0, 1, 3, 2))
        else:
            x = x.reshape(B, T, V, H)
        factors = self.ref_upsample_factors(self.num_tokens, self.seq_len, self.num_layers)
        channels = [H] * (self.num_layers - 1) + [self.in_channels]
        for i in range(self.num_layers):
            f, out_ch = factors[i], channels[i]
            if f > 1:
                x = nn.ConvTranspose(
                    out_ch, kernel_size=(f, 1), strides=(f, 1), padding="VALID",
                    kernel_init=_xavier, dtype=self.dtype,
                )(x)
            else:
                x = nn.Conv(out_ch, kernel_size=(1, 1), kernel_init=_xavier,
                            dtype=self.dtype)(x)
            if i < self.num_layers - 1:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
        if x.shape[1] != self.seq_len:
            x = jax.image.resize(x, (B, self.seq_len, V, x.shape[-1]), method="linear")
        return x  # (B, seq_len, V, in_channels)


class GCAE(nn.Module):
    """Graph-conv autoencoder: encode -> tokens, decode -> reconstruction
    (reference: shopformer/models/gcae.py:481-549)."""

    in_channels: int = 2
    hidden_channels: int = 64
    latent_channels: int = 8
    num_keypoints: int = 18
    seq_len: int = 12
    num_tokens: int = 2
    num_layers: int = 4
    layout: str = "coco_with_neck"
    dropout: float = 0.0
    dtype: Any = jnp.float32
    # reference-mirror options (torch checkpoint import); defaults = ours
    strides_override: Any = None
    token_order: str = "vc"
    pool_to_tokens: bool = True
    decoder_variant: str = "tpu"

    @property
    def embedding_dim(self) -> int:
        return self.latent_channels * self.num_keypoints

    def setup(self):
        kw = dict(
            in_channels=self.in_channels,
            hidden_channels=self.hidden_channels,
            latent_channels=self.latent_channels,
            num_keypoints=self.num_keypoints,
            seq_len=self.seq_len,
            num_tokens=self.num_tokens,
            dtype=self.dtype,
        )
        self.encoder = GCAEEncoder(num_layers=self.num_layers, layout=self.layout,
                                   dropout=self.dropout,
                                   strides_override=self.strides_override,
                                   token_order=self.token_order,
                                   pool_to_tokens=self.pool_to_tokens, **kw)
        self.decoder = GCAEDecoder(variant=self.decoder_variant,
                                   num_layers=self.num_layers,
                                   token_order=self.token_order, **kw)

    def encode(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.encoder(x, train)

    def decode(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        return self.decoder(tokens, train)

    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        x, permuted = _maybe_to_btvc(x, self.in_channels)
        tokens = self.encoder(x, train)
        recon = self.decoder(tokens, train)
        if permuted:
            recon = jnp.transpose(recon, (0, 3, 1, 2))
        return recon, tokens

    @classmethod
    def from_config(cls, config: Dict[str, Any], dtype: Any = jnp.float32) -> "GCAE":
        m = config["model"]
        return cls(
            in_channels=int(m.get("in_channels", 2)),
            hidden_channels=int(m.get("hidden_channels", 64)),
            latent_channels=int(m.get("latent_channels", 8)),
            num_keypoints=int(m.get("num_keypoints", 18)),
            seq_len=int(m.get("seq_len", 12)),
            num_tokens=int(m.get("num_tokens", 2)),
            num_layers=int(m.get("gcae_layers", 4)),
            layout=m.get("layout", "coco_with_neck"),
            dropout=float(m.get("dropout", 0.0)),
            dtype=dtype,
            strides_override=(tuple(m["gcae_strides"]) if m.get("gcae_strides") else None),
            token_order=m.get("token_order", "vc"),
            pool_to_tokens=bool(m.get("pool_to_tokens", True)),
            decoder_variant=m.get("gcae_decoder_variant", "tpu"),
        )
