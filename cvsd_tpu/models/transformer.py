"""Token transformer — encoder-decoder autoencoder over GCAE tokens.

Capability parity with both reference generations:
- v1 (/root/reference/shopformer/models/transformer.py:14-349): hand-rolled
  post-LN layers with ReLU FFN, shifted-target decoding (zeros start token +
  tokens[:, :-1]), always-on output projection, sinusoidal PE handling odd
  d_model, compute_reconstruction_error (per-sample mean MSE).
- v2 (/root/reference/shopformer_2/models/transformer.py:90-276): pre-LN
  (norm_first) + GELU, identity input/output projections when
  input_dim == d_model, decoder target = the same PE'd input (no shift).

Select with ``variant='v1'|'v2'``. Attention uses flax's fused
dot-product-attention; all shapes static (2-4 tokens x 144 dims — the MXU
work is the projections, which XLA batches across the token axis).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_xavier = nn.initializers.xavier_uniform()


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) sinusoidal table; odd d_model supported
    (reference: shopformer/models/transformer.py:14-57)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)[:, : d_model // 2]
    return pe


class PositionalEncoding(nn.Module):
    """Add sinusoidal PE + dropout (constant table, no params)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pe = jnp.asarray(sinusoidal_positional_encoding(self.max_len, self.d_model), self.dtype)
        x = x + pe[None, : x.shape[1], :]
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class _FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float
    activation: str  # 'relu' (v1) | 'gelu' (v2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # exact (erf) gelu: torch's default, and what the reference's stock
        # v2 layers compute — flax's default tanh approximation differs at
        # the 1e-4 level, enough to break checkpoint-import equivalence
        act = nn.relu if self.activation == "relu" else (
            lambda x: nn.gelu(x, approximate=False))
        x = nn.Dense(self.d_ff, kernel_init=_xavier, dtype=self.dtype)(x)
        x = act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.d_model, kernel_init=_xavier, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class TransformerEncoderLayer(nn.Module):
    """Post-LN (v1) or pre-LN (v2) encoder layer
    (reference: shopformer/models/transformer.py:60-118; v2 uses stock
    norm_first layers, shopformer_2/models/transformer.py:105-136)."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    norm_first: bool = False
    activation: str = "relu"
    dtype: Any = jnp.float32
    ln_eps: float = 1e-6  # torch parity (import) uses 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train, dtype=self.dtype,
        )
        ffn = _FeedForward(self.d_model, self.d_ff, self.dropout, self.activation, self.dtype)
        ln1 = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype)
        ln2 = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype)
        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.norm_first:
            h = ln1(x)
            x = x + drop(attn(h, h, h))
            x = x + ffn(ln2(x), train)
        else:
            x = ln1(x + drop(attn(x, x, x)))
            x = ln2(x + ffn(x, train))
        return x


class TransformerDecoderLayer(nn.Module):
    """Decoder layer: self-attn, cross-attn, FFN — post-LN (v1) or pre-LN (v2)
    (reference: shopformer/models/transformer.py:121-196)."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout: float = 0.1
    norm_first: bool = False
    activation: str = "relu"
    dtype: Any = jnp.float32
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, tgt: jax.Array, memory: jax.Array, train: bool = False) -> jax.Array:
        mk_attn = lambda: nn.MultiHeadDotProductAttention(  # noqa: E731
            num_heads=self.num_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train, dtype=self.dtype,
        )
        self_attn, cross_attn = mk_attn(), mk_attn()
        ffn = _FeedForward(self.d_model, self.d_ff, self.dropout, self.activation, self.dtype)
        ln1, ln2, ln3 = (nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype) for _ in range(3))
        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.norm_first:
            h = ln1(tgt)
            tgt = tgt + drop(self_attn(h, h, h))
            h = ln2(tgt)
            tgt = tgt + drop(cross_attn(h, memory, memory))
            tgt = tgt + ffn(ln3(tgt), train)
        else:
            tgt = ln1(tgt + drop(self_attn(tgt, tgt, tgt)))
            tgt = ln2(tgt + drop(cross_attn(tgt, memory, memory)))
            tgt = ln3(tgt + ffn(tgt, train))
        return tgt


class ShopformerTransformer(nn.Module):
    """Encoder-decoder token reconstructor (defaults: d_model 144, 2 heads,
    2+2 layers, ff 64 — reference: shopformer/models/transformer.py:208-217)."""

    d_model: int = 144
    num_heads: int = 2
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 64
    dropout: float = 0.1
    max_len: int = 100
    input_dim: Optional[int] = None  # != d_model -> Dense projections (v2 :90-99)
    variant: str = "v2"
    dtype: Any = jnp.float32
    # reference-mirror options (torch checkpoint import): the stock torch
    # nn.TransformerEncoder/Decoder the v2 reference builds carry a FINAL
    # LayerNorm after the layer stack (shopformer_2/models/transformer.py:
    # 114-136); torch LayerNorm eps is 1e-5
    final_norm: bool = False
    ln_eps: float = 1e-6

    def setup(self):
        d_in = self.input_dim if self.input_dim is not None else self.d_model
        norm_first = self.variant == "v2"
        activation = "gelu" if self.variant == "v2" else "relu"
        self.in_proj = (
            nn.Dense(self.d_model, kernel_init=_xavier, dtype=self.dtype) if d_in != self.d_model else None
        )
        self.pos_encoder = PositionalEncoding(self.d_model, self.dropout, self.max_len, self.dtype)
        self.enc_layers = [
            TransformerEncoderLayer(self.d_model, self.num_heads, self.dim_feedforward,
                                    self.dropout, norm_first, activation, self.dtype,
                                    self.ln_eps)
            for _ in range(self.num_encoder_layers)
        ]
        self.dec_layers = [
            TransformerDecoderLayer(self.d_model, self.num_heads, self.dim_feedforward,
                                    self.dropout, norm_first, activation, self.dtype,
                                    self.ln_eps)
            for _ in range(self.num_decoder_layers)
        ]
        self.enc_norm = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype) if self.final_norm else None
        self.dec_norm = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype) if self.final_norm else None
        # v1 always projects the output (transformer.py:251,327); v2 only on dim mismatch
        self.out_proj = (
            nn.Dense(d_in, kernel_init=_xavier, dtype=self.dtype)
            if (self.variant == "v1" or d_in != self.d_model)
            else None
        )

    def _embed(self, x: jax.Array, train: bool) -> jax.Array:
        if self.in_proj is not None:
            x = self.in_proj(x)
        return self.pos_encoder(x, train)

    def encode(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        x = self._embed(tokens, train)
        for layer in self.enc_layers:
            x = layer(x, train)
        if self.enc_norm is not None:
            x = self.enc_norm(x)
        return x

    def decode(self, tgt: jax.Array, memory: jax.Array, train: bool = False) -> jax.Array:
        x = self._embed(tgt, train)
        for layer in self.dec_layers:
            x = layer(x, memory, train)
        if self.dec_norm is not None:
            x = self.dec_norm(x)
        return x

    def __call__(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        memory = self.encode(tokens, train)
        if self.variant == "v1":
            # shifted target: zeros start token + tokens[:, :-1]
            # (reference: shopformer/models/transformer.py:319-321)
            start = jnp.zeros_like(tokens[:, :1])
            tgt = jnp.concatenate([start, tokens[:, :-1]], axis=1)
        else:
            # identity target: the decoder sees the same PE'd input
            # (reference: shopformer_2/models/transformer.py:168-189)
            tgt = tokens
        out = self.decode(tgt, memory, train)
        if self.out_proj is not None:
            out = self.out_proj(out)
        return out

    def compute_reconstruction_error(self, tokens: jax.Array, recon: jax.Array) -> jax.Array:
        """Per-sample mean MSE (reference: shopformer/models/transformer.py:331-349)."""
        return jnp.mean((tokens - recon) ** 2, axis=(1, 2))

    @classmethod
    def from_config(cls, config: Dict[str, Any], dtype: Any = jnp.float32) -> "ShopformerTransformer":
        """YAML -> kwargs mapping (reference: shopformer_2/models/transformer.py:227-276)."""
        m = config["model"]
        embed = int(m.get("latent_channels", 8)) * int(m.get("num_keypoints", 18))
        d_model = int(m.get("d_model", embed))
        return cls(
            d_model=d_model,
            input_dim=embed if embed != d_model else None,
            num_heads=int(m.get("num_heads", 2)),
            num_encoder_layers=int(m.get("num_encoder_layers", 2)),
            num_decoder_layers=int(m.get("num_decoder_layers", 2)),
            dim_feedforward=int(m.get("dim_feedforward", 64)),
            dropout=float(m.get("dropout", 0.1)),
            variant=m.get("variant", "v2"),
            dtype=dtype,
            final_norm=bool(m.get("transformer_final_norm", False)),
            ln_eps=float(m.get("ln_eps", 1e-6)),
        )


def build_transformer(config: Dict[str, Any], dtype: Any = jnp.float32) -> ShopformerTransformer:
    """Factory (reference: shopformer_2/models/transformer.py:265-276)."""
    return ShopformerTransformer.from_config(config, dtype)
