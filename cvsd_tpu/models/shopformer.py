"""Shopformer — GCAE tokenizer ⊕ transformer token reconstructor ⊕
reconstruction-error anomaly score.

Capability parity with both reference model generations:
- v1 (/root/reference/shopformer/models/shopformer.py:22-389): separate
  scoring positional encoder (dropout 0, max_len 100) whose PE is ADDED TO
  THE TARGETS in both the normality score (:150-178) and the stage-2 loss
  (train.py:276-282); forward returns {normality_score,
  reconstructed_tokens, gcae_reconstructed, tokens} (:180-220); predict with
  threshold (:222-237); get_anomaly_scores (:239-251); from_config (:253-278);
  stage wrappers' losses (:281-389).
- v2 (/root/reference/shopformer_2/models/shopformer.py:38-306): config-dict
  ctor, plain-MSE anomaly score with no PE on targets (:155-188),
  compute_gcae_loss / compute_transformer_loss (:190-224), per-component
  parameter counts (:226-245), build_shopformer factory (:296-306).

The scoring semantics follow ``variant`` ('v1'|'v2'). Freezing the GCAE for
stage 2 (v1 :114-123 encoder-only; v2 :73-92 whole GCAE) is functional here:
the trainer partitions the param pytree by top-level key ('gcae' /
'transformer') and masks the optimizer — see cvsd_tpu/train/optim.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cvsd_tpu.models.gcae import GCAE
from cvsd_tpu.models.transformer import ShopformerTransformer, sinusoidal_positional_encoding


class Shopformer(nn.Module):
    """Composed anomaly detector (defaults: reference shopformer.py:35-49)."""

    in_channels: int = 2
    hidden_channels: int = 64
    latent_channels: int = 8
    num_keypoints: int = 18
    seq_len: int = 12
    num_tokens: int = 2
    gcae_layers: int = 4
    layout: str = "coco_with_neck"
    num_heads: int = 2
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 64
    dropout: float = 0.1
    variant: str = "v2"
    score_max_len: int = 100
    dtype: Any = jnp.float32
    # reference-mirror options for torch checkpoint import
    # (utils/shopformer_import.py); defaults = the TPU-native design
    gcae_strides: Any = None
    token_order: str = "vc"
    pool_to_tokens: bool = True
    gcae_decoder_variant: str = "tpu"
    transformer_final_norm: bool = False
    ln_eps: float = 1e-6
    d_model_override: Optional[int] = None

    @property
    def d_model(self) -> int:
        return self.d_model_override or (self.latent_channels * self.num_keypoints)

    def setup(self):
        self.gcae = GCAE(
            in_channels=self.in_channels,
            hidden_channels=self.hidden_channels,
            latent_channels=self.latent_channels,
            num_keypoints=self.num_keypoints,
            seq_len=self.seq_len,
            num_tokens=self.num_tokens,
            num_layers=self.gcae_layers,
            layout=self.layout,
            dropout=self.dropout if self.variant == "v1" else 0.0,
            dtype=self.dtype,
            strides_override=self.gcae_strides,
            token_order=self.token_order,
            pool_to_tokens=self.pool_to_tokens,
            decoder_variant=self.gcae_decoder_variant,
        )
        embed = self.latent_channels * self.num_keypoints
        self.transformer = ShopformerTransformer(
            d_model=self.d_model,
            num_heads=self.num_heads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            variant=self.variant,
            dtype=self.dtype,
            input_dim=embed if embed != self.d_model else None,
            final_norm=self.transformer_final_norm,
            ln_eps=self.ln_eps,
        )

    # -- components ----------------------------------------------------------

    def tokenize(self, poses: jax.Array, train: bool = False) -> jax.Array:
        """poses -> (B, num_tokens, d_model) tokens (reference v1 :125-136)."""
        return self.gcae.encode(poses, train)

    def reconstruct_tokens(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        """tokens -> reconstructed tokens via the transformer (v1 :138-148)."""
        return self.transformer(tokens, train)

    def decode_tokens(self, tokens: jax.Array, train: bool = False) -> jax.Array:
        return self.gcae.decode(tokens, train)

    def gcae_forward(self, poses: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """(reconstruction, tokens) — the stage-1 forward."""
        return self.gcae(poses, train)

    # -- scoring ---------------------------------------------------------------

    def score_target(self, tokens: jax.Array) -> jax.Array:
        """The reconstruction target used by both the score and the stage-2
        loss: tokens + PE under v1 (shopformer/models/shopformer.py:150-178,
        train.py:276-282), plain tokens under v2 (:179-184)."""
        if self.variant == "v1":
            pe = jnp.asarray(
                sinusoidal_positional_encoding(self.score_max_len, self.d_model), tokens.dtype
            )
            return tokens + pe[None, : tokens.shape[1], :]
        return tokens

    def compute_normality_score(self, tokens: jax.Array, recon_tokens: jax.Array) -> jax.Array:
        """Per-sample mean MSE between reconstructed tokens and the variant
        target; higher = more anomalous."""
        return jnp.mean((recon_tokens - self.score_target(tokens)) ** 2, axis=(1, 2))

    def compute_anomaly_score(self, poses: jax.Array) -> jax.Array:
        """poses -> per-sample anomaly score, eval mode
        (reference: shopformer_2/models/shopformer.py:155-188)."""
        tokens = self.tokenize(poses, train=False)
        recon = self.reconstruct_tokens(tokens, train=False)
        return self.compute_normality_score(tokens, recon)

    # -- full forward ------------------------------------------------------------

    def __call__(
        self, poses: jax.Array, train: bool = False, decode_poses: bool = True
    ) -> Dict[str, jax.Array]:
        """Full forward returning the v1 output dict
        (reference: shopformer/models/shopformer.py:180-220)."""
        tokens = self.tokenize(poses, train)
        recon_tokens = self.reconstruct_tokens(tokens, train)
        out = {
            "tokens": tokens,
            "reconstructed_tokens": recon_tokens,
            "normality_score": self.compute_normality_score(tokens, recon_tokens),
        }
        if decode_poses:
            out["gcae_reconstructed"] = self.decode_tokens(tokens, train)
        return out

    def predict(self, poses: jax.Array, threshold: float = 0.5) -> Dict[str, jax.Array]:
        """Binary anomaly predictions at a threshold
        (reference: shopformer/models/shopformer.py:222-237)."""
        scores = self.compute_anomaly_score(poses)
        return {"scores": scores, "predictions": (scores >= threshold).astype(jnp.int32)}

    def get_anomaly_scores(self, poses: jax.Array) -> jax.Array:
        """Alias for compute_anomaly_score
        (reference: shopformer/models/shopformer.py:239-251)."""
        return self.compute_anomaly_score(poses)

    # -- losses (stage wrappers' semantics, v1 :281-389 / v2 :190-224) -------------

    def compute_gcae_loss(
        self, poses: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """Stage-1 MSE between GCAE reconstruction and input poses."""
        recon, _ = self.gcae(poses, train)
        err = jnp.mean((recon - poses) ** 2, axis=(1, 2, 3))
        return _masked_mean(err, mask)

    def compute_transformer_loss(
        self, poses: jax.Array, train: bool = True, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """Stage-2 MSE between transformer output and the variant target,
        tokens computed with the (frozen) GCAE in eval mode
        (reference: shopformer_2/train.py:316-342)."""
        tokens = jax.lax.stop_gradient(self.tokenize(poses, train=False))
        recon = self.reconstruct_tokens(tokens, train)
        err = jnp.mean((recon - self.score_target(tokens)) ** 2, axis=(1, 2))
        return _masked_mean(err, mask)

    # -- factories ------------------------------------------------------------------

    @classmethod
    def from_config(cls, config: Dict[str, Any], dtype: Any = None) -> "Shopformer":
        """Config-dict ctor (reference v1 :253-278; v2 :38-71, :296-306)."""
        m = config["model"]
        if dtype is None:
            dtype = jnp.dtype(m.get("dtype", "float32"))
        return cls(
            in_channels=int(m.get("in_channels", 2)),
            hidden_channels=int(m.get("hidden_channels", 64)),
            latent_channels=int(m.get("latent_channels", 8)),
            num_keypoints=int(m.get("num_keypoints", 18)),
            seq_len=int(m.get("seq_len", 12)),
            num_tokens=int(m.get("num_tokens", 2)),
            gcae_layers=int(m.get("gcae_layers", 4)),
            layout=m.get("layout", "coco_with_neck"),
            num_heads=int(m.get("num_heads", 2)),
            num_encoder_layers=int(m.get("num_encoder_layers", 2)),
            num_decoder_layers=int(m.get("num_decoder_layers", 2)),
            dim_feedforward=int(m.get("dim_feedforward", 64)),
            dropout=float(m.get("dropout", 0.1)),
            variant=m.get("variant", "v2"),
            dtype=dtype,
            gcae_strides=(tuple(m["gcae_strides"]) if m.get("gcae_strides") else None),
            token_order=m.get("token_order", "vc"),
            pool_to_tokens=bool(m.get("pool_to_tokens", True)),
            gcae_decoder_variant=m.get("gcae_decoder_variant", "tpu"),
            transformer_final_norm=bool(m.get("transformer_final_norm", False)),
            ln_eps=float(m.get("ln_eps", 1e-6)),
            d_model_override=(int(m["d_model"]) if m.get("d_model") else None),
        )

    def init_variables(self, rng: jax.Array, batch_size: int = 2):
        """Initialize {params, batch_stats} for this model's static shapes."""
        dummy = jnp.zeros((batch_size, self.seq_len, self.num_keypoints, self.in_channels), self.dtype)
        return self.init({"params": rng, "dropout": rng}, dummy, train=False)


def build_shopformer(config: Dict[str, Any]) -> Shopformer:
    """Factory (reference: shopformer_2/models/shopformer.py:296-306)."""
    return Shopformer.from_config(config)


def count_parameters(params: Any) -> Dict[str, int]:
    """Per-component parameter counts
    (reference: shopformer_2/models/shopformer.py:226-245)."""
    counts: Dict[str, int] = {}
    total = 0
    for name, sub in params.items():
        n = int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(sub)))
        counts[name] = n
        total += n
    counts["total"] = total
    return counts


def _masked_mean(per_sample: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(per_sample)
    mask = mask.astype(per_sample.dtype)
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)
