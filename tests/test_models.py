import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvsd_tpu.config import get_default_config
from cvsd_tpu.models import (
    GCAE,
    Shopformer,
    ShopformerTransformer,
    adaptive_pool_matrix,
    build_shopformer,
    compute_strides,
    count_parameters,
    get_skeleton_adjacency,
    normalize_adjacency,
    sinusoidal_positional_encoding,
)


# ---------- graph ----------

def test_adjacency_symmetric_with_self_loops():
    for layout, v in (("coco", 17), ("coco_with_neck", 18), ("openpose", 18)):
        adj = get_skeleton_adjacency(v, layout)
        assert adj.shape == (v, v)
        np.testing.assert_array_equal(adj, adj.T)
        assert np.all(np.diag(adj) == 1)


def test_neck_layout_wires_neck():
    adj = get_skeleton_adjacency(18, "coco_with_neck")
    assert adj[0, 17] == 1 and adj[17, 5] == 1 and adj[17, 6] == 1
    assert adj[0, 5] == 0  # nose->shoulder replaced by nose->neck->shoulder


def test_normalized_adjacency_spectral():
    adj = get_skeleton_adjacency(17, "coco")
    norm = normalize_adjacency(adj)
    np.testing.assert_allclose(norm, norm.T, atol=1e-12)
    eigs = np.linalg.eigvalsh(norm)
    assert eigs.max() <= 1.0 + 1e-9  # sym-normalized adjacency has spectrum in [-1, 1]


def test_compute_strides():
    assert compute_strides(24, 2, 4) == [3, 2, 2, 1]  # 24/2=12=2*2*3
    assert compute_strides(12, 2, 4) == [3, 2, 1, 1]  # 12/2=6=2*3
    assert compute_strides(12, 12, 4) == [1, 1, 1, 1]
    s = compute_strides(14, 2, 4)  # 7 is prime
    assert sorted(s, reverse=True) == s and np.prod(s) == 7


def test_adaptive_pool_matrix():
    P = adaptive_pool_matrix(6, 2)
    np.testing.assert_allclose(P.sum(axis=1), 1.0)
    x = np.arange(6.0)
    np.testing.assert_allclose(P @ x, [1.0, 4.0])  # mean of [0,1,2] and [3,4,5]


# ---------- GCAE ----------

@pytest.fixture(scope="module")
def gcae_setup():
    model = GCAE(in_channels=2, hidden_channels=16, latent_channels=8,
                 num_keypoints=18, seq_len=12, num_tokens=2, num_layers=4,
                 layout="coco_with_neck")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 12, 18, 2)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables, x


def test_gcae_shapes(gcae_setup):
    model, variables, x = gcae_setup
    recon, tokens = model.apply(variables, x, train=False)
    assert tokens.shape == (4, 2, 8 * 18)  # (B, num_tokens, d_model=144)
    assert recon.shape == x.shape


def test_gcae_accepts_bctv_layout(gcae_setup):
    model, variables, x = gcae_setup
    x_bctv = jnp.transpose(x, (0, 3, 1, 2))
    recon, tokens = model.apply(variables, x_bctv, train=False)
    assert recon.shape == x_bctv.shape
    # same tokens regardless of input layout
    _, tokens_btvc = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(tokens_btvc), atol=1e-5)


def test_gcae_train_mode_updates_batch_stats(gcae_setup):
    model, variables, x = gcae_setup
    (recon, tokens), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_gcae_jits(gcae_setup):
    model, variables, x = gcae_setup
    fn = jax.jit(lambda v, a: model.apply(v, a, train=False))
    recon, tokens = fn(variables, x)
    assert recon.shape == x.shape


def test_gcae_odd_seqlen_uses_adaptive_pool():
    model = GCAE(in_channels=2, hidden_channels=8, latent_channels=4,
                 num_keypoints=17, seq_len=14, num_tokens=2, num_layers=2, layout="coco")
    x = jnp.zeros((2, 14, 17, 2))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    recon, tokens = model.apply(variables, x, train=False)
    assert tokens.shape == (2, 2, 4 * 17)
    assert recon.shape == x.shape


# ---------- transformer ----------

def test_positional_encoding_table():
    pe = sinusoidal_positional_encoding(50, 144)
    assert pe.shape == (50, 144)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)
    pe_odd = sinusoidal_positional_encoding(10, 7)  # odd d_model
    assert pe_odd.shape == (10, 7)


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_transformer_roundtrip(variant):
    model = ShopformerTransformer(d_model=144, num_heads=2, dim_feedforward=64, variant=variant)
    tokens = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2, 144)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, tokens, train=False)
    out = model.apply(variables, tokens, train=False)
    assert out.shape == tokens.shape
    err = model.apply(variables, tokens, out, method="compute_reconstruction_error")
    assert err.shape == (4,)
    assert np.all(np.asarray(err) >= 0)


def test_transformer_v1_uses_shifted_target():
    """v1 decodes from [0, t0] so changing the LAST token must not change how
    the decoder's self-input differs... verify v1 != v2 outputs structurally."""
    tokens = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 144)), jnp.float32)
    m1 = ShopformerTransformer(d_model=144, num_heads=2, variant="v1", dropout=0.0)
    v1 = m1.init({"params": jax.random.PRNGKey(0)}, tokens, train=False)
    m2 = ShopformerTransformer(d_model=144, num_heads=2, variant="v2", dropout=0.0)
    v2 = m2.init({"params": jax.random.PRNGKey(0)}, tokens, train=False)
    o1 = m1.apply(v1, tokens, train=False)
    o2 = m2.apply(v2, tokens, train=False)
    assert o1.shape == o2.shape == tokens.shape
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_transformer_input_projection():
    model = ShopformerTransformer(d_model=64, input_dim=136, num_heads=2, variant="v2")
    tokens = jnp.zeros((2, 2, 136))
    variables = model.init({"params": jax.random.PRNGKey(0)}, tokens, train=False)
    out = model.apply(variables, tokens, train=False)
    assert out.shape == (2, 2, 136)  # projected back to input_dim


# ---------- shopformer ----------

@pytest.fixture(scope="module", params=["v1", "v2"])
def shopformer_setup(request):
    cfg = get_default_config()
    cfg["model"]["variant"] = request.param
    cfg["model"]["hidden_channels"] = 16
    model = build_shopformer(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), batch_size=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 12, 18, 2)), jnp.float32)
    return model, variables, x


def test_shopformer_forward_dict(shopformer_setup):
    model, variables, x = shopformer_setup
    out = model.apply(variables, x, train=False)
    assert set(out) == {"tokens", "reconstructed_tokens", "normality_score", "gcae_reconstructed"}
    assert out["normality_score"].shape == (4,)
    assert out["tokens"].shape == (4, 2, 144)
    assert out["gcae_reconstructed"].shape == x.shape
    assert np.all(np.asarray(out["normality_score"]) >= 0)


def test_shopformer_anomaly_score_method(shopformer_setup):
    model, variables, x = shopformer_setup
    scores = model.apply(variables, x, method="compute_anomaly_score")
    out = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(out["normality_score"]), atol=1e-5)


def test_shopformer_losses_finite(shopformer_setup):
    model, variables, x = shopformer_setup
    mask = jnp.array([1.0, 1.0, 1.0, 0.0])
    l1 = model.apply(variables, x, train=False, mask=mask, method="compute_gcae_loss")
    l2 = model.apply(variables, x, train=False, mask=mask, method="compute_transformer_loss")
    assert np.isfinite(float(l1)) and float(l1) > 0
    assert np.isfinite(float(l2)) and float(l2) > 0


def test_shopformer_mask_excludes_padding(shopformer_setup):
    model, variables, x = shopformer_setup
    # corrupt sample 3; with mask it must not affect the loss
    x_bad = x.at[3].set(1e3)
    mask = jnp.array([1.0, 1.0, 1.0, 0.0])
    l_clean = model.apply(variables, x, train=False, mask=mask, method="compute_gcae_loss")
    l_masked = model.apply(variables, x_bad, train=False, mask=mask, method="compute_gcae_loss")
    np.testing.assert_allclose(float(l_clean), float(l_masked), rtol=1e-5)


def test_shopformer_param_partition(shopformer_setup):
    model, variables, x = shopformer_setup
    counts = count_parameters(variables["params"])
    assert set(counts) == {"gcae", "transformer", "total"}
    assert counts["gcae"] > 0 and counts["transformer"] > 0
    assert counts["total"] == counts["gcae"] + counts["transformer"]


def test_shopformer_score_semantics_differ():
    """v1 (PE on targets) and v2 (plain MSE) must produce different scores for
    the same weights-independent structure."""
    cfg = get_default_config()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 18, 2)), jnp.float32)
    scores = {}
    for variant in ("v1", "v2"):
        cfg["model"]["variant"] = variant
        model = build_shopformer(cfg)
        variables = model.init_variables(jax.random.PRNGKey(0))
        tokens = model.apply(variables, x, method="tokenize")
        recon = jnp.zeros_like(tokens)
        scores[variant] = np.asarray(
            model.apply(variables, tokens, recon, method="compute_normality_score")
        )
    assert not np.allclose(scores["v1"], scores["v2"])
