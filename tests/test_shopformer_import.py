"""Reference Shopformer torch-checkpoint import (utils/shopformer_import.py).

Builds independent torch mirrors of the reference architectures (v1:
/root/reference/shopformer/models/*.py, v2: /root/reference/shopformer_2/
models/*.py — structure studied, not copied), random-initializes them,
converts their state dicts with the importer, and checks eval-mode numerics
(tokens, GCAE reconstruction, transformer reconstruction, anomaly scores)
match between torch and the flax reference-mirror mode.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax

from cvsd_tpu.models.graph import (get_skeleton_adjacency,
                                   normalize_adjacency)
from cvsd_tpu.utils.shopformer_import import (convert_state_dict,
                                              reference_model_config)


# ---------------------------------------------------------------- torch mirror
class TGraphConv(tnn.Module):
    def __init__(self, cin, cout, adj):
        super().__init__()
        self.register_buffer("adj", adj)
        self.weight = tnn.Parameter(torch.randn(cin, cout) * 0.2)
        self.bias = tnn.Parameter(torch.randn(cout) * 0.05)

    def forward(self, x):  # (B, C, T, V)
        b, c, t, v = x.shape
        x = x.permute(0, 2, 3, 1).reshape(b * t, v, c)
        x = torch.matmul(self.adj, x)
        x = torch.matmul(x, self.weight) + self.bias
        return x.view(b, t, v, -1).permute(0, 3, 1, 2).contiguous()


class TTemporalConv(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, (9, 1), (stride, 1), (4, 0))
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TSTGCNBlock(tnn.Module):
    def __init__(self, cin, cout, adj, stride=1):
        super().__init__()
        self.gcn = TGraphConv(cin, cout, adj)
        self.tcn = TTemporalConv(cout, cout, stride)
        if cin == cout and stride == 1:
            self.residual = tnn.Identity()
            self._identity = True
        else:
            self.residual = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, (stride, 1)), tnn.BatchNorm2d(cout))
            self._identity = False

    def forward(self, x):
        res = self.residual(x)
        x = F.relu(self.gcn(x))
        x = self.tcn(x)
        return F.relu(x + res)


class TEncoder(tnn.Module):
    def __init__(self, V, C, H, L, strides, layout, pool_tokens=None):
        super().__init__()
        adj = torch.FloatTensor(
            normalize_adjacency(get_skeleton_adjacency(V, layout)))
        self.bn_input = tnn.BatchNorm1d(C * V)
        chans = [C, H, H, H, L]
        self.layers = tnn.ModuleList(
            [TSTGCNBlock(chans[i], chans[i + 1], adj, strides[i]) for i in range(4)])
        self.pool = (tnn.AdaptiveAvgPool2d((pool_tokens, V))
                     if pool_tokens is not None else None)

    def forward(self, x):  # (B, C, T, V)
        b, c, t, v = x.shape
        x = x.permute(0, 1, 3, 2).reshape(b, c * v, t)
        x = self.bn_input(x)
        x = x.view(b, c, v, t).permute(0, 1, 3, 2).contiguous()
        for layer in self.layers:
            x = layer(x)
        if self.pool is not None and x.shape[2] != self.pool.output_size[0]:
            x = self.pool(x)
        b, c, t, v = x.shape
        return x.permute(0, 2, 1, 3).reshape(b, t, c * v)


class TDecoder(tnn.Module):
    def __init__(self, V, C, H, L, seq_len, num_tokens, factors):
        super().__init__()
        self.V, self.seq_len = V, seq_len
        self.initial_proj = tnn.Linear(L * V, H * V)
        layers = []
        chans = [H, H, H, C]
        for i in range(4):
            f, out_ch = factors[i], chans[i]
            if f > 1:
                layers.append(tnn.ConvTranspose2d(H if i == 0 else H, out_ch,
                                                  (f, 1), (f, 1)))
            else:
                layers.append(tnn.Conv2d(H, out_ch, 1))
            if i < 3:
                layers += [tnn.BatchNorm2d(out_ch), tnn.ReLU(), tnn.Dropout(0.0)]
        self.layers = tnn.Sequential(*layers)

    def forward(self, x):  # (B, T, emb)
        b, t, e = x.shape
        x = self.initial_proj(x)
        h = x.shape[-1] // self.V
        x = x.view(b, t, h, self.V).permute(0, 2, 1, 3).contiguous()
        x = self.layers(x)
        if x.shape[2] != self.seq_len:
            x = F.interpolate(x, size=(self.seq_len, self.V), mode="bilinear",
                              align_corners=False)
        return x  # (B, C, T, V)


class TPosEnc(tnn.Module):
    def __init__(self, d_model, max_len=100):
        super().__init__()
        pe = torch.zeros(max_len, d_model)
        pos = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2).float()
                        * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div if d_model % 2 == 0 else (pos * div)[:, :-1])
        self.register_buffer("pe", pe.unsqueeze(0))

    def forward(self, x):
        return x + self.pe[:, :x.size(1), :]


class TTransformerV1(tnn.Module):
    """v1: hand-rolled post-LN layers == stock torch layers with
    norm_first=False (same attribute names, same eval math)."""

    def __init__(self, d_model, heads, n_enc, n_dec, ff):
        super().__init__()
        self.d_model = d_model
        self.pos_encoder = TPosEnc(d_model)
        self.encoder_layers = tnn.ModuleList([
            tnn.TransformerEncoderLayer(d_model, heads, ff, 0.0,
                                        batch_first=True) for _ in range(n_enc)])
        self.decoder_layers = tnn.ModuleList([
            tnn.TransformerDecoderLayer(d_model, heads, ff, 0.0,
                                        batch_first=True) for _ in range(n_dec)])
        self.output_proj = tnn.Linear(d_model, d_model)

    def forward(self, tokens):
        src = self.pos_encoder(tokens)
        for layer in self.encoder_layers:
            src = layer(src)
        start = torch.zeros_like(tokens[:, :1])
        tgt = torch.cat([start, tokens[:, :-1]], 1)
        tgt = self.pos_encoder(tgt)
        for layer in self.decoder_layers:
            tgt = layer(tgt, src)
        return self.output_proj(tgt)


class TTransformerV2(tnn.Module):
    """v2: stock encoder/decoder stacks with final norms, pre-LN, GELU."""

    def __init__(self, d_model, heads, n_enc, n_dec, ff):
        super().__init__()
        self.pos_encoder = TPosEnc(d_model)
        enc = tnn.TransformerEncoderLayer(d_model, heads, ff, 0.0,
                                          activation="gelu", batch_first=True,
                                          norm_first=True)
        dec = tnn.TransformerDecoderLayer(d_model, heads, ff, 0.0,
                                          activation="gelu", batch_first=True,
                                          norm_first=True)
        self.encoder = tnn.TransformerEncoder(enc, n_enc, norm=tnn.LayerNorm(d_model))
        self.decoder = tnn.TransformerDecoder(dec, n_dec, norm=tnn.LayerNorm(d_model))

    def forward(self, tokens):
        x = self.pos_encoder(tokens)
        memory = self.encoder(x)
        return self.decoder(x, memory)


class TShopformer(tnn.Module):
    def __init__(self, variant, V, seq_len=12, num_tokens=2, C=2, H=64, L=8):
        super().__init__()
        from cvsd_tpu.models.gcae import GCAEDecoder
        from cvsd_tpu.models.graph import compute_strides, compute_strides_v1

        layout = "coco" if V == 17 else "coco_with_neck"
        if variant == "v1":
            strides = compute_strides_v1(seq_len, num_tokens, 4)
            pool = None
        else:
            strides = compute_strides(seq_len, num_tokens, 4)
            pool = num_tokens
        factors = GCAEDecoder.ref_upsample_factors(num_tokens, seq_len, 4)
        d_model = L * V
        self.variant = variant
        self.gcae = tnn.Module()
        self.gcae.encoder = TEncoder(V, C, H, L, strides, layout, pool)
        self.gcae.decoder = TDecoder(V, C, H, L, seq_len, num_tokens, factors)
        self.transformer = (TTransformerV1(d_model, 2, 2, 2, 64) if variant == "v1"
                            else TTransformerV2(d_model, 2, 2, 2, 64))
        self.pos_encoder = TPosEnc(d_model)

    def forward(self, poses):  # (B, C, T, V)
        tokens = self.gcae.encoder(poses)
        recon_tokens = self.transformer(tokens)
        gcae_recon = self.gcae.decoder(tokens)
        if self.variant == "v1":
            target = tokens + self.pos_encoder.pe[:, :tokens.size(1)]
        else:
            target = tokens
        score = ((recon_tokens - target) ** 2).mean(dim=[1, 2])
        return tokens, recon_tokens, gcae_recon, score


# ----------------------------------------------------------------- the tests
def _randomize_bn_stats(m, rng):
    """Non-trivial running stats so the import of mean/var is actually tested."""
    for mod in m.modules():
        if isinstance(mod, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            mod.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.3, mod.running_mean.shape).astype(np.float32)))
            mod.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, mod.running_var.shape).astype(np.float32)))


@pytest.mark.parametrize("variant,V", [("v1", 17), ("v2", 18)])
def test_import_matches_torch_mirror(variant, V):
    from cvsd_tpu.models.shopformer import Shopformer

    torch.manual_seed(0)
    rng = np.random.default_rng(1)
    tm = TShopformer(variant, V)
    with torch.no_grad():
        _randomize_bn_stats(tm, rng)
    tm.eval()

    poses = rng.normal(size=(3, 2, 12, V)).astype(np.float32)
    with torch.no_grad():
        t_tokens, t_recon, t_gcae, t_score = tm(torch.from_numpy(poses))

    cfg = reference_model_config(variant, num_keypoints=V)
    variables = convert_state_dict(tm.state_dict(), cfg)
    model = Shopformer.from_config({"model": cfg})

    poses_tvc = np.transpose(poses, (0, 2, 3, 1))  # (B, T, V, C)
    f_tokens = np.asarray(model.apply(variables, poses_tvc, method="tokenize"))
    np.testing.assert_allclose(f_tokens, t_tokens.numpy(), rtol=1e-4, atol=1e-5)

    f_recon = np.asarray(model.apply(variables, f_tokens, method="reconstruct_tokens"))
    np.testing.assert_allclose(f_recon, t_recon.numpy(), rtol=1e-4, atol=1e-4)

    f_gcae = np.asarray(model.apply(variables, f_tokens, method="decode_tokens"))
    np.testing.assert_allclose(np.transpose(f_gcae, (0, 3, 1, 2)),
                               t_gcae.numpy(), rtol=1e-4, atol=1e-4)

    f_score = np.asarray(model.apply(variables, poses_tvc,
                                     method="compute_anomaly_score"))
    np.testing.assert_allclose(f_score, t_score.numpy(), rtol=1e-4, atol=1e-5)


def test_convert_rejects_depth_mismatch():
    """A checkpoint with more transformer layers than the config must raise,
    not silently drop the extra layers."""
    torch.manual_seed(3)
    tm = TShopformer("v1", 17)
    sd = tm.state_dict()
    # forge an extra encoder layer by duplicating layer 1 as layer 2
    extra = {k.replace("encoder_layers.1", "encoder_layers.2"): v
             for k, v in sd.items() if "encoder_layers.1" in k}
    sd.update(extra)
    cfg = reference_model_config("v1", num_keypoints=17)  # 2 encoder layers
    with pytest.raises(ValueError, match="encoder layer 2"):
        convert_state_dict(sd, cfg)


def test_import_checkpoint_file_roundtrip(tmp_path):
    """The reference's on-disk format ({'model_state_dict': ...}) loads via
    import_shopformer_checkpoint and scores finitely."""
    from cvsd_tpu.utils.shopformer_import import import_shopformer_checkpoint

    torch.manual_seed(1)
    tm = TShopformer("v1", 17)
    tm.eval()
    path = str(tmp_path / "best_model.pt")
    torch.save({"epoch": 3, "model_state_dict": tm.state_dict()}, path)

    model, variables, config = import_shopformer_checkpoint(
        path, model_cfg=reference_model_config("v1", num_keypoints=17))
    poses = np.random.default_rng(0).normal(size=(2, 12, 17, 2)).astype(np.float32)
    scores = np.asarray(model.apply(variables, poses,
                                    method="compute_anomaly_score"))
    assert scores.shape == (2,) and np.isfinite(scores).all()
    with torch.no_grad():
        *_rest, t_score = tm(torch.from_numpy(np.transpose(poses, (0, 3, 1, 2))))
    np.testing.assert_allclose(scores, t_score.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_imported_checkpoint_finetunes_via_cli(tmp_path):
    """cli.train --stage 2 --checkpoint <imported> adopts the embedded
    ref-mirror model config (no manual --set model.* flags) and trains."""
    from cvsd_tpu.cli.import_shopformer import main as imp
    from cvsd_tpu.cli.train import main as train_main

    torch.manual_seed(9)
    tm = TShopformer("v1", 17)
    tm.eval()
    pt = str(tmp_path / "best_model.pt")
    torch.save({"model_state_dict": tm.state_dict()}, pt)
    ck = str(tmp_path / "imported.msgpack")
    imp(["--torch_checkpoint", pt, "--variant", "v1", "--output", ck])
    out = str(tmp_path / "ft")
    train_main(["--use_synthetic", "--stage", "2", "--checkpoint", ck,
                "--set", "data.synthetic.num_train=16",
                "--set", "data.synthetic.num_test=8",
                "--set", "training.stage2_epochs=1",
                "--set", "data.batch_size=8", "--output_dir", out])
    import json
    import os

    res = json.load(open(os.path.join(out, "training_results.json")))
    assert np.isfinite(res["test_metrics"]["auc_roc"])
    # the rebuilt model must be the v1 ref-mirror (17 kpts, cv order)
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["model"]["num_keypoints"] == 17
    assert cfg["model"]["token_order"] == "cv"


def test_unsafe_checkpoint_requires_opt_in(tmp_path):
    """A checkpoint that fails weights_only=True loading must raise unless
    allow_unsafe_load=True is passed explicitly (ADVICE r3)."""
    import torch

    from cvsd_tpu.utils.shopformer_import import import_shopformer_checkpoint

    import os

    p = str(tmp_path / "sketchy.pt")
    # a function reference pickles fine but is rejected by weights_only=True
    torch.save({"state_dict": {}, "payload": os.getcwd}, p)
    with pytest.raises(ValueError, match="weights_only"):
        import_shopformer_checkpoint(p)
