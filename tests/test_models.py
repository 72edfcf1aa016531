"""Model parity tests: JAX GameMLP/GameURM vs torch re-implementations of the
reference architectures (reference game.py:1033-1458), with weights copied
across frameworks. torch (CPU) is available in the image purely as a test
oracle here."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tpu2048.models import MLPConfig, URMConfig, encode_boards, mlp, urm
from tpu2048.env import engine


# --- torch oracles (architecture per the reference's documented spec) --------


class TorchResBlock(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.lin = nn.Linear(h, h, bias=False)
        self.ln = nn.LayerNorm(h)

    def forward(self, x):
        return x + F.relu(self.ln(self.lin(x)))


class TorchMLP(nn.Module):
    def __init__(self, h, layers):
        super().__init__()
        self.stem_lin = nn.Linear(48, h, bias=False)
        self.stem_ln = nn.LayerNorm(h)
        self.blocks = nn.ModuleList([TorchResBlock(h) for _ in range(layers)])
        self.action_head = nn.Linear(h, 4)
        self.value_head = nn.Linear(h, 1)

    def forward(self, x):
        x = F.relu(self.stem_ln(self.stem_lin(x)))
        for b in self.blocks:
            x = b(x)
        return self.action_head(x), self.value_head(x)


def _copy_linear(tl: nn.Linear, p: dict):
    tl.weight.data = torch.tensor(np.asarray(p["w"]))
    if tl.bias is not None:
        tl.bias.data = torch.tensor(np.asarray(p["b"]))


def _copy_ln(tl: nn.LayerNorm, p: dict):
    tl.weight.data = torch.tensor(np.asarray(p["g"]))
    tl.bias.data = torch.tensor(np.asarray(p["b"]))


def test_mlp_matches_torch():
    cfg = MLPConfig(hidden_dim=64, num_layers=2, dropout=0.0)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    tm = TorchMLP(64, 2)
    _copy_linear(tm.stem_lin, params["stem"]["lin"])
    _copy_ln(tm.stem_ln, params["stem"]["ln"])
    for tb, jb in zip(tm.blocks, params["blocks"]):
        _copy_linear(tb.lin, jb["lin"])
        _copy_ln(tb.ln, jb["ln"])
    _copy_linear(tm.action_head, params["action_head"])
    _copy_linear(tm.value_head, params["value_head"])
    tm.eval()

    x = np.random.default_rng(1).normal(size=(7, 48)).astype(np.float32)
    jl, jv = mlp.apply(params, cfg, jnp.asarray(x))
    with torch.no_grad():
        tl, tv = tm(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-4, rtol=1e-4)


class TorchConvSwiGLU(nn.Module):
    def __init__(self, h, expansion, k):
        super().__init__()
        inter = round(expansion * h * 2 / 3)
        inter = ((inter + 7) // 8) * 8
        self.inter = inter
        self.gate_up = nn.Linear(h, inter * 2, bias=False)
        self.dw = nn.Conv1d(inter, inter, k, padding=k // 2, groups=inter, bias=True)
        self.down = nn.Linear(inter, h, bias=False)

    def forward(self, x):
        gate, up = self.gate_up(x).chunk(2, dim=-1)
        h = F.silu(gate) * up
        c = self.dw(h.transpose(1, 2))[..., : h.size(1)]
        return self.down(F.silu(c).transpose(1, 2))


class TorchURMBlock(nn.Module):
    def __init__(self, h, heads, expansion, k, eps):
        super().__init__()
        self.h, self.heads, self.eps = h, heads, eps
        self.qkv = nn.Linear(h, 3 * h, bias=False)
        self.o = nn.Linear(h, h, bias=False)
        self.mlp = TorchConvSwiGLU(h, expansion, k)

    def _rms(self, x):
        v = x.float().square().mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(v + self.eps)).to(x.dtype)

    def forward(self, x):
        B, L, _ = x.shape
        hd = self.h // self.heads
        qkv = self.qkv(x).view(B, L, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        a = F.scaled_dot_product_attention(qkv[0], qkv[1], qkv[2], is_causal=False)
        a = self.o(a.transpose(1, 2).reshape(B, L, self.h))
        x = self._rms(x + a)
        return self._rms(x + self.mlp(x))


class TorchURM(nn.Module):
    def __init__(self, cfg: URMConfig):
        super().__init__()
        self.cfg = cfg
        self.stem_lin = nn.Linear(3, cfg.hidden_dim, bias=False)
        self.stem_ln = nn.LayerNorm(cfg.hidden_dim)
        self.blocks = nn.ModuleList(
            [
                TorchURMBlock(cfg.hidden_dim, cfg.num_heads, cfg.expansion,
                              cfg.conv_kernel, cfg.rms_norm_eps)
                for _ in range(cfg.num_layers)
            ]
        )
        self.init_hidden = nn.Parameter(torch.zeros(1, 16, cfg.hidden_dim))
        self.action_head = nn.Linear(cfg.hidden_dim, 4)
        self.value_head = nn.Linear(cfg.hidden_dim, 1)

    def forward(self, x):
        B = x.shape[0]
        emb = F.silu(self.stem_ln(self.stem_lin(x.view(B, 16, 3))))
        h = self.init_hidden.expand(B, -1, -1).clone()
        for _ in range(self.cfg.num_loops):
            h = h + emb
            for blk in self.blocks:
                h = blk(h)
        pooled = h.mean(dim=1)
        return self.action_head(pooled), self.value_head(pooled)


def test_urm_matches_torch():
    cfg = URMConfig(hidden_dim=32, num_layers=2, num_heads=4, dropout=0.0,
                    num_loops=3, num_truncated_loops=0)
    params = urm.init(jax.random.key(2), cfg, zero_heads=False)
    tm = TorchURM(cfg)
    _copy_linear(tm.stem_lin, params["stem"]["lin"])
    _copy_ln(tm.stem_ln, params["stem"]["ln"])
    for tb, jb in zip(tm.blocks, params["blocks"]):
        _copy_linear(tb.qkv, jb["qkv"])
        _copy_linear(tb.o, jb["o"])
        _copy_linear(tb.mlp.gate_up, jb["gate_up"])
        tb.mlp.dw.weight.data = torch.tensor(np.asarray(jb["dwconv"]["w"]))[:, None, :]
        tb.mlp.dw.bias.data = torch.tensor(np.asarray(jb["dwconv"]["b"]))
        _copy_linear(tb.mlp.down, jb["down"])
    tm.init_hidden.data = torch.tensor(np.asarray(params["init_hidden"]))
    _copy_linear(tm.action_head, params["action_head"])
    _copy_linear(tm.value_head, params["value_head"])
    tm.eval()

    x = np.random.default_rng(3).normal(size=(5, 48)).astype(np.float32)
    jl, jv = urm.apply(params, cfg, jnp.asarray(x))
    with torch.no_grad():
        tl, tv = tm(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=2e-4, rtol=1e-4)


def test_encoding():
    boards = engine.reset(jax.random.key(1), (3,))
    enc = np.asarray(encode_boards(boards))
    assert enc.shape == (3, 48)
    b = np.asarray(boards).reshape(3, 16)
    for i in range(3):
        for c in range(16):
            assert enc[i, 3 * c] == b[i, c]
            assert abs(enc[i, 3 * c + 1] - (c // 4) / 3) < 1e-6
            assert abs(enc[i, 3 * c + 2] - (c % 4) / 3) < 1e-6


def test_zero_heads_uniform_policy():
    """Head zero-init -> uniform initial policy and zero value
    (reference train.py:1559-1567, sanity check at 1627-1637)."""
    cfg = MLPConfig(hidden_dim=64, num_layers=2)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=True)
    x = encode_boards(engine.reset(jax.random.key(5), (4,)))
    logits, value = mlp.apply(params, cfg, x)
    assert np.allclose(np.asarray(logits), 0.0)
    assert np.allclose(np.asarray(value), 0.0)


def test_mlp_dropout_active_in_train_mode():
    cfg = MLPConfig(hidden_dim=64, num_layers=2, dropout=0.5)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    x = jnp.ones((8, 48))
    a1, _ = mlp.apply(params, cfg, x, train=True, rng=jax.random.key(1))
    a2, _ = mlp.apply(params, cfg, x, train=True, rng=jax.random.key(2))
    a3, _ = mlp.apply(params, cfg, x, train=False)
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
    assert np.allclose(np.asarray(a3), np.asarray(mlp.apply(params, cfg, x)[0]))


def test_param_counts_match_torch():
    cfg = MLPConfig(hidden_dim=192, num_layers=2)
    params = mlp.init(jax.random.key(0), cfg)
    t = TorchMLP(192, 2)
    t_count = sum(p.numel() for p in t.parameters())
    assert mlp.num_params(params) == t_count

    ucfg = URMConfig(hidden_dim=64)
    uparams = urm.init(jax.random.key(0), ucfg)
    tu = TorchURM(ucfg)
    assert mlp.num_params(uparams) == sum(p.numel() for p in tu.parameters())


def test_param_labels():
    cfg = MLPConfig(hidden_dim=64, num_layers=1)
    params = mlp.init(jax.random.key(0), cfg)
    labels = mlp.param_labels(params)
    assert labels["value_head"]["w"] == "muon_value"
    assert labels["value_head"]["b"] == "adamw_value"
    assert labels["action_head"]["w"] == "muon_other"
    assert labels["stem"]["ln"]["g"] == "adamw_other"
    assert labels["blocks"][0]["lin"]["w"] == "muon_other"
