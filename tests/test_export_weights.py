"""model_weights.json round-trip: the raw-weights artifact for the demo's
dependency-free JS forward (web/js/mlp.js). Decodes the base64 tensors and
re-executes the documented forward (stem LN+ReLU, residual blocks, heads) in
numpy; must match mlp.apply bit-for-bit on the stored float32 weights."""

import base64
import json

import numpy as np
import jax
import jax.numpy as jnp

from tpu2048.models import MLPConfig, mlp
from tpu2048.train.export import export_weights_json


def _dec(t):
    a = np.frombuffer(base64.b64decode(t["data"]), dtype="<f4")
    return a.reshape(t["shape"])


def _forward(doc, x):
    """The exact computation web/js/mlp.js performs (in f32 here; JS uses
    f64 accumulation, which only tightens it)."""

    def ln_relu(g, b, v):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return np.maximum((v - mu) / np.sqrt(var + 1e-5) * g + b, 0.0)

    h = ln_relu(_dec(doc["stem"]["ln_g"]), _dec(doc["stem"]["ln_b"]),
                x @ _dec(doc["stem"]["w"]).T)
    for blk in doc["blocks"]:
        h = h + ln_relu(_dec(blk["ln_g"]), _dec(blk["ln_b"]),
                        h @ _dec(blk["w"]).T)
    logits = h @ _dec(doc["action_head"]["w"]).T + _dec(doc["action_head"]["b"])
    value = h @ _dec(doc["value_head"]["w"]).T + _dec(doc["value_head"]["b"])
    return logits, value


def test_weights_json_roundtrip(tmp_path):
    cfg = MLPConfig(hidden_dim=96, num_layers=3)
    params = mlp.init(jax.random.key(7), cfg, zero_heads=False)
    path = tmp_path / "model_weights.json"
    export_weights_json(jax.tree.map(np.asarray, params), cfg, path)

    doc = json.loads(path.read_text())
    assert doc["format"] == "tpu2048-mlp-weights-v1"
    assert doc["config"]["hidden_dim"] == 96

    # Stored tensors are the exact float32 weights.
    np.testing.assert_array_equal(
        _dec(doc["stem"]["w"]), np.asarray(params["stem"]["lin"]["w"]))
    np.testing.assert_array_equal(
        _dec(doc["action_head"]["b"]), np.asarray(params["action_head"]["b"]))

    x = np.asarray(jax.random.normal(jax.random.key(1), (5, 48)), np.float32)
    want_logits, want_value = mlp.apply(params, cfg, jnp.asarray(x))
    got_logits, got_value = _forward(doc, x)
    np.testing.assert_allclose(got_logits, np.asarray(want_logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_value, np.asarray(want_value),
                               rtol=1e-5, atol=1e-5)


def test_export_demo_assets_writes_weights(tmp_path):
    from tpu2048.train.export import export_demo_assets

    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    export_demo_assets(params, cfg, "mlp", None, tmp_path)
    for f in ("model.onnx", "model_config.json", "model_weights.json"):
        assert (tmp_path / f).exists(), f


def _urm_forward(doc, x48):
    """The exact computation web/js/urm.js performs, in numpy (single input)."""
    cfg = doc["config"]
    h, nh, eps = cfg["hidden_dim"], cfg["num_heads"], cfg["rms_norm_eps"]
    hd, L, k = h // nh, 16, cfg["conv_kernel"]
    silu = lambda v: v / (1 + np.exp(-v))

    def rmsn(v):
        return v / np.sqrt((v * v).mean(-1, keepdims=True) + eps)

    cells = x48.reshape(L, 3)
    s = cells @ _dec(doc["stem"]["w"]).T
    mu = s.mean(-1, keepdims=True)
    var = ((s - mu) ** 2).mean(-1, keepdims=True)
    emb = silu((s - mu) / np.sqrt(var + 1e-5) * _dec(doc["stem"]["ln_g"])
               + _dec(doc["stem"]["ln_b"]))

    hid = _dec(doc["init_hidden"]).copy()
    pad = k // 2
    for _ in range(cfg["num_loops"]):
        hid = hid + emb
        for blk in doc["blocks"]:
            qkv = hid @ _dec(blk["qkv"]).T  # (L, 3h)
            q, kk, v = qkv[:, :h], qkv[:, h:2 * h], qkv[:, 2 * h:]
            att = np.zeros((L, h))
            for head in range(nh):
                o = head * hd
                sc = q[:, o:o + hd] @ kk[:, o:o + hd].T / np.sqrt(hd)
                w = np.exp(sc - sc.max(-1, keepdims=True))
                w /= w.sum(-1, keepdims=True)
                att[:, o:o + hd] = w @ v[:, o:o + hd]
            hid = rmsn(hid + att @ _dec(blk["o"]).T)
            gu = hid @ _dec(blk["gate_up"]).T
            inter = gu.shape[-1] // 2
            hb = silu(gu[:, :inter]) * gu[:, inter:]
            cw, cb = _dec(blk["dwconv_w"]), _dec(blk["dwconv_b"])
            conv = np.zeros_like(hb) + cb
            for j in range(k):
                lo, hi = max(0, pad - j), min(L, L + pad - j)
                conv[lo:hi] += hb[lo + j - pad:hi + j - pad] * cw[:, j]
            hid = rmsn(hid + silu(conv) @ _dec(blk["down"]).T)
    pooled = hid.mean(0)
    return (pooled @ _dec(doc["action_head"]["w"]).T + _dec(doc["action_head"]["b"]),
            pooled @ _dec(doc["value_head"]["w"]).T + _dec(doc["value_head"]["b"]))


def test_urm_weights_json_roundtrip(tmp_path):
    from tpu2048.models import URMConfig, urm

    cfg = URMConfig(hidden_dim=32, num_layers=2, num_heads=4, num_loops=3,
                    num_truncated_loops=1)
    params = urm.init(jax.random.key(3), cfg, zero_heads=False)
    path = tmp_path / "model_weights.json"
    export_weights_json(jax.tree.map(np.asarray, params), cfg, path,
                        model_type="urm")
    doc = json.loads(path.read_text())
    assert doc["format"] == "tpu2048-urm-weights-v1"

    x = np.asarray(jax.random.normal(jax.random.key(1), (48,)), np.float32)
    want_logits, want_value = urm.apply(params, cfg, jnp.asarray(x)[None])
    got_logits, got_value = _urm_forward(doc, x)
    np.testing.assert_allclose(got_logits, np.asarray(want_logits)[0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_value, np.asarray(want_value)[0],
                               rtol=2e-4, atol=2e-5)
