"""ONNX writer round-trip: decode our own protobuf output and execute the
graph in numpy; must match the JAX forward exactly (eval mode)."""

import struct

import numpy as np
import jax

from tpu2048.models import MLPConfig, mlp
from tpu2048.utils import onnx_writer as W


# --- minimal protobuf reader (wire format) -----------------------------------


def _read_varint(buf, pos):
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_message(buf):
    """-> dict field_number -> list of (wire_type, value)."""
    fields = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"unexpected wire type {wire}")
        fields.setdefault(field, []).append((wire, val))
    return fields


def decode_tensor(buf):
    f = parse_message(buf)
    dims = [v for w, v in f.get(1, [])]
    name = f[8][0][1].decode()
    raw = f[9][0][1]
    arr = np.frombuffer(raw, np.float32).reshape(dims)
    return name, arr


def decode_node(buf):
    f = parse_message(buf)
    return {
        "inputs": [v.decode() for _, v in f.get(1, [])],
        "outputs": [v.decode() for _, v in f.get(2, [])],
        "op": f[4][0][1].decode(),
    }


def decode_model(buf):
    f = parse_message(buf)
    graph = parse_message(f[7][0][1])
    nodes = [decode_node(v) for _, v in graph.get(1, [])]
    inits = dict(decode_tensor(v) for _, v in graph.get(5, []))
    inputs = [parse_message(v)[1][0][1].decode() for _, v in graph.get(11, [])]
    outputs = [parse_message(v)[1][0][1].decode() for _, v in graph.get(12, [])]
    return nodes, inits, inputs, outputs


def execute(nodes, inits, feeds):
    vals = dict(inits)
    vals.update(feeds)
    for n in nodes:
        ins = [vals[i] for i in n["inputs"]]
        if n["op"] == "Gemm":  # transB=1 convention used by the writer
            y = ins[0] @ ins[1].T
            if len(ins) == 3:
                y = y + ins[2]
        elif n["op"] == "LayerNormalization":
            x, g, b = ins
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            y = (x - mu) / np.sqrt(var + 1e-5) * g + b
        elif n["op"] == "Relu":
            y = np.maximum(ins[0], 0)
        elif n["op"] == "Add":
            y = ins[0] + ins[1]
        else:
            raise ValueError(n["op"])
        vals[n["outputs"][0]] = y.astype(np.float32)
    return vals


def test_onnx_roundtrip(tmp_path):
    cfg = MLPConfig(hidden_dim=48, num_layers=2, dropout=0.0)
    params = mlp.init(jax.random.key(1), cfg, zero_heads=False)
    path = tmp_path / "model.onnx"
    host = jax.tree.map(np.asarray, params)
    W.export_mlp(host, cfg, path)

    nodes, inits, inputs, outputs = decode_model(path.read_bytes())
    assert inputs == ["board_state"]
    assert outputs == ["action_logits", "value"]

    x = np.random.default_rng(0).normal(size=(1, 48)).astype(np.float32)
    vals = execute(nodes, inits, {"board_state": x})
    jl, jv = mlp.apply(params, cfg, x)
    np.testing.assert_allclose(vals["action_logits"], np.asarray(jl), atol=1e-5)
    np.testing.assert_allclose(vals["value"], np.asarray(jv), atol=1e-5)
