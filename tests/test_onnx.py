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


def _sign64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def decode_tensor(buf):
    f = parse_message(buf)
    dims = [v for w, v in f.get(1, [])]
    name = f[8][0][1].decode()
    raw = f[9][0][1]
    dtype = np.int64 if f[2][0][1] == 7 else np.float32
    arr = np.frombuffer(raw, dtype).reshape(dims)
    return name, arr


def decode_attr(buf):
    f = parse_message(buf)
    name = f[1][0][1].decode()
    atype = f[20][0][1]
    if atype == 1:  # FLOAT
        return name, f[2][0][1]
    if atype == 2:  # INT
        return name, _sign64(f[3][0][1])
    if atype == 7:  # INTS
        return name, [_sign64(v) for _, v in f.get(8, [])]
    raise ValueError(f"attr type {atype}")


def decode_node(buf):
    f = parse_message(buf)
    return {
        "inputs": [v.decode() for _, v in f.get(1, [])],
        "outputs": [v.decode() for _, v in f.get(2, [])],
        "op": f[4][0][1].decode(),
        "attrs": dict(decode_attr(v) for _, v in f.get(5, [])),
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
        op, attrs = n["op"], n["attrs"]
        if op == "Gemm":  # transB=1 convention used by the writer
            y = ins[0] @ ins[1].T
            if len(ins) == 3:
                y = y + ins[2]
        elif op == "MatMul":
            y = ins[0] @ ins[1]
        elif op == "LayerNormalization":
            x, g, b = ins
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            y = (x - mu) / np.sqrt(var + attrs.get("epsilon", 1e-5)) * g + b
        elif op == "Relu":
            y = np.maximum(ins[0], 0)
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-ins[0]))
        elif op == "Add":
            y = ins[0] + ins[1]
        elif op == "Mul":
            y = ins[0] * ins[1]
        elif op == "Div":
            y = ins[0] / ins[1]
        elif op == "Sqrt":
            y = np.sqrt(ins[0])
        elif op == "Softmax":
            ax = attrs.get("axis", -1)
            e = np.exp(ins[0] - ins[0].max(axis=ax, keepdims=True))
            y = e / e.sum(axis=ax, keepdims=True)
        elif op == "Transpose":
            y = np.transpose(ins[0], attrs["perm"])
        elif op == "Reshape":
            shape = [ins[0].shape[i] if d == 0 else d
                     for i, d in enumerate(ins[1].tolist())]
            y = ins[0].reshape(shape)
        elif op == "Slice":
            data, starts, ends, axes = ins
            sl = [slice(None)] * data.ndim
            for s, e, ax in zip(starts.tolist(), ends.tolist(), axes.tolist()):
                sl[ax] = slice(s, e)
            y = data[tuple(sl)]
        elif op == "Pad":
            data, pads = ins
            nd = data.ndim
            p = pads.tolist()
            y = np.pad(data, list(zip(p[:nd], p[nd:])))
        elif op == "ReduceMean":
            y = ins[0].mean(axis=tuple(attrs["axes"]),
                            keepdims=bool(attrs.get("keepdims", 1)))
        else:
            raise ValueError(op)
        vals[n["outputs"][0]] = (y if y.dtype == np.int64
                                 else y.astype(np.float32))
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


def test_onnx_urm_roundtrip(tmp_path):
    """URM exporter (attention/ConvSwiGLU/RMSNorm decomposed to opset-17
    primitives): decode + numpy-execute must match the JAX forward."""
    from tpu2048.models import URMConfig, urm
    from tpu2048.models.encoding import encode_boards
    from tpu2048.env import engine

    cfg = URMConfig(hidden_dim=32, num_layers=2, num_heads=4, dropout=0.0,
                    num_loops=3, num_truncated_loops=1)
    params = urm.init(jax.random.key(2), cfg, zero_heads=False)
    path = tmp_path / "urm.onnx"
    W.export_urm(jax.tree.map(np.asarray, params), cfg, path)

    nodes, inits, inputs, outputs = decode_model(path.read_bytes())
    assert inputs == ["board_state"]
    assert outputs == ["action_logits", "value"]

    # real encoded boards AND batch>1 (graph must be batch-agnostic)
    boards = engine.reset(jax.random.key(3), (5,))
    x = np.asarray(encode_boards(boards), np.float32)
    vals = execute(nodes, inits, {"board_state": x})
    jl, jv = urm.apply(params, cfg, x)
    np.testing.assert_allclose(vals["action_logits"], np.asarray(jl),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(vals["value"], np.asarray(jv),
                               atol=1e-4, rtol=1e-4)
