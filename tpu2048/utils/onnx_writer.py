"""Minimal dependency-free ONNX exporter.

The reference exports its GameMLP to ONNX for the in-browser demo via
torch.onnx (reference train.py:33-78). This image ships no ``onnx`` package,
so this module serializes the ONNX protobuf wire format directly — enough of
ModelProto/GraphProto/NodeProto/TensorProto to express the GameMLP graph
(Gemm / LayerNormalization / Relu / Add), opset 17, weights embedded — the
exact artifact shape (input ``board_state`` (1,48), outputs ``action_logits``
(1,4) and ``value`` (1,1)) the demo site's ONNX Runtime Web session expects.

Protobuf encoding is by hand: varints + length-delimited fields only.
"""

from __future__ import annotations

import struct

import numpy as np

# --- protobuf primitives -----------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_varint(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _f_bytes(field: int, data: bytes) -> bytes:
    return _key(field, 2) + _varint(len(data)) + data


def _f_string(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode())


# --- ONNX messages -----------------------------------------------------------

FLOAT = 1  # TensorProto.DataType
ATTR_FLOAT, ATTR_INT = 1, 2  # AttributeProto.AttributeType


def tensor(name: str, array: np.ndarray) -> bytes:
    """TensorProto with raw_data (field 9)."""
    a = np.ascontiguousarray(array, dtype=np.float32)
    msg = b""
    for d in a.shape:
        msg += _f_varint(1, d)  # dims
    msg += _f_varint(2, FLOAT)  # data_type
    msg += _f_string(8, name)  # name
    msg += _f_bytes(9, a.tobytes())  # raw_data
    return msg


def _attr_int(name: str, value: int) -> bytes:
    return _f_string(1, name) + _key(3, 0) + _varint(value) + _f_varint(20, ATTR_INT)


def _attr_float(name: str, value: float) -> bytes:
    return (
        _f_string(1, name)
        + _key(2, 5)
        + struct.pack("<f", value)
        + _f_varint(20, ATTR_FLOAT)
    )


def node(op_type: str, inputs: list, outputs: list, name: str = "",
         attrs: list = ()) -> bytes:
    msg = b""
    for i in inputs:
        msg += _f_string(1, i)
    for o in outputs:
        msg += _f_string(2, o)
    msg += _f_string(3, name or f"{op_type}_{outputs[0]}")
    msg += _f_string(4, op_type)
    for a in attrs:
        msg += _f_bytes(5, a)
    return msg


def _value_info(name: str, shape: tuple) -> bytes:
    dims = b""
    for d in shape:
        dims += _f_bytes(1, _f_varint(1, d))  # Dimension.dim_value
    tensor_type = _f_varint(1, FLOAT) + _f_bytes(2, dims)  # elem_type, shape
    type_proto = _f_bytes(1, tensor_type)  # TypeProto.tensor_type
    return _f_string(1, name) + _f_bytes(2, type_proto)


def model(graph_name: str, nodes: list, initializers: list, inputs: list,
          outputs: list, opset: int = 17, producer: str = "tpu2048") -> bytes:
    graph = b""
    for n in nodes:
        graph += _f_bytes(1, n)
    graph += _f_string(2, graph_name)
    for t in initializers:
        graph += _f_bytes(5, t)
    for name, shape in inputs:
        graph += _f_bytes(11, _value_info(name, shape))
    for name, shape in outputs:
        graph += _f_bytes(12, _value_info(name, shape))

    opset_import = _f_varint(2, opset)  # domain defaults to ""
    msg = _f_varint(1, 8)  # ir_version 8
    msg += _f_string(2, producer)
    msg += _f_bytes(7, graph)
    msg += _f_bytes(8, opset_import)
    return msg


# --- GameMLP graph -----------------------------------------------------------


def export_mlp(params: dict, config, output_path) -> None:
    """Serialize a GameMLP params pytree to ONNX (eval mode: dropout dropped).

    Graph: stem Gemm(no bias) -> LayerNormalization -> Relu ->
    [per block: Gemm -> LN -> Relu -> Add(residual)] -> two Gemm heads.
    """
    h = config.hidden_dim
    nodes, inits = [], []

    def gemm(x, w_name, w, b_name=None, b=None, out="y"):
        inits.append(tensor(w_name, np.asarray(w)))
        ins = [x, w_name]
        if b is not None:
            inits.append(tensor(b_name, np.asarray(b)))
            ins.append(b_name)
        nodes.append(node("Gemm", ins, [out], attrs=[_attr_int("transB", 1)]))
        return out

    def layer_norm(x, g_name, g, b_name, b, out):
        inits.append(tensor(g_name, np.asarray(g)))
        inits.append(tensor(b_name, np.asarray(b)))
        nodes.append(
            node("LayerNormalization", [x, g_name, b_name], [out],
                 attrs=[_attr_int("axis", -1), _attr_float("epsilon", 1e-5)])
        )
        return out

    def relu(x, out):
        nodes.append(node("Relu", [x], [out]))
        return out

    x = gemm("board_state", "stem.w", params["stem"]["lin"]["w"], out="stem_mm")
    x = layer_norm(x, "stem.g", params["stem"]["ln"]["g"], "stem.b",
                   params["stem"]["ln"]["b"], "stem_ln")
    x = relu(x, "stem_out")

    for i, block in enumerate(params["blocks"]):
        mm = gemm(x, f"b{i}.w", block["lin"]["w"], out=f"b{i}_mm")
        ln = layer_norm(mm, f"b{i}.g", block["ln"]["g"], f"b{i}.b",
                        block["ln"]["b"], f"b{i}_ln")
        r = relu(ln, f"b{i}_relu")
        nodes.append(node("Add", [x, r], [f"b{i}_out"]))
        x = f"b{i}_out"

    gemm(x, "action.w", params["action_head"]["w"], "action.b",
         params["action_head"]["b"], out="action_logits")
    gemm(x, "value.w", params["value_head"]["w"], "value.b",
         params["value_head"]["b"], out="value")

    blob = model(
        "game_mlp", nodes, inits,
        inputs=[("board_state", (1, 48))],
        outputs=[("action_logits", (1, 4)), ("value", (1, 1))],
    )
    with open(output_path, "wb") as f:
        f.write(blob)
