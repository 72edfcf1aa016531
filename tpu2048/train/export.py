"""Demo-asset export: ONNX model + model_config.json + best_game.json
(reference export-demo command, train.py:1946-2072), plus a raw-weights JSON
(model_weights.json) consumed by the demo's dependency-free JS forward pass
(web/js/mlp.js) when ONNX Runtime Web is unavailable (offline/air-gapped)."""

from __future__ import annotations

import base64
import json
from pathlib import Path

import numpy as np

from ..utils import viz_export
from ..utils.onnx_writer import export_mlp, export_urm


def export_demo_assets(params, model_cfg, model_type: str, best_episode,
                       output_dir, search_coefs=None,
                       play_meta: dict | None = None) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    if best_episode:
        viz_export.export_best_game(best_episode, out / "best_game.json",
                                    meta=play_meta)
    else:
        print("Warning: No best game to export (no games were played)")

    exporter = export_urm if model_type.lower() == "urm" else export_mlp
    np_params = _to_numpy(params)
    exporter(np_params, model_cfg, out / "model.onnx")
    print(f"Model exported to {out / 'model.onnx'}")

    cfg_dict = dict(model_cfg.to_dict(), model_type=model_type.lower())
    if search_coefs is not None:
        # Consumed by the demo's in-browser expectimax (web/js/model.js) —
        # the same shaped Bellman backup as algo/search.py:
        # score(a) = points*pts + gamma*E[alive * (mono*phi(m) + sigma*V + mu)].
        cfg_dict["search_coefs"] = dict(search_coefs._asdict())
    with open(out / "model_config.json", "w") as f:
        json.dump(cfg_dict, f, indent=2)

    export_weights_json(np_params, model_cfg, out / "model_weights.json",
                        model_type=model_type)
    print(f"Raw weights exported to {out / 'model_weights.json'}")


def _tensor_b64(a: np.ndarray) -> dict:
    """Exact float32 tensor as {shape, data}: little-endian f32 base64 —
    4 bytes/param, decoded in JS with atob + Float32Array."""
    a = np.ascontiguousarray(a, dtype="<f4")
    return {"shape": list(a.shape),
            "data": base64.b64encode(a.tobytes()).decode("ascii")}


def export_weights_json(np_params: dict, model_cfg, path,
                        model_type: str = "mlp") -> None:
    """Raw weights for the pure-JS forward (web/js/mlp.js / web/js/urm.js).
    MLP layout mirrors models/mlp.py:apply: stem Linear(48->h, no bias)
    +LN+ReLU; blocks of x + ReLU(LN(Linear(x))); biased action/value heads.
    URM layout mirrors models/urm.py:apply."""
    if model_type.lower() == "urm":
        return _export_urm_weights_json(np_params, model_cfg, path)
    doc = {
        "format": "tpu2048-mlp-weights-v1",
        "config": model_cfg.to_dict(),
        "stem": {"w": _tensor_b64(np_params["stem"]["lin"]["w"]),
                 "ln_g": _tensor_b64(np_params["stem"]["ln"]["g"]),
                 "ln_b": _tensor_b64(np_params["stem"]["ln"]["b"])},
        "blocks": [
            {"w": _tensor_b64(b["lin"]["w"]),
             "ln_g": _tensor_b64(b["ln"]["g"]),
             "ln_b": _tensor_b64(b["ln"]["b"])}
            for b in np_params["blocks"]
        ],
        "action_head": {"w": _tensor_b64(np_params["action_head"]["w"]),
                        "b": _tensor_b64(np_params["action_head"]["b"])},
        "value_head": {"w": _tensor_b64(np_params["value_head"]["w"]),
                       "b": _tensor_b64(np_params["value_head"]["b"])},
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def _export_urm_weights_json(np_params: dict, model_cfg, path) -> None:
    """GameURM weights for web/js/urm.js (models/urm.py:apply: per-cell stem
    Linear(3->h)+LN+SiLU; num_loops recurrent passes of [MHA + ConvSwiGLU,
    post-add RMSNorm]; mean-pool; biased heads). Truncated-loop gradient
    stopping is a training-only concern — inference runs all loops alike."""
    doc = {
        "format": "tpu2048-urm-weights-v1",
        "config": model_cfg.to_dict(),
        "stem": {"w": _tensor_b64(np_params["stem"]["lin"]["w"]),
                 "ln_g": _tensor_b64(np_params["stem"]["ln"]["g"]),
                 "ln_b": _tensor_b64(np_params["stem"]["ln"]["b"])},
        "init_hidden": _tensor_b64(np_params["init_hidden"][0]),  # (16, h)
        "blocks": [
            {"qkv": _tensor_b64(b["qkv"]["w"]),
             "o": _tensor_b64(b["o"]["w"]),
             "gate_up": _tensor_b64(b["gate_up"]["w"]),
             "dwconv_w": _tensor_b64(b["dwconv"]["w"]),
             "dwconv_b": _tensor_b64(b["dwconv"]["b"]),
             "down": _tensor_b64(b["down"]["w"])}
            for b in np_params["blocks"]
        ],
        "action_head": {"w": _tensor_b64(np_params["action_head"]["w"]),
                        "b": _tensor_b64(np_params["action_head"]["b"])},
        "value_head": {"w": _tensor_b64(np_params["value_head"]["w"]),
                       "b": _tensor_b64(np_params["value_head"]["b"])},
    }
    with open(path, "w") as f:
        json.dump(doc, f)


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_numpy(v) for v in tree]
    return np.asarray(tree)
