"""Demo-asset export: ONNX model + model_config.json + best_game.json
(reference export-demo command, train.py:1946-2072)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..utils import viz_export
from ..utils.onnx_writer import export_mlp


def export_demo_assets(params, model_cfg, model_type: str, best_episode,
                       output_dir) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    if best_episode:
        viz_export.export_best_game(best_episode, out / "best_game.json")
    else:
        print("Warning: No best game to export (no games were played)")

    if model_type.lower() != "mlp":
        print(f"ONNX export supports the MLP family only (got {model_type}); "
              "skipping model.onnx")
    else:
        export_mlp(_to_numpy(params), model_cfg, out / "model.onnx")
        print(f"Model exported to {out / 'model.onnx'}")

    with open(out / "model_config.json", "w") as f:
        json.dump(model_cfg.to_dict(), f, indent=2)


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_numpy(v) for v in tree]
    return np.asarray(tree)
