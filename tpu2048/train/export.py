"""Demo-asset export: ONNX model + model_config.json + best_game.json
(reference export-demo command, train.py:1946-2072)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..utils import viz_export
from ..utils.onnx_writer import export_mlp, export_urm


def export_demo_assets(params, model_cfg, model_type: str, best_episode,
                       output_dir) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    if best_episode:
        viz_export.export_best_game(best_episode, out / "best_game.json")
    else:
        print("Warning: No best game to export (no games were played)")

    exporter = export_urm if model_type.lower() == "urm" else export_mlp
    exporter(_to_numpy(params), model_cfg, out / "model.onnx")
    print(f"Model exported to {out / 'model.onnx'}")

    cfg_dict = dict(model_cfg.to_dict(), model_type=model_type.lower())
    with open(out / "model_config.json", "w") as f:
        json.dump(cfg_dict, f, indent=2)


def _to_numpy(tree):
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_numpy(v) for v in tree]
    return np.asarray(tree)
