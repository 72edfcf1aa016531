"""Model families: GameMLP (residual MLP) and GameURM (recurrent transformer),
as param pytrees + pure apply functions, plus the 48-dim board encoding."""

from . import mlp, urm  # noqa: F401
from .encoding import INPUT_DIM, encode_boards  # noqa: F401
from .mlp import MLPConfig  # noqa: F401
from .urm import URMConfig  # noqa: F401


def build(model_type: str, config):
    """(init_fn, apply_fn, labels_fn) triple for a model family."""
    if model_type == "mlp":
        return mlp.init, mlp.apply, mlp.param_labels
    if model_type == "urm":
        return urm.init, urm.apply, urm.param_labels
    raise ValueError(f"unknown model type: {model_type!r} (use 'mlp' or 'urm')")
