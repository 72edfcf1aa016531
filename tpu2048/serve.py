"""Model inference server: POST a board, get the policy's move.

A minimal production-style serving endpoint for trained checkpoints (the
reference's only serving story is the static browser demo; this serves the
JAX model directly, batched, from a checkpoint):

  POST /predict   {"board": [[...4x4 exponents...]], "greedy": false,
                   "search": 0}
      -> {"action": 0..3, "direction": "UP", "probs": [...4], "value": v,
          "legal": [bool x4]}
  POST /predict_batch {"boards": [[[...]], ...]} -> {"actions": [...], ...}
  GET  /healthz   -> {"status": "ok", "model": {...}}

``"search": 1``/``2``/``3`` selects the move by expectimax search of that
depth (algo/search.py; exact chance nodes, critic leaves) instead of the raw
policy — the response carries the per-action ``search_scores`` alongside the
policy's probs/value. Search coefficients come from the checkpoint's RTG
moments when present (pure-EV fallback otherwise, like evaluate --search).
Depth 3 applies the evaluate path's tractability guards: inner max nodes
pruned to the top-2 actions by 1-ply score, and batch requests chunked to 16
boards per device program (one request == one bounded per-move scorer call,
the shape the depth-3 host loop validated on the v5e).

Usage: python -m tpu2048.serve --checkpoint checkpoints [--port 8787]
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax
import jax.numpy as jnp

from .env import engine
from .models.encoding import encode_boards

DIRECTION_NAMES = ["UP", "DOWN", "LEFT", "RIGHT"]


class PolicyService:
    """Loads a checkpoint and answers masked-policy queries (jitted, batched)."""

    def __init__(self, checkpoint_path: str):
        from .train.evaluate import load_model_checkpoint, _apply_fn

        self.params, self.model_cfg, self.model_type = load_model_checkpoint(
            checkpoint_path
        )
        apply_eval = _apply_fn(self.model_cfg, self.model_type)

        @jax.jit
        def fwd(params, boards):
            moves = engine.all_moves(boards)
            logits, value = apply_eval(params, encode_boards(boards))
            masked = jnp.where(moves.action_mask, -jnp.inf, logits)
            all_invalid = jnp.all(moves.action_mask, axis=-1, keepdims=True)
            probs = jax.nn.softmax(jnp.where(all_invalid, 0.0, masked), axis=-1)
            probs = jnp.where(moves.action_mask, 0.0, probs)
            return probs, value[..., 0], jnp.logical_not(moves.action_mask)

        self._fwd = fwd
        self._rng = np.random.default_rng(0)

        from .train.evaluate import load_search_coefs

        self._apply = apply_eval
        self._search_coefs = load_search_coefs(checkpoint_path)
        self._search_fns = {}  # depth -> jitted scorer

    # Depth-3 guards, mirroring evaluate's run_search_eval: the exact inner
    # tree is (4*32)^2 subproblems per board — prune_k=2 makes it tractable,
    # and the per-call batch is capped so one large /predict_batch request
    # cannot OOM the chip (each chunk is one bounded device program; serve
    # already runs one move per request, the shape the depth-3 host loop
    # validated).
    DEPTH3_PRUNE_K = 2
    DEPTH3_CHUNK = 16

    def _search_scores(self, boards: jnp.ndarray, depth: int) -> np.ndarray:
        if depth not in self._search_fns:
            from .algo import search as SRCH

            coefs = self._search_coefs
            prune_k = self.DEPTH3_PRUNE_K if depth >= 3 else 0
            self._search_fns[depth] = jax.jit(
                lambda p, b: SRCH.expectimax_scores(
                    self._apply, p, b, None, coefs, depth, prune_k))
        fn = self._search_fns[depth]
        if depth >= 3 and boards.shape[0] > self.DEPTH3_CHUNK:
            return np.concatenate([
                np.asarray(fn(self.params, boards[i:i + self.DEPTH3_CHUNK]))
                for i in range(0, boards.shape[0], self.DEPTH3_CHUNK)])
        return np.asarray(fn(self.params, boards))

    def info(self) -> dict:
        return {"model_type": self.model_type, "config": self.model_cfg.to_dict()}

    def predict(self, boards: np.ndarray, greedy: bool = False,
                search: int = 0) -> dict:
        boards = np.asarray(boards, np.int32)
        squeeze = boards.ndim == 2
        if squeeze:
            boards = boards[None]
        probs, value, legal = self._fwd(self.params, jnp.asarray(boards))
        probs, value, legal = map(np.asarray, (probs, value, legal))
        search_scores = None
        if search:
            depth = max(1, min(int(search), 3))
            search_scores = self._search_scores(jnp.asarray(boards), depth)
            actions = search_scores.argmax(-1)
        elif greedy:
            actions = probs.argmax(-1)
        else:
            cum = probs.cumsum(-1)
            cum = cum / np.maximum(cum[..., -1:], 1e-9)
            u = self._rng.random((boards.shape[0], 1))
            actions = (u > cum).sum(-1)
        out = {
            "actions": actions.tolist(),
            "directions": [DIRECTION_NAMES[a] for a in actions],
            "probs": probs.tolist(),
            "values": value.tolist(),
            "legal": legal.tolist(),
        }
        if search_scores is not None:
            # -inf (illegal) is not JSON; clients read legality from "legal".
            out["search_scores"] = np.where(
                np.isfinite(search_scores), search_scores, None).tolist()
        if squeeze:
            out = {
                "action": out["actions"][0],
                "direction": out["directions"][0],
                "probs": out["probs"][0],
                "value": out["values"][0],
                "legal": out["legal"][0],
                **({"search_scores": out["search_scores"][0]}
                   if search_scores is not None else {}),
            }
        return out


def make_handler(service: PolicyService):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json({"status": "ok", "model": service.info()})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/predict":
                    board = payload["board"]
                    self._json(service.predict(board, payload.get("greedy", False),
                                               payload.get("search", 0)))
                elif self.path == "/predict_batch":
                    boards = payload["boards"]
                    self._json(service.predict(np.asarray(boards),
                                               payload.get("greedy", False),
                                               payload.get("search", 0)))
                else:
                    self._json({"error": "not found"}, 404)
            except (KeyError, ValueError, TypeError) as e:
                self._json({"error": str(e)}, 400)

        def log_message(self, fmt, *args):
            pass

    return Handler


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", "-c", default="checkpoints")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--host", default="127.0.0.1",
                    help="Bind address (default loopback; pass 0.0.0.0 to "
                         "expose on all interfaces — there is no auth)")
    ap.add_argument("--platform", default=None,
                    help="Force a JAX platform (cpu/tpu)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    service = PolicyService(args.checkpoint)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(service))
    print(f"Serving {service.info()} on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
