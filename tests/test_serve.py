"""Inference-server tests: PolicyService + HTTP endpoints."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import jax
import pytest

from tpu2048.env import oracle
from tpu2048.models import MLPConfig, mlp
from tpu2048.ops import optimizer as opt
from tpu2048.train import checkpoint as CKPT


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_ckpt")
    cfg = MLPConfig(hidden_dim=32, num_layers=1)
    params = mlp.init(jax.random.key(0), cfg, zero_heads=False)
    CKPT.save_checkpoint(
        d, "best_model", arrays_tree=dict(params=params),
        manifest=dict(config=cfg.to_dict(), model_type="mlp",
                      eval_avg_score=0.0, train_step=0),
    )
    return d


def test_policy_service_predict(ckpt_dir):
    from tpu2048.serve import PolicyService

    svc = PolicyService(str(ckpt_dir))
    board = [[1, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]]
    out = svc.predict(np.asarray(board))
    legal = oracle.legal_directions(board)
    assert out["legal"] == [d in legal for d in range(4)]
    assert out["action"] in legal
    assert abs(sum(out["probs"]) - 1.0) < 1e-5
    for d in range(4):
        if d not in legal:
            assert out["probs"][d] == 0.0

    # batch + greedy determinism
    boards = np.asarray([board, board, board])
    g1 = svc.predict(boards, greedy=True)
    g2 = svc.predict(boards, greedy=True)
    assert g1["actions"] == g2["actions"]


def test_http_endpoints(ckpt_dir):
    from tpu2048.serve import PolicyService, make_handler

    svc = PolicyService(str(ckpt_dir))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["model"]["model_type"] == "mlp"

    board = [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]
    req = urllib.request.Request(
        base + "/predict", data=json.dumps({"board": board}).encode(),
        method="POST", headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        out = json.loads(r.read())
    assert out["direction"] in ("UP", "DOWN", "LEFT", "RIGHT")
    assert out["action"] in oracle.legal_directions(board)

    # malformed input -> 400
    bad = urllib.request.Request(base + "/predict", data=b"{}", method="POST")
    try:
        urllib.request.urlopen(bad, timeout=10)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    srv.shutdown()


def test_search_mode(ckpt_dir):
    """"search": N selects by expectimax and reports per-action scores
    (null for illegal actions; legality still in "legal")."""
    from tpu2048.serve import PolicyService

    svc = PolicyService(str(ckpt_dir))
    board = [[1, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]]
    legal = oracle.legal_directions(board)
    for depth in (1, 2):
        out = svc.predict(np.asarray(board), search=depth)
        assert out["action"] in legal
        scores = out["search_scores"]
        assert len(scores) == 4
        for d in range(4):
            assert (scores[d] is None) == (d not in legal)
        finite = {d: s for d, s in enumerate(scores) if s is not None}
        assert out["action"] == max(finite, key=finite.get)
    # Deterministic.
    a1 = svc.predict(np.asarray(board), search=1)["action"]
    a2 = svc.predict(np.asarray(board), search=1)["action"]
    assert a1 == a2


def test_search_mode_depth3(ckpt_dir):
    """Depth-3 serving (round 5): prune-2 inner nodes, chunked batches —
    the per-move scorer shape the depth-3 eval host loop validated."""
    from tpu2048.serve import PolicyService

    svc = PolicyService(str(ckpt_dir))
    board = [[1, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]]
    legal = oracle.legal_directions(board)
    out = svc.predict(np.asarray(board), search=3)
    assert out["action"] in legal
    finite = {d: s for d, s in enumerate(out["search_scores"])
              if s is not None}
    assert set(finite) == set(legal)
    assert out["action"] == max(finite, key=finite.get)

    # Batch larger than the depth-3 chunk: results equal per-board calls.
    boards = np.asarray([board] * (svc.DEPTH3_CHUNK + 3), np.int32)
    got = svc.predict(boards, search=3)
    assert got["actions"] == [out["action"]] * len(boards)
    # search clamps at 3
    assert svc.predict(np.asarray(board), search=7)["action"] in legal
