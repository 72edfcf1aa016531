"""Visualization server API tests (reference viz_server.py surface)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import pytest


@pytest.fixture
def server(tmp_path, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "viz_server_mod", Path(__file__).parent.parent / "viz" / "server.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.VIZ_DIR = tmp_path

    for step, score in [(1, 100), (2, 500), (3, 300)]:
        (tmp_path / f"step_{step:06d}.json").write_text(
            json.dumps({"step": step, "score": score, "total_steps": 10,
                        "moves": [{"step": 1, "state_before": [], "action": "UP",
                                   "state_after": [], "points_earned": 4}]})
        )
    (tmp_path / "evil.json").write_text("{}")  # must not be listed/served

    srv = ThreadingHTTPServer(("127.0.0.1", 0), mod.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", tmp_path
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def test_index(server):
    base, _ = server
    status, body = _get(base + "/")
    assert status == 200 and b"2048" in body


def test_files_listing_and_sort(server):
    base, _ = server
    _, body = _get(base + "/api/files?page=1&per_page=2&sort=step")
    data = json.loads(body)
    assert data["total"] == 3
    assert data["total_pages"] == 2
    assert [f["step"] for f in data["files"]] == [3, 2]
    _, body = _get(base + "/api/files?sort=score")
    data = json.loads(body)
    assert [f["score"] for f in data["files"]] == [500, 300, 100]
    assert all(f["filename"].startswith("step_") for f in data["files"])


def test_data_fetch_and_traversal_guard(server):
    base, _ = server
    status, body = _get(base + "/api/data/step_000001.json")
    assert status == 200 and json.loads(body)["score"] == 100
    # traversal / non-matching names rejected
    import urllib.error

    for bad in ["evil.json", "..%2Fsecret", "step_1.txt"]:
        try:
            status, _ = _get(base + "/api/data/" + bad)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status in (400, 404), bad


def test_clear(server):
    base, tmp = server
    req = urllib.request.Request(base + "/api/clear", method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["deleted"] == 3
    assert not list(tmp.glob("step_*.json"))
    assert (tmp / "evil.json").exists()  # untouched
