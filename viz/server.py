#!/usr/bin/env python
"""Training visualization server.

Serves the replay UI and the JSON snapshots the train loop writes to
``viz_data/``. API surface mirrors the reference's Flask app
(viz_server.py:19-117) — GET /, GET /api/files (paginated + sorted),
GET /api/data/<file> (path-traversal guarded), POST /api/clear — implemented
on the stdlib http.server (Flask is not in this image).

Usage: python viz/server.py [--port 5050] [--viz-dir viz_data]
"""

from __future__ import annotations

import argparse
import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

VIZ_DIR = Path("viz_data")
INDEX_HTML = Path(__file__).parent / "index.html"
FILE_RE = re.compile(r"^step_\d+\.json$")


def list_files(page: int, per_page: int, sort: str) -> dict:
    files = []
    if VIZ_DIR.exists():
        for p in VIZ_DIR.iterdir():
            if not FILE_RE.match(p.name):
                continue
            try:
                data = json.loads(p.read_text())
            except (json.JSONDecodeError, OSError):
                continue
            files.append({
                "filename": p.name,
                "step": data.get("step", 0),
                "score": data.get("score", 0),
                "total_steps": data.get("total_steps", 0),
            })
    if sort == "score":
        files.sort(key=lambda f: f["score"], reverse=True)
    else:
        files.sort(key=lambda f: f["step"], reverse=True)
    total = len(files)
    start = (page - 1) * per_page
    return {
        "files": files[start : start + per_page],
        "total": total,
        "page": page,
        "per_page": per_page,
        "total_pages": max(1, -(-total // per_page)),
    }


class Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, body: bytes, ctype: str = "application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, obj, code: int = 200):
        self._send(code, json.dumps(obj).encode())

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/" or url.path == "/index.html":
            self._send(200, INDEX_HTML.read_bytes(), "text/html; charset=utf-8")
        elif url.path == "/api/files":
            q = parse_qs(url.query)
            page = int(q.get("page", ["1"])[0])
            per_page = int(q.get("per_page", ["25"])[0])
            sort = q.get("sort", ["step"])[0]
            self._json(list_files(page, per_page, sort))
        elif url.path.startswith("/api/data/"):
            name = url.path[len("/api/data/"):]
            # Path-traversal guard (reference viz_server.py:87-89).
            if not FILE_RE.match(name):
                self._json({"error": "invalid filename"}, 400)
                return
            target = VIZ_DIR / name
            if not target.exists():
                self._json({"error": "not found"}, 404)
                return
            self._send(200, target.read_bytes())
        else:
            self._json({"error": "not found"}, 404)

    def do_POST(self):
        if urlparse(self.path).path == "/api/clear":
            deleted = 0
            if VIZ_DIR.exists():
                for p in VIZ_DIR.iterdir():
                    if FILE_RE.match(p.name):
                        p.unlink()
                        deleted += 1
            self._json({"deleted": deleted})
        else:
            self._json({"error": "not found"}, 404)

    def log_message(self, fmt, *args):  # quieter default logging
        pass


def main() -> None:
    global VIZ_DIR
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=5050)
    ap.add_argument("--viz-dir", default="viz_data")
    args = ap.parse_args()
    VIZ_DIR = Path(args.viz_dir)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"Visualization server on http://0.0.0.0:{args.port} (dir: {VIZ_DIR})")
    server.serve_forever()


if __name__ == "__main__":
    main()
