#!/usr/bin/env python
"""Shim: ``python viz_server.py`` — same entry point name as the reference."""

import runpy
from pathlib import Path

runpy.run_path(str(Path(__file__).parent / "viz" / "server.py"), run_name="__main__")
