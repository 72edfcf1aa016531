#!/usr/bin/env python
"""CLI shim: ``python train.py train ...`` — same entry shape as the
reference's typer app (train.py:2300-2301)."""

from tpu2048.train.cli import main

if __name__ == "__main__":
    main()
