"""Unified metric logger: stdout + JSONL file + wandb.

Re-implementation of the reference's MetricLogger surface (logger.py:11-168):
one ``log(metrics, step, verbose)`` call fans out to formatted stdout, an
append-only JSONL file named ``<experiment>_<YYYYMMDD>_<nnn>.jsonl`` (unique
suffix), and wandb when configured. Context-manager close included.
"""

from __future__ import annotations

import json
import queue
import threading
from datetime import datetime
from pathlib import Path
from typing import Any, Optional

_CLOSE = object()  # worker-queue sentinel


class MetricLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        experiment_name: str = "train",
        use_wandb: bool = False,
        wandb_project: Optional[str] = None,
        wandb_run_name: Optional[str] = None,
        wandb_config: Optional[dict] = None,
        async_io: bool = True,
    ):
        """``async_io``: fan out stdout/JSONL/wandb from a daemon worker
        thread so a slow disk/pipe never stalls the train step (the host is
        2-core and shares with rollout fetches; see ROADMAP host-CPU note).
        Ordering is preserved (single queue, single worker); ``close()``
        drains the queue before returning."""
        self.use_wandb = use_wandb
        self.wandb_run = None
        self.log_file: Optional[Path] = None
        self._fh = None
        self._q: Optional[queue.Queue] = queue.Queue() if async_io else None
        self._worker: Optional[threading.Thread] = None

        if log_dir is not None:
            d = Path(log_dir)
            d.mkdir(parents=True, exist_ok=True)
            stamp = datetime.now().strftime("%Y%m%d")
            n = 1
            while True:
                candidate = d / f"{experiment_name}_{stamp}_{n:03d}.jsonl"
                if not candidate.exists():
                    break
                n += 1
            self.log_file = candidate
            self._fh = open(candidate, "a")
            print(f"Logging to: {candidate}")

        if use_wandb:
            try:
                import wandb

                self.wandb_run = wandb.init(
                    project=wandb_project, name=wandb_run_name,
                    config=wandb_config, reinit=True,
                )
            except ImportError:
                print("Warning: wandb not installed; disabling wandb logging")
                self.use_wandb = False

        if self._q is not None:
            self._worker = threading.Thread(
                target=self._drain, name="metric-logger", daemon=True)
            self._worker.start()

    @staticmethod
    def _fmt(value: Any) -> str:
        if isinstance(value, float):
            if value != 0 and (abs(value) < 0.01 or abs(value) >= 10000):
                return f"{value:.2e}"
            return f"{value:.2f}"
        return str(value)

    def _drain(self) -> None:
        while True:
            item = self._q.get()
            if item is _CLOSE:
                self._q.task_done()
                return
            kind, payload = item
            try:
                if kind == "log":
                    self._emit(*payload)
                else:
                    print(payload)
            except Exception:  # keep logging alive; report loudly
                import traceback

                traceback.print_exc()
            finally:
                self._q.task_done()

    def log(self, metrics: dict, step: Optional[int] = None,
            header: Optional[str] = None, verbose: bool = True) -> None:
        if self._q is not None:
            # Timestamp at enqueue so JSONL timestamps reflect when the step
            # happened, not when the worker got to it.
            self._q.put(("log", (dict(metrics), step, header, verbose,
                                 datetime.now().isoformat())))
        else:
            self._emit(metrics, step, header, verbose,
                       datetime.now().isoformat())

    def _emit(self, metrics: dict, step: Optional[int],
              header: Optional[str], verbose: bool, ts: str) -> None:
        if verbose:
            if header is not None:
                print(header)
            elif step is not None:
                print(f"--- Step {step} ---")
            for k, v in metrics.items():
                print(f"  {k}: {self._fmt(v)}")

        if self._fh is not None:
            entry = {"step": step, "timestamp": ts}
            entry.update(metrics)
            self._fh.write(json.dumps(entry) + "\n")
            self._fh.flush()

        if self.use_wandb and self.wandb_run is not None:
            import wandb

            wandb.log(metrics, step=step)

    def print(self, message: str = "") -> None:
        if self._q is not None:
            self._q.put(("print", message))
        else:
            print(message)

    def close(self) -> None:
        if self._q is not None and self._worker is not None:
            self._q.put(_CLOSE)
            self._worker.join(timeout=30)
            self._q = None
            self._worker = None
        if self._fh:
            self._fh.close()
            self._fh = None
        if self.use_wandb and self.wandb_run is not None:
            import wandb

            wandb.finish()
            self.wandb_run = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
