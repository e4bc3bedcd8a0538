"""Metric logging: wandb-compatible when available, JSONL + stdout always.

The reference logs scalars/images straight to wandb (train_flow.py:115,
148-178). Here the logger is pluggable: ``MetricLogger`` fans out to every
configured sink, so training works identically with or without a wandb
install/login (SURVEY.md §5 observability plan).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class JsonlSink:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, metrics: Dict, step: int):
        rec = {"step": step, "ts": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()
                    if isinstance(v, (int, float))})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()


class StdoutSink:
    def __init__(self, every: int = 100):
        self.every = every
        self._last = -1

    def log(self, metrics: Dict, step: int):
        if step - self._last >= self.every:
            self._last = step
            items = ", ".join(f"{k}={float(v):.4g}" for k, v in metrics.items()
                              if isinstance(v, (int, float)))
            print(f"[step {step}] {items}", flush=True)

    def close(self):
        pass


class WandbSink:
    """Optional wandb sink; construction fails gracefully without wandb."""

    def __init__(self, project: str, name: str, config=None):
        import wandb  # raises ImportError if unavailable

        self._wandb = wandb
        self._run = wandb.init(project=project, name=name, config=config)

    def log(self, metrics: Dict, step: int):
        self._wandb.log(metrics, step)

    def close(self):
        self._wandb.finish()


class MetricLogger:
    def __init__(self, *sinks):
        self.sinks = list(sinks)

    @classmethod
    def default(cls, run_dir: str = "runs", name: str = "run",
                project: Optional[str] = None, config=None,
                use_wandb: bool = False):
        sinks = [StdoutSink(), JsonlSink(os.path.join(run_dir, name + ".jsonl"))]
        if use_wandb:
            try:
                sinks.append(WandbSink(project or "prior-flow-tpu", name, config))
            except Exception as e:  # no wandb / not logged in
                print(f"wandb unavailable ({e}); continuing with local sinks")
        return cls(*sinks)

    def __call__(self, metrics: Dict, step: int):
        for s in self.sinks:
            s.log(metrics, step)

    def close(self):
        for s in self.sinks:
            s.close()
