"""Training observability: metrics logging, loss curves, device profiling.

Fills the role of the reference's TensorBoard callback + per-loss Keras
metrics + loss-vs-epoch PNG (reference: mrcnn/model.py:2459-2463,
2304-2318, 2502-2517), plus the phase-timing percentage breakdowns used in
the analysis layer (reference: mrcnn/analyze.py:727-826) — TPU-side tracing
uses ``jax.profiler`` instead of TF summaries.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, List, Optional

import numpy as np



class MetricsLogger:
    """Append-only JSONL metrics stream + in-memory history."""

    def __init__(self, logdir: str, name: str = "train"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"{name}_metrics.jsonl")
        self.history: List[Dict] = []

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {"step": int(step), "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self.history.append(row)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def plot_losses(self, outfile: str, keys: Optional[List[str]] = None) -> None:
        """Loss-vs-step PNG (reference: mrcnn/model.py:2502-2517)."""
        if not self.history:
            return
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if keys is None:
            seen = {}
            for r in self.history:  # preserve first-seen order; includes val_*
                for k in r:
                    if k.endswith("loss"):
                        seen[k] = True
            keys = list(seen)
        steps = [r["step"] for r in self.history]
        fig, ax = plt.subplots(1, figsize=(8, 5))
        for k in keys:
            ax.plot(steps, [r.get(k, np.nan) for r in self.history], label=k)
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
        fig.savefig(outfile, bbox_inches="tight", dpi=120)
        plt.close(fig)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace scope (view with TensorBoard/XProf). No-op when
    logdir is None."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating phase timer with percentage-breakdown reporting
    (the reference's manual instrumentation style,
    reference: mrcnn/analyze.py:727-826)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self._start = time.time()

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        parts = [
            f"{k}: {v:.2f}s ({100 * v / total:.0f}%)" for k, v in self.totals.items()
        ]
        return ", ".join(parts)
