"""Structured metrics logging.

The reference's only observability is ``print`` lines
(train_proposed_depth.py:218-231, SURVEY.md §5.5). Here every epoch/step
metric also lands in a JSONL stream (one object per record) so runs are
machine-comparable, plus an optional TensorBoard writer when available.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str = "run", tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            # native tfevents writer (utils/tbwriter.py) — no tensorflow/
            # tensorboardX dependency, TensorBoard reads the files directly
            from r3d_tpu.utils.tbwriter import SummaryWriter

            self._tb = SummaryWriter(os.path.join(log_dir, "tb", run_name))

    def log(self, record: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {"time": time.time(), **record}
        if step is not None:
            rec["step"] = step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None and step is not None:
            for k, v in record.items():
                if isinstance(v, (int, float)):
                    self._tb.scalar(k, v, step)
            # flush per record like the JSONL stream: TensorBoard tails the
            # event file during the run, and an unclean exit (e.g. the
            # tunnel wedging) must not lose buffered scalars
            self._tb.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class Timer:
    """Step-time / clips-per-second meter (the north-star metric)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._clips = 0
        self._steps = 0

    def tick(self, n_clips: int):
        self._clips += n_clips
        self._steps += 1

    @property
    def clips_per_sec(self) -> float:
        dt = time.time() - self._t0
        return self._clips / dt if dt > 0 else 0.0

    @property
    def step_ms(self) -> float:
        dt = time.time() - self._t0
        return 1e3 * dt / self._steps if self._steps else 0.0
