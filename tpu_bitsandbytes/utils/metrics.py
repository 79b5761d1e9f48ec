"""Metrics, roofline accounting, and profiling helpers.

The reference has no observability beyond warn-once fallbacks (SURVEY §5).
The north-star metrics here are throughput targets, so the engine exposes
structured per-step metrics and a roofline model for every quantized matmul.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Dict, List, Optional

import jax

# TPU chip specs (per chip). Extend as new generations appear.
CHIP_SPECS = {
    "v5e": {"hbm_gbps": 819, "bf16_tflops": 197, "int8_tops": 394,
            "hbm_gib": 16},
    "v5p": {"hbm_gbps": 2765, "bf16_tflops": 459, "int8_tops": 918,
            "hbm_gib": 95},
    "v4": {"hbm_gbps": 1228, "bf16_tflops": 275, "int8_tops": 275,
           "hbm_gib": 32},
}
DEFAULT_CHIP = "v5e"


def detect_chip() -> str:
    try:
        kind = jax.devices()[0].device_kind.lower()
        for name in CHIP_SPECS:
            if name in kind.replace(" ", "").replace("lite", "e"):
                return name
        if "v5lite" in kind.replace(" ", "") or "v5 lite" in kind:
            return "v5e"
    except Exception:
        pass
    return DEFAULT_CHIP


def matmul4bit_bytes(n: int, k: int, m: int = 1, blocksize: int = 64,
                     absmax_bytes: int = 4, act_bytes: int = 2) -> int:
    """HBM bytes for one fused 4-bit matmul: packed + absmax + x + y."""
    return int(n * k / 2 + n * (k / blocksize) * absmax_bytes
               + m * k * act_bytes + m * n * act_bytes)


def matmul4bit_roofline_us(n: int, k: int, m: int = 1, blocksize: int = 64,
                           chip: Optional[str] = None) -> float:
    chip = chip or detect_chip()
    bw = CHIP_SPECS[chip]["hbm_gbps"] * 1e9
    return matmul4bit_bytes(n, k, m, blocksize) / bw * 1e6


@dataclasses.dataclass
class StepMetrics:
    step: int
    tokens: int
    wall_s: float
    tokens_per_s: float
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)


class MetricsLogger:
    """Rolling per-step engine metrics (tokens/s, step time, HBM estimate)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.history: List[StepMetrics] = []
        self._step = 0

    def record(self, tokens: int, wall_s: float, **extra) -> StepMetrics:
        self._step += 1
        m = StepMetrics(self._step, tokens, wall_s,
                        tokens / wall_s if wall_s > 0 else 0.0, extra)
        self.history.append(m)
        if len(self.history) > self.window:
            self.history.pop(0)
        return m

    def summary(self) -> Dict[str, float]:
        if not self.history:
            return {}
        toks = sum(m.tokens for m in self.history)
        secs = sum(m.wall_s for m in self.history)
        return {
            "steps": len(self.history),
            "tokens": toks,
            "tokens_per_s": toks / secs if secs else 0.0,
            "mean_step_ms": secs / len(self.history) * 1e3,
        }


@contextlib.contextmanager
def trace(name: str, log_dir: Optional[str] = None):
    """jax.profiler trace region; with ``log_dir`` captures a full trace."""
    if log_dir is not None:
        with jax.profiler.trace(log_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield


class Timer:
    """Wall-clock timer that blocks on device results (tunnel-safe)."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False

    @staticmethod
    def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
        out = None
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters
