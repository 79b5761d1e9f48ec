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


def param_footprint(params, runtime_cache: Optional[str] = None,
                    drop_packed: bool = False) -> Dict[str, int]:
    """Bytes by category for a (quantized) param tree.

    ``runtime_cache``/``drop_packed``: account a *hypothetical* execution
    cache ("int8"/"bf16") for QLinear4 leaves that do not carry one yet —
    the engine uses this to decide drop_packed BEFORE materializing the
    cache (building both formats transiently would double peak HBM).

    Returns {"packed": NF4 codes+absmax (0 if drop_packed would free them),
    "exec_cache": runtime cache, "fp": everything else} in bytes.
    """
    from ..models.layers import QLinear4
    out = {"packed": 0, "exec_cache": 0, "fp": 0}

    def nbytes(a):
        if a is None:
            return 0
        import jax.numpy as jnp
        if a.dtype == jnp.int4:          # device-packed two per byte
            return a.size // 2
        return a.size * jnp_itemsize(a.dtype)

    def jnp_itemsize(dt):
        import numpy as np
        return np.dtype(dt).itemsize

    def visit(w):
        if isinstance(w, QLinear4):
            pk = nbytes(w.packed) + nbytes(w.absmax) + nbytes(w.absmax_q)
            if w.absmax_state is not None:
                pk += nbytes(w.absmax_state.absmax)
            ex = nbytes(w.w_cache) + nbytes(w.cache_scale)
            if ex == 0 and runtime_cache is not None:
                n, k = w.shape
                per = {"int8": 1, "bf16": 2, "int4": 0.5}[runtime_cache]
                if runtime_cache == "int4":
                    from ..ops.int4cache import INT4_BLOCK
                    sc = (k // INT4_BLOCK) * 4
                else:
                    sc = 4
                ex = int(n * k * per) + n * sc
            if drop_packed and ex:
                pk = 0
            out["packed"] += pk
            out["exec_cache"] += ex
            out["fp"] += nbytes(w.bias)
        elif hasattr(w, "size") and hasattr(w, "dtype"):
            out["fp"] += nbytes(w)
        return None

    jax.tree_util.tree_map(visit, params,
                           is_leaf=lambda x: isinstance(x, QLinear4))
    return out


def kv_cache_bytes(num_layers: int, batch: int, s_axis: int, kv_heads: int,
                   head_dim: int, quantized: bool = True,
                   dtype_bytes: int = 2) -> int:
    """Bytes of a KVCache allocation (codes + scales when quantized)."""
    per = 2 * num_layers * batch * kv_heads * s_axis
    if quantized:
        return per * head_dim + per * 4
    return per * head_dim * dtype_bytes


def serving_act_bytes(config, max_batch: int, prefill_bucket: int,
                      steps_per_sync: int = 8) -> int:
    """Rough peak activation/workspace estimate for serving (NOT exact —
    XLA reuses buffers; this bounds the transient residency class):
    prefill at the given bucket keeps a few S×max(4H, 2I) planes live per
    layer boundary, decode keeps B×(H+V) logits/hidden plus the chunk's
    KV staging block."""
    h, i, v = (config.hidden_size, config.intermediate_size,
               config.vocab_size)
    act = 2  # bf16 planes
    prefill = prefill_bucket * max(4 * h, 2 * i) * act * 2
    stage = (2 * config.num_layers * max_batch * config.num_kv_heads
             * steps_per_sync * (config.hd + 4))
    decode = max_batch * (h * act + v * 4) + stage
    return int(max(prefill, decode))


def format_footprint(fp: Dict[str, Any]) -> str:
    """Human-readable footprint table (engine.footprint() output)."""
    gib = 1024 ** 3
    lines = ["HBM footprint (per chip):"]
    for key in ("packed", "exec_cache", "fp", "kv", "activations_est"):
        if key in fp:
            lines.append(f"  {key:<16} {fp[key] / gib:8.3f} GiB")
    lines.append(f"  {'total':<16} {fp['total'] / gib:8.3f} GiB"
                 f" / {fp['budget'] / gib:.1f} GiB"
                 f" ({'fits' if fp['fits'] else 'OVER BUDGET'})")
    return "\n".join(lines)


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
