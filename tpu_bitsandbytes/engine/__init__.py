"""Decode engine: quantized KV cache, samplers, continuous batching."""

from .kvcache import KVCache
from .sampler import SamplingParams, sample
from .engine import DecodeEngine, decode_step, prefill_step, \
    prefill_step_spmd, Request

__all__ = ["KVCache", "SamplingParams", "sample", "DecodeEngine",
           "decode_step", "prefill_step", "prefill_step_spmd", "Request"]
