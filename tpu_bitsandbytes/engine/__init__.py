"""Decode engine: quantized KV cache, samplers, continuous batching."""

from .kvcache import KVCache
from .sampler import SamplingParams, sample
from .engine import DecodeEngine, decode_step, prefill_step, \
    prefill_step_spmd, Request
from .speculative import propose_ngram, verify_step

__all__ = ["KVCache", "SamplingParams", "sample", "DecodeEngine",
           "decode_step", "prefill_step", "prefill_step_spmd", "Request",
           "propose_ngram", "verify_step"]
