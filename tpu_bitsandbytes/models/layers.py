"""Functional transformer building blocks with quantizable weights.

The engine-side counterpart of the nn module layer: model parameters are
plain pytrees of arrays plus :class:`QLinear4` quantized-linear leaves, so a
whole model jits/shards/checkpoints as one tree (the reference has no model
layer — demo/chat.py leans on HF torch modules; here the decode engine needs
its own, SURVEY §3.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..functional import (
    QuantState,
    _pad_k,
    dequantize_blockwise,
    quantize_4bit,
    quantize_blockwise,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QLinear4:
    """4-bit quantized linear weight for functional models.

    Storage is 2D and shard-friendly: ``packed`` [N, K_pad/2] uint8 (row-wise
    nibble pairs — same codes as :func:`quantize_4bit`), ``absmax``
    [N, blocks_per_row]. Column-parallel TP shards dim 0 of both; row-parallel
    shards dim 1 (absmax blocks align with packed bytes since
    blocksize/2 | K2 tile). ``absmax_q``/``absmax_state`` hold the
    double-quantized scales when compress_statistics is on.
    """

    packed: jnp.ndarray
    absmax: Optional[jnp.ndarray]
    shape: Tuple[int, int]
    blocksize: int = 64
    quant_type: str = "nf4"
    dtype: Any = jnp.bfloat16
    bias: Optional[jnp.ndarray] = None
    absmax_q: Optional[jnp.ndarray] = None          # int8 [N, nb] when dq
    absmax_state: Optional[QuantState] = None       # nested scale state
    w_cache: Optional[jnp.ndarray] = None           # runtime exec cache [N,K]
    cache_scale: Optional[jnp.ndarray] = None       # f32 [N] (int8 cache only)

    def tree_flatten(self):
        return ((self.packed, self.absmax, self.bias, self.absmax_q,
                 self.absmax_state, self.w_cache, self.cache_scale),
                (self.shape, self.blocksize, self.quant_type, self.dtype))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (packed, absmax, bias, absmax_q, absmax_state,
         w_cache, cache_scale) = leaves
        shape, blocksize, quant_type, dtype = aux
        obj = cls.__new__(cls)
        obj.packed, obj.absmax, obj.bias = packed, absmax, bias
        obj.absmax_q, obj.absmax_state = absmax_q, absmax_state
        obj.w_cache, obj.cache_scale = w_cache, cache_scale
        obj.shape, obj.blocksize = shape, blocksize
        obj.quant_type, obj.dtype = quant_type, dtype
        return obj

    # -- construction -----------------------------------------------------
    @classmethod
    def quantize(cls, w: jnp.ndarray, blocksize: int = 64,
                 quant_type: str = "nf4", dtype=jnp.bfloat16,
                 bias: Optional[jnp.ndarray] = None,
                 compress_statistics: bool = False) -> "QLinear4":
        n, k = w.shape
        packed_flat, state = quantize_4bit(
            w, blocksize=blocksize, quant_type=quant_type)
        k2 = _pad_k(k, blocksize) // 2
        nb = _pad_k(k, blocksize) // blocksize
        if compress_statistics:
            # Nested layout deviates from the flat blocksize-256 the
            # functional API keeps for bnb parity (quantize_4bit;
            # reference functional.py:244-259): here nested blocks align
            # with weight rows (one int8 block + one fp32 scale per row), so
            # the compressed scales shard exactly like ``absmax`` under TP —
            # column shards slice rows of both, row shards slice absmax_q
            # columns while the per-row nested scale stays valid elementwise.
            absmax_q, st2 = quantize_blockwise(
                state.absmax.reshape(n, nb), blocksize=nb)
            return cls(packed=packed_flat.reshape(n, k2), absmax=None,
                       shape=(n, k), blocksize=blocksize, quant_type=quant_type,
                       dtype=jnp.dtype(dtype), bias=bias,
                       absmax_q=absmax_q, absmax_state=st2)
        return cls(packed=packed_flat.reshape(n, k2),
                   absmax=state.absmax.reshape(n, nb), shape=(n, k),
                   blocksize=blocksize, quant_type=quant_type,
                   dtype=jnp.dtype(dtype), bias=bias)

    def materialize_absmax(self) -> jnp.ndarray:
        if self.absmax is not None:
            return self.absmax
        n, nb = self.absmax_q.shape
        flat = dequantize_blockwise(self.absmax_q.reshape(-1), self.absmax_state)
        return flat.reshape(n, nb)

    def quant_state(self) -> QuantState:
        return QuantState(
            absmax=self.materialize_absmax().reshape(-1),
            shape=tuple(self.shape), blocksize=self.blocksize,
            quant_type=self.quant_type, dtype=self.dtype)

    # -- runtime execution cache ------------------------------------------
    def with_runtime_cache(self, fmt: str = "int8",
                           drop_packed: bool = False) -> "QLinear4":
        """Materialize an execution cache of the NF4 weight for decode speed.

        TPU-measured (kbench/probe2): XLA's convert+dot rides at ~750 GB/s
        (91% of v5e HBM roofline) at decode M, while any in-kernel 4-bit
        decode pays a VPU wall an order of magnitude below that. The cache
        trades HBM footprint for bandwidth-optimal execution:

        * ``"int8"`` — per-output-row symmetric int8 requantization of the
          dequantized NF4 weight (2x packed size; adds <=0.4% rowmax-relative
          error on top of NF4, see tests/test_runtime_cache.py);
        * ``"int4"`` — per-(row, 128-block) symmetric int4-linear
          requantization stored as native S4 (1x packed size; decode
          streams it at ~720 GB/s = 2.3x the int8 cache per matmul,
          kbench/int4_args_probe). OPT-IN: int4-linear is FP4-class
          resolution (~1.5x NF4's RMS error) and the decode kernel
          row-quantizes activations to int8 — see ops/int4cache.py;
        * ``"bf16"`` — exact NF4 numerics at 4x packed size.

        NF4 remains the storage/checkpoint format. ``drop_packed`` frees the
        packed codes + absmax (serving mode; such params can't be
        checkpointed as NF4).
        """
        from ..functional import dequantize_4bit
        state = self.quant_state()
        state = dataclasses.replace(state, dtype=jnp.float32)
        w = dequantize_4bit(self.packed.reshape(-1), state)
        if fmt == "bf16":
            cache, scale = w.astype(jnp.bfloat16), None
        elif fmt == "int8":
            s = jnp.clip(jnp.max(jnp.abs(w), axis=1), min=1e-8) / 127.0
            cache = jnp.clip(jnp.round(w / s[:, None]), -127, 127
                             ).astype(jnp.int8)
            scale = s.astype(jnp.float32)
        elif fmt == "int4":
            from ..ops.int4cache import quantize_int4
            cache, scale = quantize_int4(w)
        else:
            raise ValueError(f"unknown runtime cache format: {fmt!r}")
        return dataclasses.replace(
            self, w_cache=cache, cache_scale=scale,
            packed=None if drop_packed else self.packed,
            absmax=None if drop_packed else self.absmax,
            absmax_q=None if drop_packed else self.absmax_q,
            absmax_state=None if drop_packed else self.absmax_state)

    def hbm_bytes(self) -> int:
        """HBM bytes one forward pass reads for the weight."""
        if self.w_cache is not None:
            if self.w_cache.dtype == jnp.int4:     # device-packed 2/byte
                b = self.w_cache.size // 2
            else:
                b = self.w_cache.size * self.w_cache.dtype.itemsize
            if self.cache_scale is not None:
                b += self.cache_scale.size * 4
            return b
        b = self.packed.size
        if self.absmax is not None:
            b += self.absmax.size * 4
        elif self.absmax_q is not None:
            b += self.absmax_q.size + self.absmax_state.absmax.size * 4
        if self.bias is not None:
            b += self.bias.size * self.bias.dtype.itemsize
        return b

    # -- apply ------------------------------------------------------------
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        if self.w_cache is not None:
            if self.w_cache.dtype == jnp.int4:
                # int4 execution cache: per-64-block partial-scale Pallas
                # kernel at decode M, XLA dequant+dot at prefill M
                # (ops/int4cache.py — 0.5 B/param at ~650 GB/s).
                from ..ops.int4cache import int4_matmul
                out = int4_matmul(x2, self.w_cache, self.cache_scale,
                                  bias=self.bias, out_dtype=self.dtype,
                                  n_out=self.shape[0],
                                  # row-parallel TP shard (set by
                                  # parallel.tp._localize): pmax the A8 row
                                  # scale so quantization matches 1-device
                                  xmax_axis=getattr(self, "_tp_axis", None))
                return out.reshape(*orig_shape[:-1], self.shape[0])
            # Bandwidth-optimal path: XLA fuses the int8->bf16 convert and
            # the row-scale epilogue into the dot (kbench/probe2).
            out = jax.lax.dot_general(
                x2, self.w_cache.astype(x2.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if self.cache_scale is not None:
                out = out * self.cache_scale[None, :]
            if self.bias is not None:
                out = out + self.bias.astype(out.dtype)
            out = out.astype(self.dtype)
        else:
            out = None
            if self._w4a8_ok(x2):
                # packed-bytes decode path (W4A8, ops/w4a8.py): streams the
                # NF4 nibbles at 0.5 B/param — the HBM-constrained execution
                # format when the int8 cache does not fit (13B on 16 GB).
                from ..ops.w4a8 import w4a8_matmul_4bit
                try:
                    out = w4a8_matmul_4bit(
                        x2, self.packed.reshape(-1), self.quant_state(),
                        bias=self.bias, out_dtype=self.dtype)
                except NotImplementedError:
                    out = None
            if out is None:
                from ..functional import matmul_4bit
                out = matmul_4bit(x2, self.packed.reshape(-1),
                                  self.quant_state(), bias=self.bias,
                                  compute_dtype=self.dtype)
        return out.reshape(*orig_shape[:-1], self.shape[0])

    def _w4a8_ok(self, x2) -> bool:
        """Route decode-shaped packed matmuls to the W4A8 kernel: TPU
        backend (or TBNB_W4A8_INTERPRET=1 for CPU differential tests),
        NF4, small M. The A8 row quantization is lossy in the same class
        as the int8 KV cache / execution cache (<=0.8% rel on activations);
        TBNB_W4A8=0 restores the exact bf16-prescale kernel."""
        import os
        from ..ops.w4a8 import w4a8_enabled
        if not w4a8_enabled() or self.quant_type != "nf4":
            return False
        if (jax.default_backend() != "tpu"
                and os.environ.get("TBNB_W4A8_INTERPRET") != "1"):
            return False
        return x2.shape[0] <= 64


def linear_apply(w, x):
    """Apply a weight leaf: QLinear4/LoRALinear (callable pytrees), dict with
    'w' (+optional 'b'), or a raw [N, K] array."""
    if isinstance(w, dict):
        out = x @ w["w"].T.astype(x.dtype)
        if w.get("b") is not None:
            out = out + w["b"].astype(out.dtype)
        return out
    if callable(w) and not isinstance(w, jnp.ndarray):
        return w(x)
    return x @ w.T.astype(x.dtype)


# --- norms / activations ----------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5,
             offset: float = 0.0):
    """RMSNorm. ``offset``: Gemma stores zero-centered norm weights and
    multiplies by (1 + w) *in fp32* — pass offset=1.0 for that convention.
    The default (offset 0) matches HF Llama bit-for-bit in half precision:
    the normalized activation is cast back to the input dtype BEFORE the
    weight multiply."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    if offset:
        w = weight.astype(jnp.float32) + offset
        return ((x32 * jax.lax.rsqrt(var + eps)) * w).astype(dtype)
    return ((x32 * jax.lax.rsqrt(var + eps)).astype(dtype)
            * weight.astype(dtype))


def layer_norm(x, weight, bias, eps: float = 1e-5):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y.astype(dtype) * weight.astype(dtype)) + bias.astype(dtype)


# --- RoPE -------------------------------------------------------------------


def rope_table(head_dim: int, max_seq: int, theta: float = 10000.0,
               scaling=None):
    """Precompute RoPE cos/sin tables [max_seq, head_dim/2] (fp32).

    ``scaling``: hashable tuple (it rides on the static jit config):
      ("linear", factor) — position-interpolation: inv_freq / factor;
      ("llama3", factor, low_freq_factor, high_freq_factor, orig_max) —
      Llama-3.1 frequency-band scaling: long wavelengths divided by
      ``factor``, short kept, the band between smoothly interpolated
      (matches transformers' _compute_llama3_parameters).
    """
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    if scaling is not None:
        kind = scaling[0]
        if kind == "linear":
            inv_freq = inv_freq / scaling[1]
        elif kind == "llama3":
            _, factor, low_f, high_f, orig_max = scaling
            low_wavelen = orig_max / low_f
            high_wavelen = orig_max / high_f
            wavelen = 2 * np.pi / inv_freq
            scaled = inv_freq / factor
            smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
            mid = (1 - smooth) * scaled + smooth * inv_freq
            inv_freq = np.where(wavelen < high_wavelen, inv_freq,
                                np.where(wavelen > low_wavelen, scaled, mid))
        else:
            raise ValueError(f"unknown rope scaling: {scaling!r}")
    t = np.arange(max_seq)
    freqs = np.outer(t, inv_freq)
    return jnp.asarray(np.cos(freqs), jnp.float32), \
        jnp.asarray(np.sin(freqs), jnp.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [..., S, H, D]; cos/sin [S, R/2] (gathered for the right
    positions). R = 2 * cos.shape[-1] is the rotary dim: R < D is partial
    rotary (Phi/StableLM/NeoX) — the trailing D-R dims pass through."""
    rd = 2 * cos.shape[-1]
    rot, rest = x[..., :rd], x[..., rd:]
    d2 = rd // 2
    x1 = rot[..., :d2]
    x2 = rot[..., d2:]
    # cos/sin broadcast over head dim: [..., S, 1, R/2]
    c = cos[..., :, None, :].astype(x.dtype)
    s = sin[..., :, None, :].astype(x.dtype)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out


# --- attention --------------------------------------------------------------


def _causal_mask(s, t, causal_offset, window=None, kpos_start=0,
                 ring=None):
    """Causal (and optionally sliding-window) attention mask.

    ``window``: Mistral-style sliding window — a query at position p attends
    to keys in (p - window, p]. None = full causal.
    ``kpos_start``: absolute position of key index 0 — the windowed-decode
    path slices the KV read to [start, start+span) (KVCache.read_raw with
    start) so the mask must see absolute key positions.
    ``ring``: rolling-KV mode — key index r holds the LAST absolute
    position a congruent to r mod ``ring`` with a <= query position;
    requires ``causal_offset`` (decode) and a ring at least
    window + max-in-flight-positions long so every in-window entry is
    unambiguous.
    """
    if ring is not None:
        assert causal_offset is not None, "ring mask is decode-only"
        r = jnp.arange(t)[None, None, :]
        off = causal_offset[:, :, None]
        a = off - ((off - r) % ring)        # entry's absolute position
        keep = a >= 0                       # unwritten entries excluded
        if window is not None:
            keep &= a > off - window
        return keep[:, None, None, :, :]
    if causal_offset is None:
        assert kpos_start == 0, \
            "kpos_start needs absolute query positions (pass causal_offset)"
        qpos = jnp.arange(s)[:, None]
        kpos = jnp.arange(t)[None, :]
        keep = kpos <= qpos
        if window is not None:
            keep &= kpos > qpos - window
        return keep[None, None, None, :, :]                 # [1,1,1,S,T]
    kpos = kpos_start + jnp.arange(t)[None, None, :]
    off = causal_offset[:, :, None]
    keep = kpos <= off                                      # [B, S, T]
    if window is not None:
        keep &= kpos > off - window
    return keep[:, None, None, :, :]                        # [B,1,1,S,T]


def _softcap(logits, cap):
    """Gemma2-style logit soft-capping: cap * tanh(x / cap) (fp32)."""
    return cap * jnp.tanh(logits / cap)


# Aligned prefills at S >= this many tokens route to the memory-bounded
# flash path (gqa_attention_flash): the full [B,H,S,S] logits tensor at
# S=2048, B=8, 7B-shape is ~17 GB fp32 — over a v5e's HBM (VERDICT r2
# missing #4). Below it, the one-shot einsum is faster (no scan overhead).
FLASH_PREFILL_THRESHOLD = 1024


def gqa_attention_flash(q, k, v, *, scale=None, window=None, softcap=None,
                        block_q: int = 512, block_k: int = 512):
    """Memory-bounded causal GQA for aligned prefill (S == T).

    Online-softmax (flash-attention recurrence) over [block_q, block_k]
    tiles: per query block, a lax.scan streams key/value blocks up to the
    causal diagonal carrying the running max/denominator/accumulator, so
    peak memory is O(B·H·block_q·block_k) logits + the O(B·H·S·D) carry
    instead of O(B·H·S²) — prefill at S=8192, B=8, 7B-shape fits HBM where
    gqa_attention's materialized logits would need ~270 GB. The tile dots
    ride the MXU in the input dtype with f32 accumulation; max/denominator
    state is f32, matching gqa_attention to ~1e-3 (tests/test_models.py).

    q [B,S,H,D]; k/v [B,T,H_kv,D] token-major (prefill layout). S must
    equal T (aligned causal prefill); query i attends keys <= i, and
    ``window`` adds the Mistral sliding-window cut.
    """
    b, s, h, d = q.shape
    t = k.shape[1]
    h_kv = k.shape[2]
    rep = h // h_kv
    assert s == t, "flash path is for aligned causal prefill (S == T)"
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    cd = q.dtype if q.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    if jax.default_backend() == "cpu":
        cd = jnp.float32
    block_q = min(block_q, s)
    block_k = min(block_k, t)
    # pad S to a block_q multiple, T to block_k (padded keys masked off;
    # padded queries discarded at the end)
    s_pad = -(-s // block_q) * block_q
    t_pad = -(-t // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0))).astype(cd)
    kp = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0), (0, 0))).astype(cd)
    vp = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0), (0, 0))).astype(cd)

    from ..ops.flash_prefill import (flash_prefill_attention,
                                     flash_prefill_supported)
    if (s_pad == t_pad and block_q == block_k == 512
            and flash_prefill_supported(b, s, h, h_kv, d, cd, s_pad)):
        # tiled Pallas kernel: whole online-softmax in VMEM — the XLA scan
        # path's [B,H,512,512] f32 block logits live in HBM and cost ~36%
        # of 7B S=4096 prefill (kbench/prefill_breakdown; ops/flash_prefill)
        out = flash_prefill_attention(qp, kp, vp, s_real=s,
                                      scale=float(scale), window=window,
                                      softcap=softcap)
        return out[:, :s].astype(q.dtype)
    qg = qp.reshape(b, s_pad, h_kv, rep, d)
    # head-major kv blocks for the scan: [n_blocks, B, H_kv, block_k, D]
    kb = jnp.moveaxis(kp.reshape(b, t_pad // block_k, block_k, h_kv, d),
                      1, 0).swapaxes(2, 3)
    vb = jnp.moveaxis(vp.reshape(b, t_pad // block_k, block_k, h_kv, d),
                      1, 0).swapaxes(2, 3)

    outs = []
    for qi in range(s_pad // block_q):
        q_blk = qg[:, qi * block_q:(qi + 1) * block_q]     # [B,bq,Hkv,rep,D]
        qpos = qi * block_q + jnp.arange(block_q)
        n_kb = min(-(-((qi + 1) * block_q) // block_k), t_pad // block_k)

        def step(carry, blk):
            m, l, acc = carry
            k_blk, v_blk, kb_idx = blk
            kpos = kb_idx * block_k + jnp.arange(block_k)
            lg = jnp.einsum("bqhrd,bhkd->bhrqk", q_blk, k_blk,
                            preferred_element_type=jnp.float32) * scale
            if softcap is not None:
                lg = _softcap(lg, softcap)
            keep = kpos[None, :] <= qpos[:, None]
            if window is not None:
                keep &= kpos[None, :] > qpos[:, None] - window
            keep = keep & (kpos[None, :] < t)              # key padding
            keep = keep[None, None, None]
            m_new = jnp.maximum(m, jnp.max(jnp.where(keep, lg, -jnp.inf),
                                           axis=-1))
            m_safe = jnp.maximum(m_new, -1e30)             # all-masked rows
            p = jnp.where(keep, jnp.exp(lg - m_safe[..., None]), 0.0)
            alpha = jnp.exp(jnp.maximum(m, -1e30) - m_safe)
            l = l * alpha + jnp.sum(p, axis=-1)
            acc = (acc * alpha[..., None]
                   + jnp.einsum("bhrqk,bhkd->bhrqd", p.astype(cd), v_blk,
                                preferred_element_type=jnp.float32))
            return (m_new, l, acc), None

        m0 = jnp.full((b, h_kv, rep, block_q), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h_kv, rep, block_q), jnp.float32)
        a0 = jnp.zeros((b, h_kv, rep, block_q, d), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            step, (m0, l0, a0),
            (kb[:n_kb], vb[:n_kb], jnp.arange(n_kb)))
        out_blk = acc / jnp.maximum(l, 1e-38)[..., None]   # [B,Hkv,rep,bq,D]
        outs.append(jnp.moveaxis(out_blk, 3, 1))           # [B,bq,Hkv,rep,D]
    out = jnp.concatenate(outs, axis=1)[:, :s]
    return out.reshape(b, s, h, d).astype(q.dtype)


def gqa_attention(q, k, v, *, causal_offset=None, mask=None, scale=None,
                  window=None, softcap=None, kpos_start=0, ring=None):
    """Grouped-query attention over full K/V.

    q: [B, S, H, D]; k/v: [B, T, H_kv, D]. Returns [B, S, H, D].
    ``causal_offset``: positions of q within the T axis (int array [B, S] or
    None for aligned prefill where S == T).

    Aligned causal prefills at S >= FLASH_PREFILL_THRESHOLD dispatch to
    :func:`gqa_attention_flash` — the one-shot einsum materializes
    O(B·H·S·T) fp32 logits, which leaves HBM around S ≈ 2k at 7B shapes.

    Half-precision inputs contract in their own dtype with f32 accumulation
    (native bf16 MXU passes; an f32 upcast would run the 6-pass MXU
    emulation — KERNEL_NOTES round-1); f32 inputs keep the exact f32 path.
    """
    b, s, h, d = q.shape
    if (causal_offset is None and mask is None and ring is None
            and kpos_start == 0 and s == k.shape[1]
            and s >= FLASH_PREFILL_THRESHOLD):
        return gqa_attention_flash(q, k, v, scale=scale, window=window,
                                   softcap=softcap)
    t = k.shape[1]
    h_kv = k.shape[2]
    rep = h // h_kv
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    half = q.dtype in (jnp.bfloat16, jnp.float16)
    if jax.default_backend() == "cpu":
        half = False    # CPU DotThunk lacks bf16 kernels for some layouts
    qg = q.reshape(b, s, h_kv, rep, d)
    qc, kc = (qg, k.astype(q.dtype)) if half else (qg.astype(jnp.float32),
                                                   k.astype(jnp.float32))
    logits = jnp.einsum("bshrd,bthd->bhrst", qc, kc,
                        preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        logits = _softcap(logits, softcap)
    if mask is None:
        mask = _causal_mask(s, t, causal_offset, window, kpos_start, ring)
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    pc, vc = (probs.astype(q.dtype), v.astype(q.dtype)) if half else (
        probs, v.astype(jnp.float32))
    out = jnp.einsum("bhrst,bthd->bshrd", pc, vc,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h, d).astype(q.dtype)


def gqa_attention_hm(q, k, v, *, causal_offset=None, scale=None,
                     window=None, softcap=None, kpos_start=0, ring=None):
    """GQA over **head-major** full-precision K/V (unquantized decode path).

    q: [B, S, H, D]; k/v: [B, H_kv, T, D] — the KV cache's storage layout
    (KVCache.read_raw), so the span slice feeds both contractions in place,
    with no transposed copy (the same layout win gqa_attention_kv_quant
    gives the quantized path). Same dtype policy as gqa_attention:
    half-precision contracts natively with f32 accumulation, f32 stays f32.
    """
    b, s, h, d = q.shape
    h_kv, t = k.shape[1], k.shape[2]
    rep = h // h_kv
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    half = q.dtype in (jnp.bfloat16, jnp.float16)
    if jax.default_backend() == "cpu":
        half = False    # CPU DotThunk lacks bf16 kernels for some layouts
    qg = q.reshape(b, s, h_kv, rep, d)
    qc, kc = (qg, k.astype(q.dtype)) if half else (qg.astype(jnp.float32),
                                                   k.astype(jnp.float32))
    logits = jnp.einsum("bshrd,bhtd->bhrst", qc, kc,
                        preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        logits = _softcap(logits, softcap)
    logits = jnp.where(_causal_mask(s, t, causal_offset, window,
                                    kpos_start, ring),
                       logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    pc, vc = (probs.astype(q.dtype), v.astype(q.dtype)) if half else (
        probs, v.astype(jnp.float32))
    out = jnp.einsum("bhrst,bhtd->bshrd", pc, vc,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h, d).astype(q.dtype)


def gqa_attention_kv_quant(q, k_q, k_scale, v_q, v_scale, *,
                           causal_offset=None, scale=None, window=None,
                           softcap=None, kpos_start=0, ring=None,
                           staged=None):
    """GQA directly over int8 KV codes (decode fast path).

    q: [B, S, H, D]; k_q/v_q: int8 **head-major** [B, H_kv, T, D];
    k_scale/v_scale: f32 [B, H_kv, T] per-(head, token) absmax scales
    (engine/kvcache.py _quant). The operand layout IS the KV cache's storage
    layout (KVCache.read_raw), so both contractions — batch dims (B, H_kv),
    contract D (QK^T) / T (PV) — consume the span-sliced codes in place; no
    transposed copy is ever materialized (the token-major layout cost
    ~1.7 ms/step at 7B B=8, kbench/profile_decode).

    The dequantized K/V are never materialized either: ``k_scale`` indexes
    the logits' *output* axis t, so it folds into the logits after the QK^T
    contraction; ``v_scale`` indexes the PV contraction axis, so it folds
    into the probabilities before the PV contraction. Both einsums then run
    as int8→bf16 convert+dot (MXU-ingest-fused by XLA, same mechanism as
    the int8 runtime weight cache) with f32 accumulation. int8 codes are
    exact in bf16, so the only precision loss vs dequant-first is rounding
    softmax probabilities to bf16 — with f32 accumulation this is the
    standard flash-attention arrangement.

    ``staged`` (optional): ``(st_k, st_ks, st_v, st_vs, step)`` — the decode
    chunk's staging buffers (KVCache.read_stage). The staged entries join as
    a second KV block: entry j' holds the token the slot emitted at chunk
    step j' (absolute position len0+j'), so its mask is the uniform
    ``j' <= step``, while the main block is cut at the pre-chunk boundary
    ``kpos < len0 = causal_offset - step`` (staged tokens are NOT in the
    main cache until the chunk-end flush). Softmax runs over the
    concatenated logits — numerically the same softmax over the same set of
    keys as the unstaged path. Requires S == 1 and no ring.
    """
    b, s, h, d = q.shape
    h_kv, t = k_q.shape[1], k_q.shape[2]
    rep = h // h_kv
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    cd = (q.dtype if q.dtype in (jnp.bfloat16, jnp.float16)
          else jnp.float32)
    if jax.default_backend() == "cpu":
        # CPU's DotThunk has no bf16 x bf16 -> f32 kernel for the head-major
        # batched dot; f32 is numerically a superset, and CPU is the
        # test/fallback backend — TPU keeps the bf16 MXU-ingest path.
        cd = jnp.float32
    qg = q.reshape(b, s, h_kv, rep, d).astype(cd)
    logits = jnp.einsum("bshrd,bhtd->bhrst", qg, k_q.astype(cd),
                        preferred_element_type=jnp.float32)
    # k_scale [B,H_kv,T] -> [B,H_kv,1,1,T] on the logits' output axis
    ks = (k_scale * (scale / 127.0))[:, :, None, None, :]
    logits = logits * ks
    if staged is not None:
        assert s == 1 and ring is None, "staged attention is decode-only"
        st_k, st_ks, st_v, st_vs, step = staged
        c = st_k.shape[2]
        lg_st = jnp.einsum("bshrd,bhtd->bhrst", qg, st_k.astype(cd),
                           preferred_element_type=jnp.float32)
        lg_st = lg_st * (st_ks * (scale / 127.0))[:, :, None, None, :]
        if softcap is not None:
            logits = _softcap(logits, softcap)
            lg_st = _softcap(lg_st, softcap)
        kpos = kpos_start + jnp.arange(t)[None, None, :]
        off = causal_offset[:, :, None]               # [B, 1, 1]
        keep_main = kpos <= off - step - 1            # pre-chunk region only
        jst = jnp.arange(c)[None, None, :]
        keep_st = jnp.broadcast_to(jst <= step, (b, 1, c))
        if window is not None:
            keep_main &= kpos > off - window
            keep_st &= jst > step - window
        # two-block ONLINE softmax — no [.., T+C] concat/split copies (the
        # concatenated variant cost ~0.3 ms/step of relayout at 7B B=8,
        # kbench/fusion_breakdown): shared max over both masked blocks,
        # unnormalized exps, one denominator, PV per block.
        logits = jnp.where(keep_main[:, None, None, :, :], logits, -1e30)
        lg_st = jnp.where(keep_st[:, None, None, :, :], lg_st, -1e30)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True),
                        jnp.max(lg_st, axis=-1, keepdims=True))
        pm = jnp.exp(logits - m)
        pst = jnp.exp(lg_st - m)
        denom = (jnp.sum(pm, axis=-1, keepdims=True)
                 + jnp.sum(pst, axis=-1, keepdims=True))
        vs = (v_scale / 127.0)[:, :, None, None, :]
        stvs = (st_vs / 127.0)[:, :, None, None, :]
        out = (jnp.einsum("bhrst,bhtd->bshrd", (pm * vs).astype(cd),
                          v_q.astype(cd),
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhrst,bhtd->bshrd", (pst * stvs).astype(cd),
                            st_v.astype(cd),
                            preferred_element_type=jnp.float32))
        # denom [B,Hkv,rep,S,1] -> the out axes [B,S,Hkv,rep,D]
        out = out / jnp.moveaxis(denom, (1, 2, 3), (2, 3, 1))
        return out.reshape(b, s, h, d).astype(q.dtype)
    if softcap is not None:
        logits = _softcap(logits, softcap)
    logits = jnp.where(_causal_mask(s, t, causal_offset, window,
                                    kpos_start, ring),
                       logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    # v_scale folds on the contraction axis t, before the PV product
    vs = (v_scale / 127.0)[:, :, None, None, :]
    pv = (probs * vs).astype(cd)
    out = jnp.einsum("bhrst,bhtd->bshrd", pv, v_q.astype(cd),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h, d).astype(q.dtype)


def gqa_attention_kv_window(q, k_q, k_scale, v_q, v_scale, *, cut,
                            attn_start, len0, step, causal_offset,
                            scale=None, window=None, softcap=None):
    """Single-block decode attention over the per-chunk compact KV window.

    The compact window (engine.kvcache.KVStage, ``cut > 0``) lays the
    frozen main-cache span ``[attn_start, attn_start + cut)`` contiguously
    in front of the chunk's staged tokens, so the whole attention is ONE
    unsliced einsum chain + softmax with a 2D-position mask — no strided
    span slice, no two-block staged softmax. Measured 30.0 us/layer-step
    vs 51.2 for the two-block formulation at 7B B=8 bench shapes
    (kbench/fd_probe round 5; the slice cost ~10 us/layer, the two-block
    structure ~17). Same attended-key set as
    :func:`gqa_attention_kv_quant` ``staged=``: main keys are cut at each
    slot's chunk-start length (stale tail entries masked), staged key j
    (absolute position ``len0 + j``) joins when ``j <= step``.

    q [B, 1, H, D]; k_q/v_q int8 [B, H_kv, W, D] with W = cut + C;
    k_scale/v_scale f32 [B, H_kv, W]; ``len0`` i32 [B] chunk-start
    lengths; ``step`` i32 scalar; ``causal_offset`` i32 [B, 1] current
    positions. Reference anchor: the reference has no attention at all
    (SURVEY §5); this is the serving-path analog of its fused
    dequant-matmuls.
    """
    b, s, h, d = q.shape
    assert s == 1, "compact-window attention is decode-only"
    h_kv, w = k_q.shape[1], k_q.shape[2]
    rep = h // h_kv
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    cd = (q.dtype if q.dtype in (jnp.bfloat16, jnp.float16)
          else jnp.float32)
    if jax.default_backend() == "cpu":
        cd = jnp.float32
    qg = q.reshape(b, 1, h_kv, rep, d).astype(cd)
    lg = jnp.einsum("bshrd,bhtd->bhrst", qg, k_q.astype(cd),
                    preferred_element_type=jnp.float32)
    lg = lg * (k_scale * (scale / 127.0))[:, :, None, None, :]
    if softcap is not None:
        lg = _softcap(lg, softcap)
    idx = jnp.arange(w)[None, :]
    in_tail = idx >= cut
    kpos = jnp.where(in_tail, len0[:, None] + (idx - cut),
                     attn_start + idx)                        # [B, W]
    off = causal_offset[:, :1]                                # [B, 1]
    keep = (kpos <= off) & (in_tail | (kpos <= len0[:, None] - 1))
    if window is not None:
        keep &= kpos > off - window
    lg = jnp.where(keep[:, None, None, None, :], lg, -1e30)
    p = jax.nn.softmax(lg, axis=-1)
    pv = (p * (v_scale / 127.0)[:, :, None, None, :]).astype(cd)
    out = jnp.einsum("bhrst,bhtd->bshrd", pv, v_q.astype(cd),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, s, h, d).astype(q.dtype)
