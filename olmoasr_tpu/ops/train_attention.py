"""Training-shape self-attention Pallas kernels (encoder hot path).

Why not the stock flash kernel: the whisper encoder trains at
(B~16, H=16, T=1500, d_head=64). Measured on v5e (perf/r3_probe_attn2.log)
the generic Pallas flash kernel runs this at ~33 TF/s fwd and ~9 TF/s-equiv
fwd+bwd (d=64 caps the MXU at 50% of peak, and the online-softmax
bookkeeping + separate dkv/dq backward passes eat the rest), and under
``jax.checkpoint`` its custom VJP re-runs the whole forward to regenerate
softmax stats — three kernel executions per layer per step.

This kernel is specialized to the non-causal, fixed-length encoder shape:

- one-pass softmax: the full key row (T<=1536) fits VMEM, so each q block
  computes max/sum in one sweep — no online rescale corrections, no
  (…, 128)-padded stats tensors in HBM;
- static pad masking: 1500 -> 1536 padding is the same for every sample, a
  (1, T) additive bias vector replaces per-block segment-id compares;
- fused single-pass backward: one kernel produces dq, dk, dv, recomputing
  probabilities once (vs the stock kernel's separate dkv + dq passes, each
  re-doing the softmax);
- residuals are just (q, k, v): under any remat policy the backward needs no
  forward re-run (no stats to regenerate), so the ``attn``-policy recompute
  shrinks from a full flash forward to three cheap projections.

Matches torch SDPA attention math (reference olmoasr/model.py:330-340):
scale q by d_head**-0.5 (0.125 — exact in bf16), softmax in fp32, probs cast
to bf16 for the value contraction.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round128(t: int) -> int:
    return ((t + 127) // 128) * 128


def _dividing_block(block: int, total: int) -> int:
    """Largest 128-multiple <= block that divides total (q rows past the
    array's end would otherwise enter the bwd dk/dv accumulation as garbage)."""
    b = min(block, total)
    while total % b:
        b -= 128
    return max(b, 128)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _bf16_exp() -> bool:
    # read at trace time (note: flipping the env after a shape has been
    # jit-cached will not retrace — use a fresh process when sweeping)
    return os.environ.get("OLMOASR_ATTN_BF16_EXP", "0") == "1"


def _softmax_rows(s: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(unnormalized probs bf16, row sums f32) of a (rows, T) f32 score block.

    OLMOASR_ATTN_BF16_EXP=1 runs the exp in bf16 (2 elements/VPU lane): after
    the fp32 max-subtract the argument is <= 0 and the softmax is dominated
    by the near-max entries where bf16's ~3 decimal digits are plenty;
    default off = exact-fp32-softmax parity with torch SDPA.
    """
    m = jnp.max(s, axis=-1, keepdims=True)
    if _bf16_exp():
        p = jnp.exp((s - m).astype(jnp.bfloat16))
        return p, jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
    p = jnp.exp(s - m)
    return p.astype(jnp.bfloat16), jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # q: (BQ, dh) bf16, k/v: (T, dh) bf16, bias: (1, T) f32, o: (BQ, dh)
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, T)
    s = s + bias_ref[:]
    p, l = _softmax_rows(s)
    o = jax.lax.dot_general(
        p, v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, dh)
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _enc_attn_fwd(
    q: jax.Array,  # (N, T, dh) bf16, q pre-scaled
    k: jax.Array,  # (N, T, dh)
    v: jax.Array,
    bias: jax.Array,  # (1, T) f32 additive (0 valid, -1e9 pad)
    *,
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    N, T, dh = q.shape
    bq = _dividing_block(block_q, T)
    grid = (N, T // bq)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((N, T, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, T, dh), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, T, dh), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, T), lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda n, i: (n, i, 0)),
        interpret=interpret,
    )(q, k, v, bias)


# ---------------------------------------------------------------------------
# backward: one pass producing dq, dk, dv
# ---------------------------------------------------------------------------


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, bias_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
):
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # (BQ, dh) pre-scaled
    k = k_ref[0]  # (T, dh)
    v = v_ref[0]
    do = do_ref[0]  # (BQ, dh)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[:]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pn = p / l  # normalized probs (BQ, T) f32
    pnb = pn.astype(jnp.bfloat16)

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, T)
    delta = jnp.sum(dp * pn, axis=-1, keepdims=True)  # (BQ, 1)
    ds = (pn * (dp - delta)).astype(jnp.bfloat16)  # (BQ, T)

    dq_ref[0] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)  # (BQ, dh); caller rescales by sm_scale

    dk_acc[:] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, dh)
    dv_acc[:] += jax.lax.dot_general(
        pnb, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, dh)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _enc_attn_bwd(
    q: jax.Array,  # (N, T, dh) pre-scaled
    k: jax.Array,
    v: jax.Array,
    do: jax.Array,
    bias: jax.Array,  # (1, T)
    *,
    block_q: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    N, T, dh = q.shape
    bq = _dividing_block(block_q, T)
    grid = (N, T // bq)
    out_shapes = (
        jax.ShapeDtypeStruct((N, T, dh), q.dtype),  # dq (pre-scale basis)
        jax.ShapeDtypeStruct((N, T, dh), k.dtype),  # dk
        jax.ShapeDtypeStruct((N, T, dh), v.dtype),  # dv
    )
    kv_spec = pl.BlockSpec((1, T, dh), lambda n, i: (n, 0, 0))
    qblk_spec = pl.BlockSpec((1, bq, dh), lambda n, i: (n, i, 0))
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            qblk_spec,  # q
            kv_spec,    # k
            kv_spec,    # v
            qblk_spec,  # do
            pl.BlockSpec((1, T), lambda n, i: (0, 0)),  # bias
        ],
        out_specs=(qblk_spec, kv_spec, kv_spec),
        scratch_shapes=[
            pltpu.VMEM((T, dh), jnp.float32),  # dk accumulator
            pltpu.VMEM((T, dh), jnp.float32),  # dv accumulator
        ],
        interpret=interpret,
    )(q, k, v, do, bias)


# ---------------------------------------------------------------------------
# public entry: (B, T, D) -> (B, T, D), custom VJP, residuals = (q, k, v)
# ---------------------------------------------------------------------------


def _split(x: jax.Array, n_head: int) -> jax.Array:
    B, T, D = x.shape
    dh = D // n_head
    return (
        x.reshape(B, T, n_head, dh)
        .transpose(0, 2, 1, 3)
        .reshape(B * n_head, T, dh)
    )


def _merge(x: jax.Array, n_head: int, B: int) -> jax.Array:
    N, T, dh = x.shape
    return (
        x.reshape(B, n_head, T, dh).transpose(0, 2, 1, 3).reshape(B, T, n_head * dh)
    )


def _prep(q, k, v, n_head, interpret):
    B, T, D = q.shape
    dh = D // n_head
    T_pad = _round128(T)
    scale = dh ** -0.5  # 0.125 for dh=64: exact in bf16

    def pad_t(x):
        if T_pad == T:
            return x
        return jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))

    qh = _split(q, n_head) * jnp.asarray(scale, q.dtype)
    kh, vh = _split(k, n_head), _split(v, n_head)
    qh, kh, vh = pad_t(qh), pad_t(kh), pad_t(vh)
    bias = jnp.where(
        jnp.arange(T_pad)[None, :] < T, 0.0, -1e9
    ).astype(jnp.float32)  # (1, T_pad)
    return qh, kh, vh, bias, T_pad, scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def enc_self_attention(
    q: jax.Array,  # (B, T, D)
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal self-attention for training (encoder 1500-position shape).

    Whisper SDPA semantics (reference olmoasr/model.py:330-340): fp32
    softmax, bf16 value contraction. Backward is a single fused Pallas pass;
    residuals are (q, k, v) only, so remat policies never re-run the forward
    kernel. Falls back to this same math under ``interpret=True`` on CPU.
    """
    out, _ = _enc_fwd_res(q, k, v, n_head, interpret)
    return out


def _enc_fwd_res(q, k, v, n_head, interpret):
    B, T, D = q.shape
    qh, kh, vh, bias, T_pad, _ = _prep(q, k, v, n_head, interpret)
    o = _enc_attn_fwd(qh, kh, vh, bias, interpret=interpret)
    o = _merge(o[:, :T], n_head, B)
    return o, (q, k, v)


def _enc_bwd_res(n_head, interpret, res, g):
    q, k, v = res
    B, T, D = q.shape
    qh, kh, vh, bias, T_pad, scale = _prep(q, k, v, n_head, interpret)
    doh = _split(g.astype(q.dtype), n_head)
    if T_pad != T:
        doh = jnp.pad(doh, ((0, 0), (0, T_pad - T), (0, 0)))
    dqh, dkh, dvh = _enc_attn_bwd(qh, kh, vh, doh, bias, interpret=interpret)
    s = jnp.asarray(scale, q.dtype)
    dq = _merge(dqh[:, :T], n_head, B) * s  # d(q*scale)/dq
    dk = _merge(dkh[:, :T], n_head, B)
    dv = _merge(dvh[:, :T], n_head, B)
    return dq, dk, dv


enc_self_attention.defvjp(_enc_fwd_res, _enc_bwd_res)
