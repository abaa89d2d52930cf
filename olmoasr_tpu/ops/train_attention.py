"""Training-shape attention Pallas kernels (whisper encoder/decoder shapes).

Why not the stock flash kernel: whisper trains at d_head=64 with fixed
sequence lengths (encoder 1500, decoder 448 queries over 448/1500 keys).
Measured on v5e (perf/r3_probe_attn2.log) the generic Pallas flash kernel
runs the encoder shape at ~33 TF/s fwd and ~9 TF/s-equiv fwd+bwd (d=64 caps
the MXU at 50% of peak, and the online-softmax bookkeeping + separate
dkv/dq backward passes eat the rest), and under ``jax.checkpoint`` its
custom VJP re-runs the whole forward to regenerate softmax stats — three
kernel executions per layer per step.

These kernels are specialized to the fixed-length training shapes:

- one-pass softmax: the full key row (Tk <= 1536) fits VMEM, so each q block
  computes max/sum in one sweep — no online rescale corrections, no
  (…, 128)-padded stats tensors in HBM;
- static pad masking: 1500 -> 1536 (and 448 -> 512) padding is the same for
  every sample — a (1, Tk) additive bias vector replaces per-block
  segment-id compares; per-sample key padding (decoder text) rides the same
  bias as a (B, Tk) input;
- causal masking (decoder self) from block-offset iota compares;
- fused single-pass backward: ONE kernel produces dq, dk, dv, recomputing
  probabilities once (vs the stock kernel's separate dkv + dq passes, each
  re-doing the softmax);
- residuals are just (q, k, v): under any remat policy the backward needs no
  forward re-run (no stats to regenerate), so the ``attn``-policy recompute
  shrinks from a full flash forward to three cheap projections.

Measured v5e, encoder shape (B=16, T=1500, D=1024, H=16,
perf/r3_probe_trainattn1.log): fwd+bwd 8.8 ms vs stock flash 18.3 ms; grads
within the bf16 noise band of XLA sdpa (rel <= 2e-2). End-to-end medium.en
bs16 train: encoder kernel 4882 -> 5622 tok/s, + decoder self/cross kernels
5851 tok/s / 0.346 MFU (perf/r3_decattn1.log, /tmp repro 2026-08-17).

Matches torch SDPA attention math (reference olmoasr/model.py:330-340):
scale q by d_head**-0.5 (0.125 — exact in bf16), softmax in fp32, probs cast
to bf16 for the value contraction.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round128(t: int) -> int:
    return ((t + 127) // 128) * 128


def _dividing_block(block: int, total: int) -> int:
    """Largest 128-multiple <= block that divides total (q rows past the
    array's end would otherwise enter the bwd dk/dv accumulation as garbage)."""
    b = min(block, total)
    while total % b:
        b -= 128
    return max(b, 128)


def _bf16_exp() -> bool:
    # read at trace time (note: flipping the env after a shape has been
    # jit-cached will not retrace — use a fresh process when sweeping)
    return os.environ.get("OLMOASR_ATTN_BF16_EXP", "0") == "1"


def _defer_l() -> bool:
    # backward-kernel variant: never normalize the (BQ, Tk) probability
    # block by 1/l — fold 1/l into do (a (BQ, dh=64) rescale, Tk/dh times
    # fewer VPU touches) and into the per-row delta. Algebra:
    #   dS = P∘(dp − δ) with P = p/l, dp = do·Vᵀ, δ = Σ dp∘P
    #      = p∘(dp′ − δ′)  with do′ = do/l, dp′ = do′·Vᵀ, δ′ = (Σ dp′∘p)/l
    #   dV = Pᵀ·do = pᵀ·do′
    # so the unnormalized p (already produced in bf16 by the softmax) feeds
    # every consumer. Read at trace time, like _bf16_exp.
    return os.environ.get("OLMOASR_ATTN_DEFER_L", "0") == "1"


def _softmax_rows(s: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(probs f32, probs bf16, row sums f32) of a (rows, Tk) f32 score block.

    OLMOASR_ATTN_BF16_EXP=1 runs the exp in bf16 (2 elements/VPU lane): after
    the fp32 max-subtract the argument is <= 0 and the softmax is dominated
    by the near-max entries where bf16's ~3 decimal digits are plenty;
    default off = exact-fp32-softmax parity with torch SDPA.
    """
    m = jnp.max(s, axis=-1, keepdims=True)
    if _bf16_exp():
        pb = jnp.exp((s - m).astype(jnp.bfloat16))
        return pb.astype(jnp.float32), pb, jnp.sum(
            pb, axis=-1, keepdims=True, dtype=jnp.float32
        )
    p = jnp.exp(s - m)
    return p, p.astype(jnp.bfloat16), jnp.sum(p, axis=-1, keepdims=True)


def _mask_block(s: jax.Array, causal: bool, bq: int) -> jax.Array:
    """Apply the causal mask to a (BQ, Tk) score block at q offset i*BQ."""
    if not causal:
        return s
    i = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(cols > rows, jnp.float32(NEG), s)


def _d128() -> bool:
    # zero-pad d_head 64 -> 128 so every score/value contraction runs at the
    # MXU's full 128 depth/width. Counter-intuitive but measured: the padded
    # dots do 2x the MACs (the MXU cannot skip the zero half) yet finish
    # FASTER than the half-depth ones — rate(K=128) ~ 2.2x rate(K=64) at the
    # encoder training shape (pad256 2.92ms vs seq256 3.25ms fwd,
    # perf/r5_pack3.log; the two-head packed layout with in-kernel
    # block-diagonal K/V measured 5x WORSE, 16.2ms — the concatenates
    # serialize). Zeros flow correctly through the backward: padded q/k/v
    # columns produce zero dq/dk/dv columns, sliced off after the kernel.
    # Values: "1" = pad fwd+bwd kernels, "fwd" = pad the forward only (the
    # bwd has 3 output contractions whose extra padded traffic measured as
    # a net loss, perf/r5_d128_ab.log). Read at trace time.
    return os.environ.get("OLMOASR_ATTN_D128", "0") in ("1", "fwd")


def _d128_bwd() -> bool:
    return os.environ.get("OLMOASR_ATTN_D128", "0") == "1"


def _whole_row() -> bool:
    # whole-row grid: one program per (batch, head) row, python loop over
    # q sub-blocks — k/v stream into VMEM ONCE per row instead of once per
    # (row, q-block). Measured on v5e at the encoder training shape
    # (perf/r4_timing.md, perf/probe_pipe.py row256 / probe_bwd.py row256):
    # fwd 52.8 -> 58.3 TF/s (+10%), bwd +3%. Read at trace time.
    return os.environ.get("OLMOASR_ATTN_WHOLE_ROW", "1") == "1"


def _row_sub_block(tq: int, tk: int) -> int:
    """Largest 16-multiple divisor of ``tq`` whose (sb, Tk) f32 score block
    stays <= ~1.6MB VMEM (sb=256 at the 1536-key encoder shape — the measured
    best; decoder 512-key shapes run the whole row in one block)."""
    cap = int(os.environ.get("OLMOASR_ATTN_ROW_SB", "0"))
    if cap and tq % cap == 0:
        # the override must still satisfy the bf16 sublane rule (16-multiple)
        # or Mosaic fails at lowering with an opaque error (advisor r4)
        if cap % 16 != 0:
            raise ValueError(
                f"OLMOASR_ATTN_ROW_SB={cap} must be a multiple of 16"
            )
        return cap
    budget = 1_638_400  # bytes of f32 scores
    # sub-blocks are any 16-multiple divisor of Tq (bf16 sublane rule) —
    # Tq itself may be a non-128 multiple like the decoder's native 448
    best = None
    for sb in range(16, tq + 1, 16):
        if tq % sb == 0 and sb * tk * 4 <= budget:
            best = sb
    return best if best is not None else tq


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _make_fwd_kernel(causal: bool, bq: int):
    def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        # q: (1, BQ, dh) bf16, k/v: (1, Tk, dh) bf16, bias: (1, 1, Tk) f32
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, Tk)
        s = _mask_block(s + bias_ref[0], causal, bq)
        _, pb, l = _softmax_rows(s)
        o = jax.lax.dot_general(
            pb, v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, dh)
        o_ref[0] = (o / l).astype(o_ref.dtype)

    return _fwd_kernel


def _make_fwd_row_kernel(causal: bool, sb: int, ns: int):
    def _fwd_row_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        # q/o: (1, Tq, dh), k/v: (1, Tk, dh), bias: (1, 1, Tk)
        kk = k_ref[0]
        vv = v_ref[0]
        bb = bias_ref[0]
        for a in range(ns):
            sl = slice(a * sb, (a + 1) * sb)
            s = jax.lax.dot_general(
                q_ref[0, sl], kk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bb
            if causal:
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + a * sb
                )
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(cols > rows, jnp.float32(NEG), s)
            _, pb, l = _softmax_rows(s)
            o = jax.lax.dot_general(
                pb, vv, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, sl] = (o / l).astype(o_ref.dtype)

    return _fwd_row_kernel


@functools.partial(
    jax.jit, static_argnames=("n_head", "causal", "block_q", "interpret")
)
def _attn_fwd(
    q: jax.Array,  # (N, Tq, dh) bf16, q pre-scaled
    k: jax.Array,  # (N, Tk, dh)
    v: jax.Array,
    bias: jax.Array,  # (Bb, Tk) f32 additive; Bb in {1, B}
    n_head: int,
    *,
    causal: bool = False,
    block_q: int = 512,
    interpret: bool = False,
) -> jax.Array:
    N, Tq, dh = q.shape
    Tk = k.shape[1]
    Bb = bias.shape[0]
    # bias rides as (Bb, 1, Tk): Mosaic requires the last two block dims to
    # equal the array dims (or be 8/128-divisible), which a (1, Tk) slice of
    # a (B, Tk) array is not
    bias3 = bias[:, None, :]
    if _whole_row() and Tq <= 2048:
        sb = _row_sub_block(Tq, Tk)
        row = pl.BlockSpec((1, Tq, dh), lambda n: (n, 0, 0))
        kv = pl.BlockSpec((1, Tk, dh), lambda n: (n, 0, 0))
        bias_ix1 = (
            (lambda n: (0, 0, 0)) if Bb == 1
            else (lambda n: (n // n_head, 0, 0))
        )
        return pl.pallas_call(
            _make_fwd_row_kernel(causal, sb, Tq // sb),
            out_shape=jax.ShapeDtypeStruct((N, Tq, dh), q.dtype),
            grid=(N,),
            in_specs=[row, kv, kv, pl.BlockSpec((1, 1, Tk), bias_ix1)],
            out_specs=row,
            interpret=interpret,
        )(q, k, v, bias3)
    bq = _dividing_block(block_q, Tq)
    grid = (N, Tq // bq)
    bias_ix = (
        (lambda n, i: (0, 0, 0)) if Bb == 1
        else (lambda n, i: (n // n_head, 0, 0))
    )
    return pl.pallas_call(
        _make_fwd_kernel(causal, bq),
        out_shape=jax.ShapeDtypeStruct((N, Tq, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, Tk, dh), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, Tk, dh), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, Tk), bias_ix),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda n, i: (n, i, 0)),
        interpret=interpret,
    )(q, k, v, bias3)


# ---------------------------------------------------------------------------
# backward: one pass producing dq, dk, dv
# ---------------------------------------------------------------------------


def _make_bwd_kernel(causal: bool, bq: int):
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
        k = k_ref[0]  # (Tk, dh)
        v = v_ref[0]
        do = do_ref[0]  # (BQ, dh)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = _mask_block(s + bias_ref[0], causal, bq)
        pn, pnb, l = _softmax_rows(s)
        if _defer_l():
            # see _defer_l: p stays unnormalized; 1/l rides on do and delta
            inv_l = 1.0 / l  # (BQ, 1)
            do = (do.astype(jnp.float32) * inv_l).astype(jnp.bfloat16)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, Tk) == dp'
            delta = jnp.sum(dp * pn, axis=-1, keepdims=True) * inv_l
        else:
            pn = pn / l
            pnb = pn.astype(jnp.bfloat16)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BQ, Tk)
            delta = jnp.sum(dp * pn, axis=-1, keepdims=True)  # (BQ, 1)
        ds = (pn * (dp - delta)).astype(jnp.bfloat16)  # (BQ, Tk)

        dq_ref[0] = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)  # (BQ, dh); caller rescales by sm_scale

        dk_acc[:] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, dh)
        dv_acc[:] += jax.lax.dot_general(
            pnb, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, dh)

        @pl.when(i == nq - 1)
        def _():
            dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    return _bwd_kernel


def _make_bwd_row_kernel(causal: bool, sb: int, ns: int):
    def _bwd_row_kernel(
        q_ref, k_ref, v_ref, do_ref, bias_ref,
        dq_ref, dk_ref, dv_ref,
        dk_acc, dv_acc,
    ):
        kk = k_ref[0]  # (Tk, dh)
        vv = v_ref[0]
        bb = bias_ref[0]
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        for a in range(ns):
            sl = slice(a * sb, (a + 1) * sb)
            qq = q_ref[0, sl]  # (sb, dh) pre-scaled
            do = do_ref[0, sl]
            s = jax.lax.dot_general(
                qq, kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bb
            if causal:
                rows = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + a * sb
                )
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(cols > rows, jnp.float32(NEG), s)
            pn, pnb, l = _softmax_rows(s)
            if _defer_l():
                inv_l = 1.0 / l
                do = (do.astype(jnp.float32) * inv_l).astype(jnp.bfloat16)
                dp = jax.lax.dot_general(
                    do, vv, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(dp * pn, axis=-1, keepdims=True) * inv_l
            else:
                pn = pn / l
                pnb = pn.astype(jnp.bfloat16)
                dp = jax.lax.dot_general(
                    do, vv, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(dp * pn, axis=-1, keepdims=True)
            ds = (pn * (dp - delta)).astype(jnp.bfloat16)
            dq_ref[0, sl] = jax.lax.dot_general(
                ds, kk, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dk_acc[:] += jax.lax.dot_general(
                ds, qq, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_acc[:] += jax.lax.dot_general(
                pnb, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    return _bwd_row_kernel


@functools.partial(
    jax.jit, static_argnames=("n_head", "causal", "block_q", "interpret")
)
def _attn_bwd(
    q: jax.Array,  # (N, Tq, dh) pre-scaled
    k: jax.Array,  # (N, Tk, dh)
    v: jax.Array,
    do: jax.Array,  # (N, Tq, dh)
    bias: jax.Array,  # (Bb, Tk)
    n_head: int,
    *,
    causal: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    N, Tq, dh = q.shape
    Tk = k.shape[1]
    Bb = bias.shape[0]
    out_shapes = (
        jax.ShapeDtypeStruct((N, Tq, dh), q.dtype),  # dq (pre-scale basis)
        jax.ShapeDtypeStruct((N, Tk, dh), k.dtype),  # dk
        jax.ShapeDtypeStruct((N, Tk, dh), v.dtype),  # dv
    )
    bias3 = bias[:, None, :]  # (Bb, 1, Tk) — see _attn_fwd
    if _whole_row() and Tq <= 2048:
        sb = _row_sub_block(Tq, Tk)
        row = pl.BlockSpec((1, Tq, dh), lambda n: (n, 0, 0))
        kv1 = pl.BlockSpec((1, Tk, dh), lambda n: (n, 0, 0))
        bias_ix1 = (
            (lambda n: (0, 0, 0)) if Bb == 1
            else (lambda n: (n // n_head, 0, 0))
        )
        return pl.pallas_call(
            _make_bwd_row_kernel(causal, sb, Tq // sb),
            out_shape=out_shapes,
            grid=(N,),
            in_specs=[row, kv1, kv1, row, pl.BlockSpec((1, 1, Tk), bias_ix1)],
            out_specs=(row, kv1, kv1),
            scratch_shapes=[
                pltpu.VMEM((Tk, dh), jnp.float32),  # dk accumulator
                pltpu.VMEM((Tk, dh), jnp.float32),  # dv accumulator
            ],
            interpret=interpret,
        )(q, k, v, do, bias3)
    bq = _dividing_block(block_q, Tq)
    grid = (N, Tq // bq)
    kv_spec = pl.BlockSpec((1, Tk, dh), lambda n, i: (n, 0, 0))
    qblk_spec = pl.BlockSpec((1, bq, dh), lambda n, i: (n, i, 0))
    bias_ix = (
        (lambda n, i: (0, 0, 0)) if Bb == 1
        else (lambda n, i: (n // n_head, 0, 0))
    )
    return pl.pallas_call(
        _make_bwd_kernel(causal, bq),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            qblk_spec,  # q
            kv_spec,    # k
            kv_spec,    # v
            qblk_spec,  # do
            pl.BlockSpec((1, 1, Tk), bias_ix),
        ],
        out_specs=(qblk_spec, kv_spec, kv_spec),
        scratch_shapes=[
            pltpu.VMEM((Tk, dh), jnp.float32),  # dk accumulator
            pltpu.VMEM((Tk, dh), jnp.float32),  # dv accumulator
        ],
        interpret=interpret,
    )(q, k, v, do, bias3)


# ---------------------------------------------------------------------------
# public entries: (B, T, D) -> (B, T, D), custom VJP, residuals = (q, k, v)
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


def _pad_t(x: jax.Array, t_pad: int) -> jax.Array:
    if x.shape[1] == t_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))


def _prep(q, k, v, n_head, key_bias, valid_len=None, d128=None):
    """Split heads, pad to 128-multiples, build the (Bb, Tk_pad) bias.

    ``valid_len``: true key count when the caller ships PRE-padded tensors
    (encoder runs its whole layer stack at 1536 so these per-layer pads are
    no-ops — the pad/unpad HBM copies were ~14% of leaf copy traffic in
    perf/r3_profile_train2.log); keys >= valid_len are bias-masked.
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // n_head
    # whole-row kernels take the native query length when it satisfies the
    # bf16 sublane rule (16-multiple): the decoder's Tq=448 runs unpadded
    # (-12.5% self/cross attention rows + no q/do/dq pad copies). Keys keep
    # the 128-multiple pad (scores' minor dim). The grid-blocked fallback
    # requires 128-divisible q blocks, so it keeps the full pad.
    if _whole_row() and Tq % 16 == 0 and Tq <= 2048:
        Tq_pad = Tq  # matches _attn_fwd/_attn_bwd's whole-row condition
    else:
        Tq_pad = _round128(Tq)
    Tk_pad = _round128(Tk)
    valid = Tk if valid_len is None else valid_len
    scale = dh ** -0.5  # 0.125 for dh=64: exact in bf16

    qh = _pad_t(_split(q, n_head) * jnp.asarray(scale, q.dtype), Tq_pad)
    kh = _pad_t(_split(k, n_head), Tk_pad)
    vh = _pad_t(_split(v, n_head), Tk_pad)
    if (_d128() if d128 is None else d128) and dh == 64:
        # full-MXU-depth mode (see _d128): pad the head dim to 128; callers
        # slice the kernel outputs back with _unpad_d
        pad_d = ((0, 0), (0, 0), (0, 64))
        qh = jnp.pad(qh, pad_d)
        kh = jnp.pad(kh, pad_d)
        vh = jnp.pad(vh, pad_d)
    pad_bias = jnp.where(jnp.arange(Tk_pad)[None, :] < valid, 0.0, NEG).astype(
        jnp.float32
    )  # (1, Tk_pad)
    if key_bias is not None:
        bias = (
            jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, Tk_pad - Tk)))
            + pad_bias
        )  # (B, Tk_pad); -inf in the loader's mask must not become NaN
        bias = jnp.maximum(bias, NEG)
    else:
        bias = pad_bias
    return qh, kh, vh, bias, (Tq_pad, Tk_pad, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 7))
def _train_attention(
    q: jax.Array,  # (B, Tq, D)
    k: jax.Array,  # (B, Tk, D)
    v: jax.Array,
    n_head: int,
    causal: bool = False,
    interpret: bool = False,
    key_bias: Optional[jax.Array] = None,  # (B, Tk) additive
    valid_len: Optional[int] = None,  # true key count of pre-padded inputs
) -> jax.Array:
    out, _ = _attn_fwd_res(
        q, k, v, n_head, causal, interpret, key_bias, valid_len
    )
    return out


def _attn_fwd_res(q, k, v, n_head, causal, interpret, key_bias=None,
                  valid_len=None):
    B, Tq, D = q.shape
    dh = D // n_head
    qh, kh, vh, bias, (Tq_pad, _, _) = _prep(q, k, v, n_head, key_bias,
                                             valid_len)
    o = _attn_fwd(qh, kh, vh, bias, n_head, causal=causal, interpret=interpret)
    return _merge(o[:, :Tq, :dh], n_head, B), (q, k, v, key_bias)


def _attn_bwd_res(n_head, causal, interpret, valid_len, res, g):
    q, k, v, key_bias = res
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // n_head
    qh, kh, vh, bias, (Tq_pad, _, scale) = _prep(q, k, v, n_head, key_bias,
                                                 valid_len, d128=_d128_bwd())
    doh = _pad_t(_split(g.astype(q.dtype), n_head), Tq_pad)
    if doh.shape[-1] != qh.shape[-1]:  # _d128 mode: pad do like q
        doh = jnp.pad(doh, ((0, 0), (0, 0), (0, qh.shape[-1] - dh)))
    dqh, dkh, dvh = _attn_bwd(
        qh, kh, vh, doh, bias, n_head, causal=causal, interpret=interpret
    )
    s = jnp.asarray(scale, q.dtype)
    dq = _merge(dqh[:, :Tq, :dh], n_head, B) * s  # d(q*scale)/dq
    dk = _merge(dkh[:, :Tk, :dh], n_head, B)
    dv = _merge(dvh[:, :Tk, :dh], n_head, B)
    dbias = None if key_bias is None else jnp.zeros_like(key_bias)
    return dq, dk, dv, dbias


_train_attention.defvjp(_attn_fwd_res, _attn_bwd_res)


def train_attention(
    q: jax.Array,  # (B, Tq, D)
    k: jax.Array,  # (B, Tk, D)
    v: jax.Array,
    n_head: int,
    causal: bool = False,
    interpret: bool = False,
    key_bias: Optional[jax.Array] = None,  # (B, Tk) additive
    valid_len: Optional[int] = None,
) -> jax.Array:
    """Fused training attention (see module docstring).

    Covers all three whisper training attentions: encoder self
    (non-causal), decoder self (causal + per-sample key bias), decoder
    cross (448 queries over 1500 keys, no mask).

    Under a registered multi-device mesh (ops/flash.py::set_flash_mesh,
    installed by the trainer) the kernel runs inside ``shard_map`` with the
    batch dim sharded over every mesh axis — attention is batch-parallel,
    so each device runs on its local shard with no collectives (same SPMD
    rule as flash_mha; Pallas kernels define no partitioning rule of their
    own, so without this XLA would all-gather the full batch onto every
    chip).
    """
    from olmoasr_tpu.ops.flash import get_flash_mesh

    mesh = get_flash_mesh()
    B = q.shape[0]
    if mesh is not None and mesh.size > 1 and B % mesh.size == 0:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)
        b = P(axes, None, None)
        if key_bias is None:
            def local3(qq, kk, vv):
                return _train_attention(
                    qq, kk, vv, n_head, causal, interpret, None, valid_len
                )

            return shard_map(
                local3, mesh=mesh, in_specs=(b, b, b), out_specs=b,
                check_rep=False,
            )(q, k, v)

        def local4(qq, kk, vv, kb):
            return _train_attention(
                qq, kk, vv, n_head, causal, interpret, kb, valid_len
            )

        return shard_map(
            local4, mesh=mesh, in_specs=(b, b, b, P(axes, None)),
            out_specs=b, check_rep=False,
        )(q, k, v, key_bias)
    return _train_attention(
        q, k, v, n_head, causal, interpret, key_bias, valid_len
    )


def enc_self_attention(
    q: jax.Array,  # (B, T, D)
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    interpret: bool = False,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """Non-causal self-attention (encoder 1500-position training shape).

    ``valid_len``: pass the true position count when the layer stack runs
    PRE-padded to a 128-multiple (encode_audio pads once after the conv
    stem instead of this kernel re-padding q/k/v every layer)."""
    return train_attention(q, k, v, n_head, False, interpret, None, valid_len)


def dec_self_attention(
    q, k, v, n_head: int, key_bias=None, interpret: bool = False
):
    """Causal decoder self-attention with the loader's per-key pad bias."""
    return train_attention(q, k, v, n_head, True, interpret, key_bias)


def cross_attention(q, k, v, n_head: int, interpret: bool = False,
                    valid_len: Optional[int] = None):
    """Decoder cross-attention: Tq text queries over Tk audio keys, no mask
    (reference model.py cross attention has no mask). ``valid_len``: true
    audio length when the features arrive pre-padded to a 128-multiple."""
    return train_attention(q, k, v, n_head, False, interpret, None, valid_len)
