"""Pallas TPU kernels for the decode hot path.

``cross_attend_decode``: single-query (S=1) cross-attention against the int8
(or bf16) K/V cache — THE bandwidth bottleneck of batched transcription: every
decode step reads all L x (B, 1500, D) cross K/V. The XLA path materializes a
dequantized bf16 copy of K/V through HBM (measured: int8 at B=128 ran *slower*
than bf16); this kernel streams the int8 bytes into VMEM once and does
dequant + softmax + weighted-sum in-core:

  HBM traffic per (layer, batch-row): |K| + |V| bytes int8 — speed of light.

Head handling without per-head loops: for one query vector q (D,) with H
heads of size dh, the per-head logits are one MXU matmul

    logits(T, H) = K(T, D) @ Qm(D, H),   Qm[d, h] = q[d] * [d // dh == h]

i.e. a block-structured Q expansion built with a broadcasted iota mask. The
weighted sum is the VPU reduction out[d] = sum_t w[t, d // dh] * V[t, d].

Whisper numerics are preserved: q and k each scaled by dh**-0.25, softmax in
fp32 (olmoasr/model.py:330-340, 423-433).

TPU tiling note: small per-row operands (q, scales, out) are passed as full
arrays and indexed by program_id — (1, D) blocks would violate the
(8, 128)-divisibility rule for VMEM blocks.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cross_decode_kernel(
    q_ref,  # (1, 1, D) blocked per batch row
    ks_ref,  # (1, 1, T) fp32 (ones when not quantized)
    vs_ref,  # (1, 1, T)
    k_ref,  # (1, T, D) int8 or bf16, blocked per batch row
    v_ref,  # (1, T, D)
    o_ref,  # (1, 1, D)
    *,
    n_head: int,
):
    _, T, D = k_ref.shape
    dh = D // n_head
    scale = dh ** -0.25

    q = q_ref[0, 0, :].astype(jnp.float32) * (scale * scale)  # fold both scales
    # block-structured Q expansion: Qm[d, h] = q[d] iff d // dh == h
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    qm = jnp.where(d_ids // dh == h_ids, q[:, None], 0.0)  # (D, H) fp32

    k = k_ref[0, :, :].astype(jnp.float32)  # int8 -> fp32 inside VMEM
    logits = jnp.dot(k, qm, preferred_element_type=jnp.float32)  # (T, H)
    logits = logits * ks_ref[0, 0, :][:, None]  # per-key int8 scale

    w = jax.nn.softmax(logits, axis=0)  # (T, H), fp32
    w = w * vs_ref[0, 0, :][:, None]  # fold per-key v scale

    # expand per-head weights back to D lanes via the transpose expansion
    # matrix (H, D), then reduce over T (gather is unsupported in Mosaic)
    expand = jnp.where(h_ids.T == d_ids.T // dh, 1.0, 0.0)  # (H, D)
    w_full = jnp.dot(w, expand, preferred_element_type=jnp.float32)  # (T, D)
    v = v_ref[0, :, :].astype(jnp.float32)
    o_ref[0, 0, :] = jnp.sum(w_full * v, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def cross_attend_decode(
    q: jax.Array,  # (B, 1, D)
    k: jax.Array,  # (B, T, D) int8/bf16
    v: jax.Array,  # (B, T, D)
    k_scale: Optional[jax.Array] = None,  # (B, T) fp32
    v_scale: Optional[jax.Array] = None,
    *,
    n_head: int,
    interpret: bool = False,
) -> jax.Array:
    """Single-query cross attention, one pallas program per batch row."""
    B, S, D = q.shape
    assert S == 1, "decode kernel handles one query per row"
    T = k.shape[1]
    if k_scale is None:
        k_scale = jnp.ones((B, T), jnp.float32)
    if v_scale is None:
        v_scale = jnp.ones((B, T), jnp.float32)

    kv_bytes = T * D * (1 if k.dtype == jnp.int8 else 2)
    row = lambda b: (b, 0, 0)
    out = pl.pallas_call(
        functools.partial(_cross_decode_kernel, n_head=n_head),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, D), row, memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, 1, T), row, memory_space=pltpu.VMEM),  # k_scale
            pl.BlockSpec((1, 1, T), row, memory_space=pltpu.VMEM),  # v_scale
            pl.BlockSpec((1, T, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * D * 2,
            bytes_accessed=B * 2 * kv_bytes,
            transcendentals=B * T * n_head,
        ),
        interpret=interpret,
    )(q, k_scale[:, None, :], v_scale[:, None, :], k, v)
    return out
