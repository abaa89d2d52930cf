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
    dd = _dot_dtype(q_ref.dtype)

    q = q_ref[0, 0, :].astype(jnp.float32) * (scale * scale)  # fold both scales
    # block-structured Q expansion: Qm[d, h] = q[d] iff d // dh == h
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    qm = jnp.where(d_ids // dh == h_ids, q[:, None], 0.0)  # (D, H) fp32

    logits = _qk_logits(k_ref[0, :, :], qm, dd)  # (T, H)
    logits = logits * ks_ref[0, 0, :][:, None]  # per-key int8 scale

    w = jax.nn.softmax(logits, axis=0)  # (T, H), fp32
    w = w * vs_ref[0, 0, :][:, None]  # fold per-key v scale

    w_full = _expand_heads(w, n_head, dh, dd)  # (T, D)
    prod = w_full * v_ref[0, :, :].astype(dd)
    ones = jnp.ones((1, T), dd)
    o_ref[0, 0, :] = jnp.dot(
        ones, prod, preferred_element_type=jnp.float32
    )[0].astype(o_ref.dtype)


def _dot_dtype(q_dtype) -> jnp.dtype:
    """MXU dtype for the big attention dots: bf16 when the activations are
    bf16 (fp32 MXU passes run at 1/4 rate AND the (D, H=12) operand pads to
    128 lanes, so fp32 here cost ~4x for nothing — GPU whisper computes these
    dots in fp16 anyway), exact fp32 otherwise (CPU tests, fp32 decode)."""
    return jnp.bfloat16 if q_dtype == jnp.bfloat16 else jnp.float32


def _expand_heads(w, n_head: int, dh: int, dtype):
    """(T, H) per-head weights -> (T, H*dh) lane-expanded via the expansion
    matrix on the MXU. (A broadcast+reshape copy would be cheaper in theory,
    but Mosaic rejects both the bf16 minor-dim insert and the f32 (T,H,dh)->
    (T,D) shape cast — 'unsupported shape cast' — so the padded-K dot it is.)
    """
    T, H = w.shape
    D = H * dh
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    expand = jnp.where(h_ids == d_ids // dh, 1.0, 0.0).astype(dtype)  # (H, D)
    return jnp.dot(
        w.astype(dtype), expand, preferred_element_type=jnp.float32
    ).astype(dtype)


def _qk_logits(k_ref_slice, qm, dd):
    """Per-head q.K logits against a (T, D) key block.

    int8 keys take the native int8 MXU path (2x bf16 rate, and the (T, D)
    int8->bf16 convert disappears): quantize the block-structured qm per head
    (the only nonzeros in column h are head h's 64 lanes), accumulate in s32,
    rescale by the per-head q scale. The q quantization error (<1% relative,
    on top of the K cache's own int8 error) only applies on the bf16
    production path — fp32 callers keep the exact dequantized dot.
    Returns logits BEFORE the per-key k-scale multiply.
    """
    if k_ref_slice.dtype == jnp.int8 and dd == jnp.bfloat16:
        amax = jnp.max(jnp.abs(qm), axis=0, keepdims=True)  # (1, H)
        qscale = jnp.maximum(amax, 1e-20) / 127.0
        qm_s8 = jnp.clip(jnp.round(qm / qscale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            k_ref_slice, qm_s8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (T, H) s32
        return acc.astype(jnp.float32) * qscale
    k = k_ref_slice.astype(dd)
    return jnp.dot(k, qm.astype(dd), preferred_element_type=jnp.float32)


def _self_decode_body(
    s_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref, ks_ref, vs_ref, n_head,
    r=0,
):
    """Shared body; ks_ref/vs_ref are (1, rows, 1, C) per-position int8 scales
    or None for bf16 rings. ``r`` selects the batch row within a multi-row
    program (rows > 1 amortizes per-program dispatch/DMA-issue overhead)."""
    _, _, C, D = k_ref.shape
    dh = D // n_head
    scale = dh ** -0.25
    offset = s_ref[1]
    dd = _dot_dtype(q_ref.dtype)

    q = q_ref[r, 0, :].astype(jnp.float32) * (scale * scale)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    qm = jnp.where(d_ids // dh == h_ids, q[:, None], 0.0)  # (D, H)

    logits = _qk_logits(k_ref[0, r, :, :], qm, dd)  # (C, H)
    if ks_ref is not None:
        logits = logits * ks_ref[0, r, 0, :][:, None]  # per-position int8 scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0)
    logits = jnp.where(pos < offset, logits, -jnp.inf)
    # this step's own key (position == offset, always visible to its query)
    kn = kn_ref[r, 0, :].astype(jnp.float32)
    logit_new = jnp.sum(
        kn[:, None] * qm, axis=0, keepdims=True
    )  # (1, H)

    m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), logit_new)
    e_old = jnp.where(pos < offset, jnp.exp(logits - m), 0.0)
    e_new = jnp.exp(logit_new - m)  # (1, H)
    denom = jnp.sum(e_old, axis=0, keepdims=True) + e_new  # (1, H)
    w_old = e_old / denom  # (C, H)
    w_new = e_new / denom  # (1, H)

    if vs_ref is not None:
        w_old = w_old * vs_ref[0, r, 0, :][:, None]  # fold v scale
    # one transposed contraction out2[h, d] = sum_c w[c, h] * v[c, d], then
    # lane-select the head row (replaces expand-matmul + elementwise product
    # + ones-reduction; measured +12% end-to-end on the cross kernel)
    out2 = jax.lax.dot_general(
        w_old.astype(dd), v_ref[0, r, :, :].astype(dd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, D)
    hsel = (h_ids.T == d_ids.T // dh).astype(jnp.float32)  # (H, D)
    out = jnp.sum(out2 * hsel, axis=0)  # (D,)
    wn_full = _expand_heads(w_new, n_head, dh, jnp.float32)  # (1, D)
    out = out + wn_full[0] * vn_ref[r, 0, :].astype(jnp.float32)
    o_ref[r, 0, :] = out.astype(o_ref.dtype)


def _self_decode_body_ht(
    s_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref, ks_ref, vs_ref, n_head,
    r=0,
):
    """(H, C)-oriented variant of _self_decode_body: the q.K logits are
    produced directly as (H, C) via a transposed-RHS dot (K stays in its
    (C, D) ring layout — the same trans-B contraction the flash kernels use),
    so the mask/softmax/scale elementwise ops run on (H→16 sublanes,
    C→lanes) instead of (C sublanes, H=12→128 lanes): ~7x fewer padded
    elements, and the value contraction becomes a NORMAL (H,C)@(C,D) matmul.
    int8 rings dequantize to the dot dtype (the trans-B int8 MXU path is not
    exercised here; per-position scales fold into the (H, C) logits on
    lanes)."""
    _, _, C, D = k_ref.shape
    dh = D // n_head
    scale = dh ** -0.25
    offset = s_ref[1]
    dd = _dot_dtype(q_ref.dtype)

    q = q_ref[r, 0, :].astype(jnp.float32) * (scale * scale)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (n_head, D), 0)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (n_head, D), 1)
    qmT = jnp.where(d_ids // dh == h_ids, q[None, :], 0.0)  # (H, D) fp32

    # (H, D) x (C, D) contracting D on both -> (H, C); Mosaic lowers the
    # transposed-RHS dot natively (the flash-attention q.k^T pattern)
    logits = jax.lax.dot_general(
        qmT.astype(dd), k_ref[0, r, :, :].astype(dd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, C)
    if ks_ref is not None:
        logits = logits * ks_ref[0, r, 0, :][None, :]  # per-position scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_head, C), 1)
    logits = jnp.where(pos < offset, logits, -jnp.inf)
    # this step's own key (position == offset, always visible to its query)
    kn = kn_ref[r, 0, :].astype(jnp.float32)
    logit_new = jnp.sum(qmT * kn[None, :], axis=1, keepdims=True)  # (H, 1)

    m = jnp.maximum(jnp.max(logits, axis=1, keepdims=True), logit_new)
    e_old = jnp.where(pos < offset, jnp.exp(logits - m), 0.0)  # (H, C)
    e_new = jnp.exp(logit_new - m)  # (H, 1)
    denom = jnp.sum(e_old, axis=1, keepdims=True) + e_new
    w_old = e_old / denom  # (H, C)
    w_new = e_new / denom  # (H, 1)

    if vs_ref is not None:
        w_old = w_old * vs_ref[0, r, 0, :][None, :]
    out2 = jax.lax.dot_general(
        w_old.astype(dd), v_ref[0, r, :, :].astype(dd),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, D) — normal matmul, no transpose
    hsel = (h_ids == d_ids // dh).astype(jnp.float32)  # (H, D)
    out = jnp.sum(out2 * hsel, axis=0)  # (D,)
    # fold the new token's value: out[d] += w_new[d//dh] * vn[d]
    wn_d = jnp.sum(hsel * w_new, axis=0)  # (D,)
    out = out + wn_d * vn_ref[r, 0, :].astype(jnp.float32)
    o_ref[r, 0, :] = out.astype(o_ref.dtype)


def _anc_kv_select(anc_ref, k_ref, v_ref, r, K):
    """Beam-ancestry gather inside VMEM: row ``r``'s effective (C, D) ring is
    assembled by a K-way masked pick over its group's K ring rows,
    k_eff[t] = k[anc[r, t], t] (see _self_decode_kernel_beam)."""
    C = k_ref.shape[2]
    # (C, 1) int32 — reshape BEFORE comparing: Mosaic only supports
    # minor-dim insertion on 32-bit types, not on the i1 compare result
    anc_col = anc_ref[0, r, :].reshape(C, 1)
    k_eff = k_ref[0, 0, :, :]  # rows with anc==0 keep these values
    v_eff = v_ref[0, 0, :, :]
    for j in range(1, K):
        selj = anc_col == j
        k_eff = jnp.where(selj, k_ref[0, j, :, :], k_eff)
        v_eff = jnp.where(selj, v_ref[0, j, :, :], v_eff)
    return k_eff, v_eff


def _self_decode_kernel_beam(
    s_ref, anc_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref,
    *, n_head: int, K: int,
):
    """Beam-search self attention WITHOUT physically reordered rings.

    Beam search must give each surviving beam the kv history of its SOURCE
    beam. The torch reference (and r2 of this repo) physically permutes the
    cache rows every step ([pip:whisper] BeamSearchDecoder rearrange_kv_cache;
    at small.en B=32 K=5 the gather+relayout of the (12, 160, 226, 768)
    rings measured ~8.4ms/step — a third of the whole beam step). Here the
    rings stay where they were written and a per-(beam, position) ancestry
    map ``anc_ref`` (K, C) selects, inside VMEM, which of the group's K ring
    rows supplies each position: k_eff[t] = k[anc[r, t], t]. The HBM traffic
    is identical to the non-beam kernel (each group's rings stream once); the
    selection is a K-way masked pick on data already in VMEM.

    One program per window: ring block (1, K, C, D), query rows (K, 1, D).
    """
    _, Kb, C, D = k_ref.shape
    dh = D // n_head
    scale = dh ** -0.25
    offset = s_ref[1]
    dd = _dot_dtype(q_ref.dtype)

    for r in range(K):
        k_eff, v_eff = _anc_kv_select(anc_ref, k_ref, v_ref, r, K)

        q = q_ref[r, 0, :].astype(jnp.float32) * (scale * scale)
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
        qm = jnp.where(d_ids // dh == h_ids, q[:, None], 0.0)  # (D, H)

        logits = _qk_logits(k_eff, qm, dd)  # (C, H)
        pos = jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0)
        logits = jnp.where(pos < offset, logits, -jnp.inf)
        kn = kn_ref[r, 0, :].astype(jnp.float32)
        logit_new = jnp.sum(kn[:, None] * qm, axis=0, keepdims=True)  # (1, H)

        m = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), logit_new)
        e_old = jnp.where(pos < offset, jnp.exp(logits - m), 0.0)
        e_new = jnp.exp(logit_new - m)
        denom = jnp.sum(e_old, axis=0, keepdims=True) + e_new
        w_old = e_old / denom  # (C, H)
        w_new = e_new / denom  # (1, H)

        out2 = jax.lax.dot_general(
            w_old.astype(dd), v_eff.astype(dd),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, D)
        hsel = (h_ids.T == d_ids.T // dh).astype(jnp.float32)
        out = jnp.sum(out2 * hsel, axis=0)
        wn_full = _expand_heads(w_new, n_head, dh, jnp.float32)
        out = out + wn_full[0] * vn_ref[r, 0, :].astype(jnp.float32)
        o_ref[r, 0, :] = out.astype(o_ref.dtype)


def _self_decode_kernel(s_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref,
                        *, n_head: int, rows: int = 1, ht: bool = False):
    body = _self_decode_body_ht if ht else _self_decode_body
    for r in range(rows):
        body(
            s_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref, None, None,
            n_head, r=r,
        )


def _self_decode_kernel_q8(s_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                           ks_ref, vs_ref, o_ref, *, n_head: int,
                           rows: int = 1, ht: bool = False):
    body = _self_decode_body_ht if ht else _self_decode_body
    for r in range(rows):
        body(
            s_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, o_ref, ks_ref, vs_ref,
            n_head, r=r,
        )


def _ln_matmul_kernel(
    s_ref,  # (1,) int32: [layer_idx]
    x_ref,  # (B, D)
    g_ref,  # (1, 1, D)
    b_ref,  # (1, 1, D)
    w_ref,  # (1, D, N)
    wb_ref,  # (1, 1, N)
    o_ref,  # (B, N)
):
    x = x_ref[:, :].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[0, 0, :].astype(jnp.float32) + b_ref[0, 0, :].astype(jnp.float32)
    out = jnp.dot(
        h.astype(w_ref.dtype), w_ref[0, :, :], preferred_element_type=jnp.float32
    ) + wb_ref[0, 0, :].astype(jnp.float32)
    o_ref[:, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ln_matmul(
    x: jax.Array,  # (B, 1, D)
    ln_g: jax.Array,  # (L, D)
    ln_b: jax.Array,
    w: jax.Array,  # (L, D, N)
    b: jax.Array,  # (L, N)
    layer_idx: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused fp32 LayerNorm + batched matmul (one launch; same grid=(1,)
    batched pattern as mlp_block, which beat per-row fusion)."""
    B, S, D = x.shape
    assert S == 1
    L, _, N = w.shape
    scalars = jnp.stack([layer_idx.astype(jnp.int32)])
    full = lambda i, s: (0, 0)
    lay3 = lambda i, s: (s[0], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, N), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lay3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, N), full, memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _ln_matmul_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * N, bytes_accessed=D * N * 2, transcendentals=0
        ),
        interpret=interpret,
    )(scalars, x[:, 0, :], ln_g[:, None, :], ln_b[:, None, :], w, b[:, None, :])
    return out[:, None, :]


def _matmul_residual_kernel(
    s_ref,  # (1,) int32: [layer_idx]
    a_ref,  # (B, D) attention output
    x_ref,  # (B, D) residual stream
    w_ref,  # (1, D, D)
    wb_ref,  # (1, 1, D)
    o_ref,  # (B, D)
):
    out = jnp.dot(
        a_ref[:, :].astype(w_ref.dtype), w_ref[0, :, :],
        preferred_element_type=jnp.float32,
    ) + wb_ref[0, 0, :].astype(jnp.float32)
    o_ref[:, :] = (x_ref[:, :].astype(jnp.float32) + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_residual(
    attn: jax.Array,  # (B, 1, D)
    x: jax.Array,  # (B, 1, D)
    w: jax.Array,  # (L, D, D)
    b: jax.Array,  # (L, D)
    layer_idx: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused output projection + residual add (one launch)."""
    B, S, D = attn.shape
    assert S == 1
    scalars = jnp.stack([layer_idx.astype(jnp.int32)])
    full = lambda i, s: (0, 0)
    lay3 = lambda i, s: (s[0], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), full, memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _matmul_residual_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), attn.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * D, bytes_accessed=D * D * 2, transcendentals=0
        ),
        interpret=interpret,
    )(scalars, attn[:, 0, :], x[:, 0, :], w, b[:, None, :])
    return out[:, None, :]


def _self_block_attend(s_ref, qkv_r, k_slice, v_slice, *, n_head, dd):
    """One row's online-softmax attention against its (C, D) ring slice (bf16
    dots + transposed value contraction — the r1 version used f32 MXU passes
    and the expand-multiply reduction, and measured 734 vs 778 at B=32).
    ``qkv_r``: this row's fused projection output (3D,) f32."""
    C, D = k_slice.shape
    dh = D // n_head
    scale = dh ** -0.25
    offset = s_ref[1]

    q = qkv_r[:D] * (scale * scale)
    kn = qkv_r[D : 2 * D]
    vn = qkv_r[2 * D :]

    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    qm = jnp.where(d_ids // dh == h_ids, q[:, None], 0.0)  # (D, H)

    logits = _qk_logits(k_slice, qm, dd)  # (C, H)
    pos = jax.lax.broadcasted_iota(jnp.int32, (C, n_head), 0)
    logits = jnp.where(pos < offset, logits, -jnp.inf)
    logit_new = jnp.sum(kn[:, None] * qm, axis=0, keepdims=True)  # (1, H)

    mx = jnp.maximum(jnp.max(logits, axis=0, keepdims=True), logit_new)
    e_old = jnp.where(pos < offset, jnp.exp(logits - mx), 0.0)
    e_new = jnp.exp(logit_new - mx)
    denom = jnp.sum(e_old, axis=0, keepdims=True) + e_new
    w_old = e_old / denom  # (C, H)
    w_new = e_new / denom  # (1, H)

    # transposed contraction + head-row select (see _self_decode_body)
    out2 = jax.lax.dot_general(
        w_old.astype(dd), v_slice.astype(dd),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, D)
    hsel = (h_ids.T == d_ids.T // dh).astype(jnp.float32)  # (H, D)
    attn = jnp.sum(out2 * hsel, axis=0)  # (D,)
    wn_d = jnp.sum(hsel * w_new.T, axis=0)  # (D,): w_new[d//dh]
    return attn + wn_d * vn


@functools.partial(
    jax.jit, static_argnames=("n_head", "rows", "ht", "interpret", "beam_k")
)
def self_attend_decode(
    q: jax.Array,  # (B, 1, D)
    k_ring: jax.Array,  # (L, B, C, D) full stacked rings (positions < offset valid)
    v_ring: jax.Array,
    k_new: jax.Array,  # (B, 1, D)
    v_new: jax.Array,
    offset: jax.Array,  # scalar int32
    layer_idx: jax.Array,  # scalar int32
    k_scale: Optional[jax.Array] = None,  # (L, B, 1, C) f32 when rings are int8
    v_scale: Optional[jax.Array] = None,
    *,
    n_head: int,
    rows: int = 1,
    ht: bool = False,
    interpret: bool = False,
    beam_anc: Optional[jax.Array] = None,  # (B, C) int32 within-group rows
    beam_k: int = 1,
) -> jax.Array:
    """Single-query self attention against the read-only KV rings + this
    step's key/value.

    ``beam_anc``/``beam_k``: beam-search ancestry mode — query rows come in
    groups of ``beam_k`` beams per audio window, the rings are NOT physically
    reordered, and ``beam_anc[b, t]`` names the within-group ring row holding
    row b's kv for position t (see _self_decode_kernel_beam). Requires
    unquantized rings.

    ``rows`` processes that many batch rows per program (grid B/rows),
    amortizing per-program dispatch/DMA-issue overhead; must divide B.
    ``ht`` computes attention in the (H, C) orientation (trans-B q.K dot;
    see _self_decode_body_ht).

    Takes the FULL stacked (L, B, C, D) rings and block-indexes the layer via
    scalar prefetch — inside the decode layer-scan this avoids XLA
    materializing per-layer ring slices (measured ~2.4ms/step at B=32 small.en
    vs the ~0.3ms bandwidth floor): the ring bytes stream HBM->VMEM exactly
    once (int8 bytes when the rings are quantized). Numerically an
    online-softmax of models.whisper._attend_cached.
    """
    B, S, D = q.shape
    assert S == 1
    L, _, C, _ = k_ring.shape
    if rows <= 0 or B % rows != 0:
        rows = 1
    scalars = jnp.stack([layer_idx.astype(jnp.int32), offset.astype(jnp.int32)])

    row = lambda b, s: (b, 0, 0)
    ring = lambda b, s: (s[0], b, 0, 0)
    ring4 = lambda b, s: (s[0], b, 0, 0)
    quantized = k_scale is not None

    if beam_anc is not None:
        assert not quantized, "beam ancestry mode requires bf16 rings"
        assert B % beam_k == 0 and beam_anc.shape == (B, C)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // beam_k,),
            in_specs=[
                # (G, K, C) layout: the (1, K, C) block's trailing dims equal
                # the array dims, satisfying Mosaic's (8, 128) block rule for
                # the otherwise-indivisible K=beam width
                pl.BlockSpec((1, beam_k, C), lambda b, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((beam_k, 1, D), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((beam_k, 1, D), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((beam_k, 1, D), row, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, beam_k, C, D), ring, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, beam_k, C, D), ring, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((beam_k, 1, D), row,
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(
                _self_decode_kernel_beam, n_head=n_head, K=beam_k
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * C * D * 2,
                bytes_accessed=B * 2 * C * D * 2,
                transcendentals=B * C * n_head,
            ),
            interpret=interpret,
        )(
            scalars, beam_anc.reshape(B // beam_k, beam_k, C),
            q, k_new, v_new, k_ring, v_ring,
        )

    in_specs = [
        pl.BlockSpec((rows, 1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, D), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, C, D), ring, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, C, D), ring, memory_space=pltpu.VMEM),
    ]
    operands = [scalars, q, k_new, v_new, k_ring, v_ring]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, rows, 1, C), ring4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1, C), ring4, memory_space=pltpu.VMEM),
        ]
        operands += [k_scale, v_scale]
        kernel = functools.partial(
            _self_decode_kernel_q8, n_head=n_head, rows=rows, ht=ht
        )
    else:
        kernel = functools.partial(
            _self_decode_kernel, n_head=n_head, rows=rows, ht=ht
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, 1, D), row, memory_space=pltpu.VMEM),
    )
    kv_bytes = C * D * (1 if quantized else 2)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * D * 2,
            bytes_accessed=B * 2 * kv_bytes,
            transcendentals=B * C * n_head,
        ),
        interpret=interpret,
    )(*operands)
    return out


def _erf_poly(x: jax.Array) -> jax.Array:
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_kernel(
    s_ref,  # scalar prefetch (1,) int32: [layer_idx]
    x_ref,  # (B, D)
    g_ref,  # (1, 1, D) LN gain
    b_ref,  # (1, 1, D) LN bias
    w1_ref,  # (1, D, F)
    b1_ref,  # (1, 1, F)
    w2_ref,  # (1, F, D)
    b2_ref,  # (1, 1, D)
    o_ref,  # (B, D)
):
    x = x_ref[:, :].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[0, 0, :].astype(jnp.float32) + b_ref[0, 0, :].astype(jnp.float32)

    h = jnp.dot(
        h.astype(w1_ref.dtype), w1_ref[0, :, :], preferred_element_type=jnp.float32
    ) + b1_ref[0, 0, :].astype(jnp.float32)
    # exact gelu via erf. Mosaic implements neither erf nor erfc; use the
    # Abramowitz-Stegun 7.1.26 rational approximation (|error| <= 1.5e-7,
    # i.e. fp32 noise) built from exp, which Mosaic does support.
    h = 0.5 * h * (1.0 + _erf_poly(h * (2.0 ** -0.5)))
    out = jnp.dot(
        h.astype(w2_ref.dtype), w2_ref[0, :, :], preferred_element_type=jnp.float32
    ) + b2_ref[0, 0, :].astype(jnp.float32)
    o_ref[:, :] = (x + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mlp_block(
    x: jax.Array,  # (B, 1, D)
    ln_g: jax.Array,  # (L, D) stacked
    ln_b: jax.Array,
    w1: jax.Array,  # (L, D, F)
    b1: jax.Array,  # (L, F)
    w2: jax.Array,  # (L, F, D)
    b2: jax.Array,  # (L, D)
    layer_idx: jax.Array,  # scalar int32
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused decode-step MLP: fp32 LayerNorm + W1 + exact gelu + W2 + residual
    in ONE kernel, weights block-indexed from the stacked params by a
    scalar-prefetch layer index (one launch instead of ~5 per layer; the
    decode loop is launch-overhead-bound after the attention kernels)."""
    B, S, D = x.shape
    assert S == 1
    L, _, F = w1.shape
    scalars = jnp.stack([layer_idx.astype(jnp.int32)])

    B_, D_ = x.shape[0], D
    full = lambda i, s: (0, 0)
    lay3s = lambda i, s: (s[0], 0, 0)  # singleton-middle 2-D params
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B_, D_), full, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, 1, D), lay3s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, F), lay3s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lay3s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, D), lay3s, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3s, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_, D_), full, memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _mlp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * F * 2,
            bytes_accessed=2 * D * F * 2,
            transcendentals=B * F,
        ),
        interpret=interpret,
    )(
        scalars, x[:, 0, :], ln_g[:, None, :], ln_b[:, None, :], w1,
        b1[:, None, :], w2, b2[:, None, :],
    )
    return out[:, None, :]


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
    elif k_scale.ndim == 3:  # cache stores (B, 1, T); accept either
        k_scale = k_scale[:, 0]
    if v_scale is None:
        v_scale = jnp.ones((B, T), jnp.float32)
    elif v_scale.ndim == 3:
        v_scale = v_scale[:, 0]

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


def _qk_logits_kt(kt_slice, qmT, dd):
    """Per-head q.K logits against a TRANSPOSED (D, T) key block -> (H, T).

    The (H, T) orientation is the MXU-friendly one: T rides the 128-lane axis
    (fully used) and H=12 pads only to the 8-sublane granularity — vs the
    (T, H) form whose H operand pads to 128 lanes (>10x wasted MXU columns and
    VPU lanes). int8 keys take the native int8 MXU path with per-head q
    quantization, exactly like _qk_logits.
    """
    if kt_slice.dtype == jnp.int8 and dd == jnp.bfloat16:
        amax = jnp.max(jnp.abs(qmT), axis=1, keepdims=True)  # (H, 1)
        qscale = jnp.maximum(amax, 1e-20) / 127.0
        q8 = jnp.clip(jnp.round(qmT / qscale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q8, kt_slice,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (H, T) s32
        return acc.astype(jnp.float32) * qscale
    return jnp.dot(
        qmT.astype(dd), kt_slice.astype(dd), preferred_element_type=jnp.float32
    )


def _cross_block_kernel_kt(
    s_ref,  # scalar prefetch (1,) int32: [layer_idx]
    x_ref,  # (rows, 1, D) residual stream, this program's batch rows
    g_ref,  # (1, 1, D) cross LN gain
    b_ref,  # (1, 1, D) cross LN bias
    wq_ref,  # (1, D, D)
    bq_ref,  # (1, 1, D)
    wo_ref,  # (1, D, D)
    bo_ref,  # (1, 1, D)
    ks_ref,  # (1, rows, 1, T) f32 per-key k scales (ones when not quantized)
    vs_ref,  # (1, rows, 1, T)
    kt_ref,  # (1, rows, D, T) TRANSPOSED cross keys
    v_ref,  # (1, rows, T, D)
    o_ref,  # (rows, 1, D) new residual stream
    *,
    n_head: int,
    wv_mode: str = "dot",
    rows: int = 1,
):
    """Transposed-key cross sub-block: all attention intermediates live in the
    (H, T) orientation (T on lanes), so the q.K dot, the per-key scale
    multiplies, the softmax transcendentals, and the w.V contraction all run
    on ~H/128x fewer padded lanes than the (T, H) kernel. ``rows`` batch rows
    share one program (and one read of the layer's weights)."""
    for r in range(rows):
        _cross_block_body_kt(
            x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
            ks_ref, vs_ref, kt_ref, v_ref, o_ref, n_head=n_head,
            wv_mode=wv_mode, r=r,
        )


def _cross_kt_attend(q_r, ks_ref, vs_ref, kt_ref, v_ref, *, n_head, wv_mode, r, dd):
    """One row's cross attention against its TRANSPOSED (D, T) key block.
    ``q_r``: this row's q projection output (D,) f32, unscaled."""
    _, _, D, T = kt_ref.shape
    dh = D // n_head
    scale = dh ** -0.25
    q = q_r * (scale * scale)

    h_ids = jax.lax.broadcasted_iota(jnp.int32, (n_head, D), 0)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (n_head, D), 1)
    qmT = jnp.where(d_ids // dh == h_ids, q[None, :], 0.0)  # (H, D) fp32

    logits = _qk_logits_kt(kt_ref[0, r, :, :], qmT, dd)  # (H, T)
    logits = logits * ks_ref[0, r, 0, :][None, :]  # per-key int8 scale

    m = jnp.max(logits, axis=1, keepdims=True)  # (H, 1)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    w = e / denom  # (H, T) fp32
    w = w * vs_ref[0, r, 0, :][None, :]  # fold per-key v scale

    if wv_mode == "dot8" and v_ref.dtype == jnp.int8:
        umax = jnp.max(w, axis=1, keepdims=True)  # (H, 1); w >= 0
        uscale = jnp.maximum(umax, 1e-20) / 127.0
        u8 = jnp.clip(jnp.round(w / uscale), 0, 127).astype(jnp.int8)
        out2 = jax.lax.dot_general(
            u8, v_ref[0, r, :, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * uscale  # (H, D)
    else:
        out2 = jax.lax.dot_general(
            w.astype(dd), v_ref[0, r, :, :].astype(dd),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, D)
    hsel = (h_ids == d_ids // dh).astype(jnp.float32)  # (H, D)
    return jnp.sum(out2 * hsel, axis=0)  # (D,)


def _cross_block_body_kt(
    x_ref, g_ref, b_ref, wq_ref, bq_ref, wo_ref, bo_ref,
    ks_ref, vs_ref, kt_ref, v_ref, o_ref, *, n_head, wv_mode, r,
):
    dd = _dot_dtype(x_ref.dtype)

    x = x_ref[r, 0, :].astype(jnp.float32)
    mean = jnp.mean(x)
    var = jnp.mean((x - mean) ** 2)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[0, 0, :].astype(jnp.float32) + b_ref[0, 0, :].astype(jnp.float32)

    q = jnp.dot(
        h[None, :].astype(dd), wq_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    )[0] + bq_ref[0, 0, :].astype(jnp.float32)  # (D,)

    attn = _cross_kt_attend(
        q, ks_ref, vs_ref, kt_ref, v_ref,
        n_head=n_head, wv_mode=wv_mode, r=r, dd=dd,
    )[None, :]  # (1, D)

    out = jnp.dot(
        attn.astype(dd), wo_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    )[0] + bo_ref[0, 0, :].astype(jnp.float32)
    o_ref[r, 0, :] = (x + out).astype(o_ref.dtype)


def _cross_block_kernel(
    s_ref,  # scalar prefetch (1,) int32: [layer_idx]
    x_ref,  # (1, 1, D) residual stream, this batch row
    g_ref,  # (1, 1, D) cross LN gain
    b_ref,  # (1, 1, D) cross LN bias
    wq_ref,  # (1, D, D)
    bq_ref,  # (1, 1, D)
    wo_ref,  # (1, D, D)
    bo_ref,  # (1, 1, D)
    ks_ref,  # (1, 1, 1, T) f32 per-key k scales (ones when not quantized)
    vs_ref,  # (1, 1, 1, T)
    k_ref,  # (1, 1, T, D) int8 or bf16 cross keys, this batch row
    v_ref,  # (1, 1, T, D)
    o_ref,  # (1, 1, D) new residual stream
    *,
    n_head: int,
    wv_mode: str = "expand",
):
    _, _, T, D = k_ref.shape
    dh = D // n_head
    scale = dh ** -0.25
    dd = _dot_dtype(x_ref.dtype)

    # fp32 LayerNorm island (olmoasr/model.py LayerNorm casts to fp32)
    x = x_ref[0, 0, :].astype(jnp.float32)
    mean = jnp.mean(x)
    var = jnp.mean((x - mean) ** 2)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    h = h * g_ref[0, 0, :].astype(jnp.float32) + b_ref[0, 0, :].astype(jnp.float32)

    q = jnp.dot(
        h[None, :].astype(dd), wq_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    )[0] + bq_ref[0, 0, :].astype(jnp.float32)  # (D,)
    q = q * (scale * scale)  # fold both q,k scales (k scale folded into q)

    d_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (D, n_head), 1)
    qm = jnp.where(d_ids // dh == h_ids, q[:, None], 0.0)  # (D, H) fp32

    logits = _qk_logits(k_ref[0, 0, :, :], qm, dd)  # (T, H); int8 MXU path
    logits = logits * ks_ref[0, 0, 0, :][:, None]  # per-key int8 scale

    w = jax.nn.softmax(logits, axis=0)  # (T, H) fp32
    w = w * vs_ref[0, 0, 0, :][:, None]  # fold per-key v scale

    if wv_mode in ("dot", "dot8"):
        # one transposed contraction out2[h, d] = sum_t w[t, h] * v[t, d]
        # instead of expand-matmul + elementwise product + ones-reduction;
        # the per-head output row is then lane-selected by the head mask.
        # 'dot8' additionally quantizes the (non-negative) weights per head
        # and contracts int8 x int8 on the MXU (2x rate, no v dequant pass).
        if wv_mode == "dot8" and v_ref.dtype == jnp.int8:
            umax = jnp.max(w, axis=0, keepdims=True)  # (1, H); w >= 0
            uscale = jnp.maximum(umax, 1e-20) / 127.0
            u8 = jnp.clip(jnp.round(w / uscale), 0, 127).astype(jnp.int8)
            out2 = jax.lax.dot_general(
                u8, v_ref[0, 0, :, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * uscale.T  # (H, D)
        else:
            out2 = jax.lax.dot_general(
                w.astype(dd), v_ref[0, 0, :, :].astype(dd),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (H, D)
        hsel = (h_ids.T == d_ids.T // dh).astype(jnp.float32)  # (H, D)
        attn = jnp.sum(out2 * hsel, axis=0, keepdims=True)  # (1, D)
    else:
        w_full = _expand_heads(w, n_head, dh, dd)  # (T, D)
        prod = w_full * v_ref[0, 0, :, :].astype(dd)
        ones = jnp.ones((1, T), dd)
        attn = jnp.dot(ones, prod, preferred_element_type=jnp.float32)  # (1, D)

    out = jnp.dot(
        attn.astype(dd), wo_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    )[0] + bo_ref[0, 0, :].astype(jnp.float32)
    o_ref[0, 0, :] = (x + out).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_head", "interpret", "wv_mode",
        "k_transposed", "rows", "kv_group",
    ),
)
def cross_block_decode(
    x: jax.Array,  # (B, 1, D) residual stream (post self-attention)
    ln_g: jax.Array,  # (L, D) cross LN params, stacked over layers
    ln_b: jax.Array,
    wq: jax.Array,  # (L, D, D)
    bq: jax.Array,  # (L, D)
    wo: jax.Array,  # (L, D, D)
    bo: jax.Array,  # (L, D)
    ck: jax.Array,  # (L, B, T, D) cross keys — or (L, B, D, T) if k_transposed
    cv: jax.Array,
    ck_scale: jax.Array,  # (L, B, T) f32 (pass ones when K/V are bf16)
    cv_scale: jax.Array,
    layer_idx: jax.Array,  # scalar int32
    *,
    n_head: int,
    interpret: bool = False,
    wv_mode: str = "expand",
    k_transposed: bool = False,
    rows: int = 1,
    kv_group: int = 1,
) -> jax.Array:
    """Whole decode-step cross-attention sub-block in ONE kernel per layer:
    fp32 LN + q projection + int8 (or bf16) cross attention + output
    projection + residual.

    ``kv_group``: number of query rows sharing one cross K/V row (beam
    search / best_of — beams of a window attend over identical audio). The
    K/V and scale blocks are indexed ``b // kv_group``; consecutive grid
    steps hitting the same block index skip the HBM->VMEM copy, so the
    dominant cross-cache read drops by the group factor.

    THE decode bandwidth bottleneck is the cross K/V read (every layer, every
    step, reads (B, 1500, D) K and V). The XLA int8 path moves bf16-sized
    bytes (measured ~2.2ms/step at small.en B=32 — exactly the 1.77GB bf16
    footprint); this kernel streams the int8 bytes (884MB) into VMEM once and
    dequantizes in-core, with the q/out projections and LN fused in so the
    per-layer cross block is one launch instead of ~8 XLA ops.

    Takes the FULL stacked (L, B, T, D) tensors and block-indexes the layer
    via scalar prefetch (same pattern as self_attend_decode) so the cache
    stays out of the decode layer-scan's xs. Replaces the cross path of
    reference olmoasr/inf_model.py (MultiHeadAttention cross hooks).
    """
    B, S, D = x.shape
    assert S == 1
    # Scales ride as (L, B, 1, T): Mosaic requires the block's second-minor
    # dim to divide 8 or equal the array dim, so a (1, 1, T) block over
    # (L, B, T) is illegal. Callers on the hot path (init_cache) store them
    # 4-D so no per-step reshape/relayout happens (an earlier per-step
    # [:, :, None, :] cost ~0.8ms/step at B=128 in HBM copies).
    if ck_scale.ndim == 3:
        ck_scale = ck_scale[:, :, None, :]
    if cv_scale.ndim == 3:
        cv_scale = cv_scale[:, :, None, :]
    if rows <= 0 or B % rows != 0 or not k_transposed:
        rows = 1  # multi-row programs implemented for the kt kernel only
    if kv_group > 1:
        rows = 1  # shared-kv indexing assumes one query row per program
    assert B % kv_group == 0
    kvmap = lambda b, s: (s[0], b // kv_group, 0, 0)
    if k_transposed:
        L, _, _, T = ck.shape
        k_block = pl.BlockSpec(
            (1, rows, D, T), kvmap,
            memory_space=pltpu.VMEM,
        )
        kernel = functools.partial(
            _cross_block_kernel_kt, n_head=n_head, wv_mode=wv_mode, rows=rows
        )
    else:
        L, _, T, _ = ck.shape
        k_block = pl.BlockSpec(
            (1, 1, T, D), kvmap, memory_space=pltpu.VMEM
        )
        kernel = functools.partial(
            _cross_block_kernel, n_head=n_head, wv_mode=wv_mode,
        )
    scalars = jnp.stack([layer_idx.astype(jnp.int32)])

    row3 = lambda b, s: (b, 0, 0)
    lay3 = lambda b, s: (s[0], 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, 1, D), row3, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, 1, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lay3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1, T), kvmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1, T), kvmap, memory_space=pltpu.VMEM),
            k_block,
            pl.BlockSpec((1, rows, T, D), kvmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 1, D), row3, memory_space=pltpu.VMEM),
    )
    kv_bytes = T * D * (1 if ck.dtype == jnp.int8 else 2) // kv_group
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (T * D * 2 + 2 * D * D),
            bytes_accessed=B * 2 * kv_bytes + 2 * D * D * 2,
            transcendentals=B * T * n_head,
        ),
        interpret=interpret,
    )(
        scalars, x, ln_g[:, None, :], ln_b[:, None, :], wq, bq[:, None, :],
        wo, bo[:, None, :], ck_scale, cv_scale,
        ck, cv,
    )
    return out


# ---------------------------------------------------------------------------
# fused decoder-layer decode kernel: self + cross + MLP in one launch
# ---------------------------------------------------------------------------


def _ln_rows(x, g_ref, b_ref):
    """fp32 LayerNorm of a (rows, D) block against (1, 1, D) param refs."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    h = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return h * g_ref[0, 0, :].astype(jnp.float32) + b_ref[0, 0, :].astype(
        jnp.float32
    )


def _layer_block_impl(
    s_ref,  # scalar prefetch (2,) int32: [layer_idx, offset]
    x_ref,  # (rows, 1, D) residual stream
    g1_ref, b1_ref, wqkv_ref, bqkv_ref, wo1_ref, bo1_ref,  # self sub-block
    g2_ref, b2_ref, wq_ref, bq_ref, wo2_ref, bo2_ref,  # cross sub-block
    g3_ref, b3_ref, w1_ref, b1m_ref, w2_ref, b2m_ref,  # MLP (None in sc mode)
    k_ref, v_ref,  # (1, rows, C, D) self ring blocks (bf16)
    ks_ref, vs_ref,  # (1, rows|1, 1, T) cross per-key scales
    kt_ref, cv_ref,  # (1, rows|1, D, T) transposed keys / (1, rows|1, T, D)
    o_ref, kn_ref, vn_ref,  # outputs
    *,
    n_head: int,
    rows: int,
    wv_mode: str,
):
    """Whole decoder layer for one decode step in ONE kernel: self-attention
    sub-block (LN + fused QKV + ring attention + o-proj + residual), cross
    sub-block (LN + q-proj + int8 kt attention + o-proj + residual), and MLP
    (LN + W1 + exact gelu + W2 + residual). Weight blocks are grid-constant
    (fetched once across the B/rows grid steps); the per-row ring and cross
    K/V blocks stream — the self/MLP compute hides under the cross K/V DMA,
    which is the decode step's bandwidth floor (docs/KERNELS.md).

    Beam/best_of (shared cross groups, ancestry rings) deliberately NOT
    supported: the beam-mode variant's resident set (group rings + sc
    weights + shared cross) measured 18.09M scoped VMEM at batch 32 x
    beam 5 — over the ~16M budget on v5e (perf/r3_beamlb_repro.log) —
    so beams run the split kernels (self_attend_decode's ancestry mode +
    cross_block_decode's kv_group sharing), which fit and are benched."""
    D = x_ref.shape[-1]
    dd = _dot_dtype(x_ref.dtype)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, D), 0)

    # ---- self sub-block ----
    x = x_ref[:, 0, :].astype(jnp.float32)  # (rows, D)
    h = _ln_rows(x, g1_ref, b1_ref)
    qkv = jnp.dot(
        h.astype(dd), wqkv_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0, 0, :].astype(jnp.float32)  # (rows, 3D)
    kn_ref[:, 0, :] = qkv[:, D : 2 * D].astype(kn_ref.dtype)
    vn_ref[:, 0, :] = qkv[:, 2 * D :].astype(vn_ref.dtype)
    attn = jnp.zeros((rows, D), jnp.float32)
    for r in range(rows):
        k_sl, v_sl = k_ref[0, r, :, :], v_ref[0, r, :, :]
        a = _self_block_attend(
            s_ref, qkv[r], k_sl, v_sl, n_head=n_head, dd=dd
        )
        attn = jnp.where(row_ids == r, a[None, :], attn)
    x = x + jnp.dot(
        attn.astype(dd), wo1_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    ) + bo1_ref[0, 0, :].astype(jnp.float32)

    # ---- cross sub-block ----
    h = _ln_rows(x, g2_ref, b2_ref)
    q = jnp.dot(
        h.astype(dd), wq_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    ) + bq_ref[0, 0, :].astype(jnp.float32)  # (rows, D)
    cattn = jnp.zeros((rows, D), jnp.float32)
    for r in range(rows):
        a = _cross_kt_attend(
            q[r], ks_ref, vs_ref, kt_ref, cv_ref,
            n_head=n_head, wv_mode=wv_mode, r=r, dd=dd,
        )
        cattn = jnp.where(row_ids == r, a[None, :], cattn)
    x = x + jnp.dot(
        cattn.astype(dd), wo2_ref[0, :, :].astype(dd),
        preferred_element_type=jnp.float32,
    ) + bo2_ref[0, 0, :].astype(jnp.float32)

    # ---- MLP sub-block (skipped in sc mode: the full-layer weight blocks
    # are ~16.5MB bf16 for small.en, over the ~16MB VMEM core budget; sc
    # fuses self+cross (~7MB weights) and leaves MLP to mlp_block) ----
    if w1_ref is not None:
        h = _ln_rows(x, g3_ref, b3_ref)
        h = jnp.dot(
            h.astype(dd), w1_ref[0, :, :].astype(dd),
            preferred_element_type=jnp.float32,
        ) + b1m_ref[0, 0, :].astype(jnp.float32)
        h = 0.5 * h * (1.0 + _erf_poly(h * (2.0 ** -0.5)))
        x = x + jnp.dot(
            h.astype(dd), w2_ref[0, :, :].astype(dd),
            preferred_element_type=jnp.float32,
        ) + b2m_ref[0, 0, :].astype(jnp.float32)
    o_ref[:, 0, :] = x.astype(o_ref.dtype)


def _unpack_layer_refs(refs, include_mlp):
    if include_mlp:
        return refs
    head, tail = refs[:13], refs[13:]
    return head + (None,) * 6 + tail


def _layer_block_kernel(
    s_ref, *refs, n_head, rows, wv_mode, include_mlp
):
    _layer_block_impl(
        s_ref, *_unpack_layer_refs(refs, include_mlp),
        n_head=n_head, rows=rows, wv_mode=wv_mode,
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "rows", "wv_mode", "include_mlp", "interpret"),
)
def layer_block_decode(
    x: jax.Array,  # (B, 1, D) residual stream
    attn_ln_g: jax.Array,  # (L, D) — all params stacked over layers
    attn_ln_b: jax.Array,
    wqkv: jax.Array,  # (L, D, 3D)
    bqkv: jax.Array,  # (L, 3D)
    attn_o_w: jax.Array,  # (L, D, D)
    attn_o_b: jax.Array,  # (L, D)
    cross_ln_g: jax.Array,
    cross_ln_b: jax.Array,
    cross_q_w: jax.Array,  # (L, D, D)
    cross_q_b: jax.Array,
    cross_o_w: jax.Array,
    cross_o_b: jax.Array,
    mlp_ln_g: jax.Array,
    mlp_ln_b: jax.Array,
    mlp_w1: jax.Array,  # (L, D, F)
    mlp_b1: jax.Array,
    mlp_w2: jax.Array,  # (L, F, D)
    mlp_b2: jax.Array,
    self_k: jax.Array,  # (L, B, C, D) bf16 rings
    self_v: jax.Array,
    ck: jax.Array,  # (L, B, D, T) TRANSPOSED cross keys (int8 or bf16)
    cv: jax.Array,  # (L, B, T, D)
    ck_scale: jax.Array,  # (L, B, 1, T) f32 (ones when bf16)
    cv_scale: jax.Array,
    offset: jax.Array,  # scalar int32
    layer_idx: jax.Array,  # scalar int32
    *,
    n_head: int,
    rows: int = 1,
    wv_mode: str = "dot",
    include_mlp: bool = True,
    interpret: bool = False,
):
    """ONE launch per decoder layer per decode step (self + cross + MLP;
    opt-in via OLMOASR_LAYER_BLOCK). Collapses the 5-launch layer (ln_matmul,
    self_attend_decode, matmul_residual, cross_block_decode, mlp_block) into
    a single program so per-launch scheduling gaps vanish and the self/MLP
    compute overlaps the dominant cross K/V stream. Returns
    (new_x, k_new, v_new); ring writes stay outside (one DUS per step).

    ``include_mlp=False`` = "sc" mode: fuse self+cross only (5 launches ->
    2) — the full-layer weight set (~16.5MB bf16 at D=768/F=3072) exceeds
    the ~16MB VMEM core budget, self+cross (~7MB) fits; the caller runs
    mlp_block after. Restrictions: S == 1, bf16 self rings, transposed
    cross keys, normal V layout, no beam groups (see _layer_block_impl —
    beams stay on the split kernels)."""
    B, S, D = x.shape
    assert S == 1
    L = self_k.shape[0]
    T = cv.shape[2]
    C = self_k.shape[2]
    F = mlp_w1.shape[2]
    if ck_scale.ndim == 3:
        ck_scale = ck_scale[:, :, None, :]
    if cv_scale.ndim == 3:
        cv_scale = cv_scale[:, :, None, :]
    if rows <= 0 or B % rows != 0:
        rows = 1
    scalars = jnp.stack([layer_idx.astype(jnp.int32), offset.astype(jnp.int32)])

    row3 = lambda b, s: (b, 0, 0)
    lay3 = lambda b, s: (s[0], 0, 0)
    ring = lambda b, s: (s[0], b, 0, 0)
    lp = lambda shape: pl.BlockSpec(shape, lay3, memory_space=pltpu.VMEM)
    cr = rows
    mlp_specs = [
        lp((1, 1, D)), lp((1, 1, D)), lp((1, D, F)), lp((1, 1, F)),
        lp((1, F, D)), lp((1, 1, D)),
    ] if include_mlp else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, 1, D), row3, memory_space=pltpu.VMEM),  # x
            lp((1, 1, D)), lp((1, 1, D)), lp((1, D, 3 * D)), lp((1, 1, 3 * D)),
            lp((1, D, D)), lp((1, 1, D)),  # self
            lp((1, 1, D)), lp((1, 1, D)), lp((1, D, D)), lp((1, 1, D)),
            lp((1, D, D)), lp((1, 1, D)),  # cross
        ] + mlp_specs + [
            pl.BlockSpec((1, rows, C, D), ring, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, C, D), ring, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cr, 1, T), ring, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cr, 1, T), ring, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cr, D, T), ring, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cr, T, D), ring, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, 1, D), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, D), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, D), row3, memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(
        _layer_block_kernel, n_head=n_head, rows=rows, wv_mode=wv_mode,
        include_mlp=include_mlp,
    )
    kv_bytes = T * D * (1 if ck.dtype == jnp.int8 else 2)
    new_x, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, D), x.dtype),
            jax.ShapeDtypeStruct((B, 1, D), x.dtype),
            jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * (
                4 * D + 2 * C + 2 * D + 2 * T + (2 * F if include_mlp else 0)
            ),
            bytes_accessed=B * (2 * kv_bytes + 2 * C * D * 2)
            + (4 * D * D + 3 * D * D + (2 * D * F if include_mlp else 0)) * 2,
            transcendentals=B * (C + T) * n_head
            + (B * F if include_mlp else 0),
        ),
        interpret=interpret,
    )(
        scalars, x,
        attn_ln_g[:, None, :], attn_ln_b[:, None, :], wqkv, bqkv[:, None, :],
        attn_o_w, attn_o_b[:, None, :],
        cross_ln_g[:, None, :], cross_ln_b[:, None, :], cross_q_w,
        cross_q_b[:, None, :], cross_o_w, cross_o_b[:, None, :],
        *(
            (
                mlp_ln_g[:, None, :], mlp_ln_b[:, None, :], mlp_w1,
                mlp_b1[:, None, :], mlp_w2, mlp_b2[:, None, :],
            )
            if include_mlp else ()
        ),
        self_k, self_v, ck_scale, cv_scale, ck, cv,
    )
    return new_x, k_new, v_new
