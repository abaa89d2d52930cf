"""Flash attention for full-sequence (encoder / training) paths.

Wraps the Pallas TPU flash-attention kernel (jax.experimental.pallas.ops.tpu)
with whisper's conventions: d_head**-0.5 total scaling, non-causal encoder
self-attention over 1500 positions (padded to a 128-multiple with segment-id
masking so padding never attends/attracts), optional causal mode for decoder
training, and cross-attention (448 text queries over 1500 audio keys).
Replaces the O(T^2) materialized-logits attention the reference gets from
torch SDPA (olmoasr/model.py:330-340): per encoder layer the XLA path writes
and re-reads a (B, H, 1500, 1500) f32 score tensor (~1.2GB at B=8 medium.en)
— flash streams it in VMEM tiles instead, in forward AND backward (the kernel
carries a custom VJP).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# Ambient mesh for SPMD execution (set by the trainer). The Pallas flash
# kernel defines no SPMD partitioning rule, so under a >1-device mesh XLA
# would conservatively replicate its operands (all-gather the full batch onto
# every chip). With a mesh registered here, ``flash_mha`` wraps the kernel in
# ``shard_map`` over the batch axis instead: each device runs the kernel on
# its local batch shard — attention is batch-parallel, so no collectives are
# needed. Replaces the r2 stopgap of disabling flash on multi-chip meshes.
_FLASH_MESH = None


def set_flash_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh flash_mha shards over."""
    global _FLASH_MESH
    _FLASH_MESH = mesh


def get_flash_mesh():
    """The registered mesh, or None if unset / its devices are stale.

    Shared by every training-attention kernel (this module and
    ops/train_attention.py): a mesh whose devices are no longer live
    (backend reinit, tests switching platforms) must not be captured
    into a new trace.
    """
    mesh = _FLASH_MESH
    if mesh is None:
        return None
    try:
        first = next(iter(mesh.devices.flat))
        live = set(jax.devices(first.platform))
    except (RuntimeError, StopIteration):
        live = set()
    return mesh if set(mesh.devices.flat) <= live else None


def _pad_to(x: jax.Array, target: int, axis: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round128(t: int) -> int:
    return ((t + 127) // 128) * 128


def flash_mha(
    q: jax.Array,  # (B, Tq, D)
    k: jax.Array,  # (B, Tk, D)
    v: jax.Array,  # (B, Tk, D)
    n_head: int,
    *,
    causal: bool = False,
    q_ids: Optional[jax.Array] = None,  # (B, Tq) int32 segment ids
    kv_ids: Optional[jax.Array] = None,  # (B, Tk)
    block: Optional[int] = None,
) -> jax.Array:
    """Multi-head attention via the Pallas TPU flash kernel, differentiable.

    Handles non-128-multiple sequence lengths (whisper: Tq=448 text, Tk=1500
    audio) by zero-padding to 128 multiples; the pad region gets a reserved
    segment id so no valid query ever attends a padded key. Per-sample
    masking (token padding) is expressed through ``q_ids``/``kv_ids``:
    attention flows only where ids match (the reference's additive -inf
    padding-column mask, model.py:684-686, is the ids∈{0,1} special case).

    Under a registered multi-device mesh (``set_flash_mesh``) the kernel runs
    inside ``shard_map`` with the batch dim sharded over every mesh axis —
    the SPMD form of the NCCL-free DDP/FSDP batch split (attention itself
    needs no collectives).
    """
    mesh = get_flash_mesh()
    B = q.shape[0]
    if mesh is not None and mesh.size > 1 and B % mesh.size == 0:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)
        b = P(axes, None, None)
        ids = P(axes, None)
        args = [q, k, v]
        specs = [b, b, b]
        for a in (q_ids, kv_ids):
            if a is not None:
                args.append(a)
                specs.append(ids)
        n_ids = len(args) - 3

        def local(*xs):
            qq, kk, vv = xs[:3]
            rest = list(xs[3:])
            qi = rest.pop(0) if q_ids is not None else None
            ki = rest.pop(0) if kv_ids is not None else None
            return _flash_mha_local(
                qq, kk, vv, n_head, causal=causal, q_ids=qi, kv_ids=ki,
                block=block,
            )

        del n_ids
        return shard_map(
            local, mesh=mesh, in_specs=tuple(specs), out_specs=b,
            check_rep=False,
        )(*args)
    return _flash_mha_local(
        q, k, v, n_head, causal=causal, q_ids=q_ids, kv_ids=kv_ids, block=block
    )


def _flash_mha_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    *,
    causal: bool = False,
    q_ids: Optional[jax.Array] = None,
    kv_ids: Optional[jax.Array] = None,
    block: Optional[int] = None,
) -> jax.Array:
    """Single-device flash attention (the pre-shard_map body of flash_mha)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // n_head
    Tq_pad, Tk_pad = _round128(Tq), _round128(Tk)

    def heads(x, t_pad):
        x = _pad_to(x, t_pad, axis=1)
        return x.reshape(B, t_pad, n_head, dh).transpose(0, 2, 1, 3)  # (B,H,T,dh)

    qh, kh, vh = heads(q, Tq_pad), heads(k, Tk_pad), heads(v, Tk_pad)

    need_seg = (
        q_ids is not None or kv_ids is not None or Tq_pad != Tq or Tk_pad != Tk
    )
    seg = None
    if need_seg:
        PAD_ID = jnp.int32(2**30)  # reserved: pad keys match no valid query
        if q_ids is None:
            q_ids = jnp.zeros((B, Tq), jnp.int32)
        if kv_ids is None:
            kv_ids = jnp.zeros((B, Tk), jnp.int32)
        # pad queries get PAD_ID too: with causal self-attention a pad row
        # still matches the pad keys at/before it (never fully masked -> no
        # NaN); its output is sliced off below either way
        q_full = jnp.full((B, Tq_pad), PAD_ID, jnp.int32).at[:, :Tq].set(q_ids)
        kv_full = jnp.full((B, Tk_pad), PAD_ID, jnp.int32).at[:, :Tk].set(kv_ids)
        seg = SegmentIds(q=q_full, kv=kv_full)

    # Forward blocks: 512 measured best for the encoder shape at inference
    # batches; backward defaults to 128 (OLMOASR_FLASH_BWD_BLOCK to retune).
    # Backward blocks are always set so the same call is differentiable —
    # the bwd kernels only materialize under jax.grad.
    # OLMOASR_FLASH_FWD_BLOCK: a k-block spanning the whole padded row
    # (1536 for the encoder) turns the online softmax into a one-pass
    # softmax — no running max/denominator rescale corrections
    fwd = int(os.environ.get("OLMOASR_FLASH_FWD_BLOCK", "0")) or (block or 512)
    blk_q = min(block or 512, Tq_pad)
    blk_k = min(fwd, Tk_pad)
    # batch rows per fwd program: the (B, H, Tq/blk) grid runs sequentially on
    # the TensorCore, so at d_head=64 each program's matmuls are small and
    # per-program overhead dominates — batching rows amortizes it
    blk_b = min(int(os.environ.get("OLMOASR_FLASH_BLOCK_B", "1")), B)
    # bwd blocks measured on v5e (medium.en B=8 fwd+bwd, perf/r2_train_flash3.log):
    # 128 -> 1081ms, 512 -> 710ms (XLA attention: 756ms) — default 512
    bwd = int(os.environ.get("OLMOASR_FLASH_BWD_BLOCK", "512"))
    bwd_q, bwd_k = min(bwd, Tq_pad), min(bwd, Tk_pad)
    out = flash_attention(
        qh, kh, vh,
        segment_ids=seg,
        causal=causal,
        sm_scale=dh ** -0.5,
        block_sizes=BlockSizes(
            block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=blk_b,
            block_q_major_dkv=bwd_q, block_k_major_dkv=bwd_k,
            block_k_dkv=bwd_k, block_q_dkv=bwd_q,
            block_k_major_dq=bwd_k, block_k_dq=bwd_k, block_q_dq=bwd_q,
        ),
    )  # (B, H, Tq_pad, dh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Tq_pad, D)
    return out[:, :Tq, :]


def flash_self_attention(
    q: jax.Array,  # (B, T, D)
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    *,
    causal: bool = False,
    block: Optional[int] = None,
) -> jax.Array:
    """Self attention via the flash kernel (encoder hot path).

    NOTE: measured SLOWER than XLA's fused attention on v5e for the whisper
    encoder shape at B=32 inference (kept batch-gated there), but it is the
    training default — see perf/r2_train_flash.log.
    """
    return flash_mha(q, k, v, n_head, causal=causal, block=block)
