"""Flash attention for full-sequence (encoder / training) paths.

Wraps the Pallas TPU flash-attention kernel (jax.experimental.pallas.ops.tpu)
with whisper's conventions: d_head**-0.5 total scaling, non-causal encoder
self-attention over 1500 positions (padded to a 128-multiple with segment-id
masking so padding never attends/attracts), optional causal mode for decoder
training. Replaces the O(T^2) materialized-logits attention the reference gets
from torch SDPA (olmoasr/model.py:330-340) on the encoder's hot path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _pad_to(x: jax.Array, target: int, axis: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_self_attention(
    q: jax.Array,  # (B, T, D)
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    *,
    causal: bool = False,
) -> jax.Array:
    """Multi-head self attention via the Pallas flash kernel.

    Handles non-128-multiple T (whisper encoder T=1500) by zero-padding and
    masking the pad region with segment ids.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, T, D = q.shape
    dh = D // n_head
    T_pad = ((T + 127) // 128) * 128

    def heads(x):
        x = _pad_to(x, T_pad, axis=1)
        return x.reshape(B, T_pad, n_head, dh).transpose(0, 2, 1, 3)  # (B,H,T,dh)

    qh, kh, vh = heads(q), heads(k), heads(v)
    seg = None
    if T_pad != T:
        ids = (jnp.arange(T_pad) < T).astype(jnp.int32)[None, :].repeat(B, 0)
        seg = SegmentIds(q=ids, kv=ids)

    # NOTE: measured SLOWER than XLA's fused attention on v5e for the whisper
    # encoder shape (B=32, T=1536, H=12, dh=64) with both default and 512
    # blocks — kept opt-in (OLMOASR_FLASH=1) pending further block tuning.
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    block = min(512, T_pad)
    out = flash_attention(
        qh, kh, vh,
        segment_ids=seg,
        causal=causal,
        sm_scale=dh ** -0.5,
        block_sizes=BlockSizes(
            block_q=block, block_k_major=block, block_k=block, block_b=1
        ),
    )  # (B, H, T_pad, dh)
    out = out.transpose(0, 2, 1, 3).reshape(B, T_pad, D)
    return out[:, :T, :]
