"""Pallas cross-attention decode kernel vs the reference sdpa/XLA paths
(interpret mode on CPU; the real lowering is exercised by bench on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from olmoasr_tpu.models.whisper import _quantize_rows, cross_attend, sdpa
from olmoasr_tpu.ops.attention import cross_attend_decode


@pytest.mark.parametrize("B,T,D,H", [(4, 96, 64, 4), (2, 128, 128, 8)])
def test_kernel_matches_sdpa(B, T, D, H):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.float32)
    ref = sdpa(q, k, v, H, None)
    out = cross_attend_decode(q, k, v, n_head=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_matches_quantized_xla_path():
    B, T, D, H = 4, 96, 64, 4
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.float32)
    kq, ks = _quantize_rows(k)
    vq, vs = _quantize_rows(v)
    ref = cross_attend(q, kq, vq, H, ks, vs)
    out = cross_attend_decode(q, kq, vq, ks, vs, n_head=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and int8 error vs exact attention stays small
    exact = sdpa(q, k, v, H, None)
    assert float(jnp.abs(out - exact).max()) < 0.05


def test_self_kernel_matches_attend_cached():
    from olmoasr_tpu.models.whisper import _attend_cached
    from olmoasr_tpu.ops.attention import self_attend_decode

    B, C, D, H, L = 4, 96, 64, 4, 3
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, D), jnp.float32)
    kr = jax.random.normal(jax.random.PRNGKey(1), (L, B, C, D), jnp.float32)
    vr = jax.random.normal(jax.random.PRNGKey(2), (L, B, C, D), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(3), (B, 1, D), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(4), (B, 1, D), jnp.float32)
    for off in (0, 40, 96):
        for li in (0, 2):
            ref = _attend_cached(q, kr[li], vr[li], kn, vn, jnp.int32(off), H)
            out = self_attend_decode(
                q, kr, vr, kn, vn, jnp.int32(off), jnp.int32(li),
                n_head=H, interpret=True,
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
