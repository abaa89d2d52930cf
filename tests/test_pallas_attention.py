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


def test_cross_block_kernel_matches_composed_path():
    """Fused LN+qproj+attn+oproj+residual kernel vs the composed XLA ops."""
    from olmoasr_tpu.models.whisper import layer_norm, _linear
    from olmoasr_tpu.ops.attention import cross_block_decode

    B, T, D, H, L = 4, 96, 64, 4, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (B, 1, D), jnp.float32)
    ln_g = jax.random.normal(ks[1], (L, D)) * 0.1 + 1.0
    ln_b = jax.random.normal(ks[2], (L, D)) * 0.1
    wq = jax.random.normal(ks[3], (L, D, D)) * 0.1
    bq = jax.random.normal(ks[4], (L, D)) * 0.1
    wo = jax.random.normal(ks[5], (L, D, D)) * 0.1
    bo = jax.random.normal(ks[6], (L, D)) * 0.1
    ck_f = jax.random.normal(ks[7], (L, B, T, D))
    cv_f = jax.random.normal(ks[8], (L, B, T, D))
    ckq, cks = _quantize_rows(ck_f)
    cvq, cvs = _quantize_rows(cv_f)

    for li in (0, 2):
        qc = _linear(layer_norm(x, ln_g[li], ln_b[li]), wq[li], bq[li])
        cattn = cross_attend(qc, ckq[li], cvq[li], H, cks[li], cvs[li])
        ref = x + _linear(cattn, wo[li], bo[li])
        out = cross_block_decode(
            x, ln_g, ln_b, wq, bq, wo, bo, ckq, cvq, cks, cvs,
            jnp.int32(li), n_head=H, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )


def test_cross_block_kernel_bf16_and_unquantized():
    """bf16 activations take the bf16 MXU path; ones-scales = bf16 cache."""
    from olmoasr_tpu.models.whisper import layer_norm, _linear, sdpa
    from olmoasr_tpu.ops.attention import cross_block_decode

    B, T, D, H, L = 2, 96, 64, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(1), 12)
    x = jax.random.normal(ks[0], (B, 1, D), jnp.bfloat16)
    ln_g = (jax.random.normal(ks[1], (L, D)) * 0.1 + 1.0).astype(jnp.bfloat16)
    ln_b = (jax.random.normal(ks[2], (L, D)) * 0.1).astype(jnp.bfloat16)
    wq = (jax.random.normal(ks[3], (L, D, D)) * 0.1).astype(jnp.bfloat16)
    bq = (jax.random.normal(ks[4], (L, D)) * 0.1).astype(jnp.bfloat16)
    wo = (jax.random.normal(ks[5], (L, D, D)) * 0.1).astype(jnp.bfloat16)
    bo = (jax.random.normal(ks[6], (L, D)) * 0.1).astype(jnp.bfloat16)
    ck = jax.random.normal(ks[7], (L, B, T, D), jnp.bfloat16)
    cv = jax.random.normal(ks[8], (L, B, T, D), jnp.bfloat16)
    ones = jnp.ones((L, B, T), jnp.float32)

    li = 1
    qc = _linear(layer_norm(x, ln_g[li], ln_b[li]), wq[li], bq[li])
    cattn = sdpa(qc, ck[li], cv[li], H, None)
    ref = x + _linear(cattn, wo[li], bo[li])
    out = cross_block_decode(
        x, ln_g, ln_b, wq, bq, wo, bo, ck, cv, ones, ones,
        jnp.int32(li), n_head=H, interpret=True,
    )
    err = np.abs(
        np.asarray(out, np.float32) - np.asarray(ref, np.float32)
    ).max()
    assert err < 0.05, err  # bf16 rounding only


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


def test_self_kernel_rows_per_program():
    """rows=2/4 multi-row programs == the rows=1 kernel; the (H, C)-oriented
    ht variant == the (C, H) kernel (incl. offset edge cases)."""
    from olmoasr_tpu.ops.attention import self_attend_decode

    B, C, D, H, L = 4, 96, 64, 4, 2
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, D), jnp.float32)
    kr = jax.random.normal(jax.random.PRNGKey(1), (L, B, C, D), jnp.float32)
    vr = jax.random.normal(jax.random.PRNGKey(2), (L, B, C, D), jnp.float32)
    kn = jax.random.normal(jax.random.PRNGKey(3), (B, 1, D), jnp.float32)
    vn = jax.random.normal(jax.random.PRNGKey(4), (B, 1, D), jnp.float32)
    args = (q, kr, vr, kn, vn, jnp.int32(40), jnp.int32(1))
    ref = self_attend_decode(*args, n_head=H, interpret=True)
    for rows in (2, 4):
        out = self_attend_decode(*args, n_head=H, rows=rows, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    for off in (0, 40, 96):
        a = (q, kr, vr, kn, vn, jnp.int32(off), jnp.int32(1))
        want = self_attend_decode(*a, n_head=H, interpret=True)
        got = self_attend_decode(*a, n_head=H, ht=True, rows=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cross_kernel_int8_qk_path_accuracy():
    """bf16 activations + int8 K trigger the native int8 MXU q.K dot; the
    q-quantization error must stay within int8-cache noise."""
    B, T, D, H = 2, 96, 64, 4
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, D)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, D))
    kq, ks = _quantize_rows(k)
    vq, vs = _quantize_rows(v)
    exact = sdpa(q.astype(jnp.float32), k, v, H, None)
    out = cross_attend_decode(q, kq, vq, ks, vs, n_head=H, interpret=True)
    err = float(jnp.abs(out.astype(jnp.float32) - exact).max())
    assert err < 0.08, err


@pytest.mark.parametrize("mode,tol", [("dot", 3e-5), ("dot8", 0.08)])
def test_cross_block_wv_modes(mode, tol):
    """Transposed-contraction value paths == the expand path (dot exact-ish,
    dot8 within int8-weight quantization noise)."""
    from olmoasr_tpu.ops.attention import cross_block_decode

    B, T, D, H, L = 2, 96, 64, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(5), 12)
    mk = lambda i, *shape: jax.random.normal(ks[i], shape) * 0.1
    x = mk(0, B, 1, D)
    ln_g, ln_b = jnp.ones((L, D)), jnp.zeros((L, D))
    wq, bq = mk(3, L, D, D), mk(4, L, D)
    wo, bo = mk(5, L, D, D), mk(6, L, D)
    ckq, cks = _quantize_rows(jax.random.normal(ks[7], (L, B, T, D)))
    cvq, cvs = _quantize_rows(jax.random.normal(ks[8], (L, B, T, D)))
    if mode == "dot8":
        # int8 path engages on the bf16 production dtype
        x = x.astype(jnp.bfloat16)
        ln_g, ln_b = ln_g.astype(jnp.bfloat16), ln_b.astype(jnp.bfloat16)
        wq, bq = wq.astype(jnp.bfloat16), bq.astype(jnp.bfloat16)
        wo, bo = wo.astype(jnp.bfloat16), bo.astype(jnp.bfloat16)
    args = (x, ln_g, ln_b, wq, bq, wo, bo, ckq, cvq, cks, cvs, jnp.int32(0))
    ref = cross_block_decode(*args, n_head=H, interpret=True)
    out = cross_block_decode(*args, n_head=H, interpret=True, wv_mode=mode)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < tol, err


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cross_block_transposed_k(dtype):
    """The transposed-K kernel ((H, T) orientation, K stored (L, B, D, T))
    == the normal-layout kernel; bf16 engages the int8 MXU q path."""
    from olmoasr_tpu.ops.attention import cross_block_decode

    B, T, D, H, L = 2, 96, 64, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(7), 12)
    mk = lambda i, *shape: (jax.random.normal(ks[i], shape) * 0.1).astype(dtype)
    x = mk(0, B, 1, D)
    ln_g, ln_b = jnp.ones((L, D), dtype), jnp.zeros((L, D), dtype)
    wq, bq = mk(3, L, D, D), mk(4, L, D)
    wo, bo = mk(5, L, D, D), mk(6, L, D)
    ckq, cks = _quantize_rows(jax.random.normal(ks[7], (L, B, T, D)))
    cvq, cvs = _quantize_rows(jax.random.normal(ks[8], (L, B, T, D)))
    li = jnp.int32(1)
    ref = cross_block_decode(
        x, ln_g, ln_b, wq, bq, wo, bo, ckq, cvq, cks, cvs, li,
        n_head=H, interpret=True, wv_mode="dot",
    )
    out = cross_block_decode(
        x, ln_g, ln_b, wq, bq, wo, bo, ckq.transpose(0, 1, 3, 2), cvq, cks,
        cvs, li, n_head=H, interpret=True, wv_mode="dot", k_transposed=True,
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < (3e-5 if dtype == jnp.float32 else 0.03), err


def test_cross_block_transposed_k_rows():
    """Multi-row kt programs (rows=2) == rows=1."""
    from olmoasr_tpu.ops.attention import cross_block_decode

    B, T, D, H, L = 4, 96, 64, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(11), 12)
    mk = lambda i, *shape: jax.random.normal(ks[i], shape) * 0.1
    x = mk(0, B, 1, D)
    ln_g, ln_b = jnp.ones((L, D)), jnp.zeros((L, D))
    wq, bq = mk(3, L, D, D), mk(4, L, D)
    wo, bo = mk(5, L, D, D), mk(6, L, D)
    ckq, cks = _quantize_rows(jax.random.normal(ks[7], (L, B, T, D)))
    cvq, cvs = _quantize_rows(jax.random.normal(ks[8], (L, B, T, D)))
    args = (
        x, ln_g, ln_b, wq, bq, wo, bo, ckq.transpose(0, 1, 3, 2), cvq, cks,
        cvs, jnp.int32(1),
    )
    ref = cross_block_decode(
        *args, n_head=H, interpret=True, wv_mode="dot", k_transposed=True
    )
    out = cross_block_decode(
        *args, n_head=H, interpret=True, wv_mode="dot", k_transposed=True,
        rows=2,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_cross_attend_transposed_k_xla():
    """XLA cross_attend contracts the (B, D, Tk) transposed-K layout to the
    same result as the normal layout (prefill / kernel-off path)."""
    from olmoasr_tpu.models.whisper import _quantize_rows as qr
    from olmoasr_tpu.models.whisper import cross_attend

    B, S, T, D, H = 2, 5, 96, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(ks[0], (B, S, D)) * 0.3
    ckq, cks = qr(jax.random.normal(ks[1], (B, T, D)))
    cvq, cvs = qr(jax.random.normal(ks[2], (B, T, D)))
    ref = cross_attend(q, ckq, cvq, H, cks, cvs)
    out = cross_attend(
        q, ckq.transpose(0, 2, 1), cvq, H, cks, cvs, k_transposed=True
    )
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 1e-5, err


def test_cross_block_kernel_shared_kv_group():
    """kv_group>1: query rows b share cross row b//G — equals the replicated
    cache, for both the int8 (kt layout) and bf16 (plain layout) kernels."""
    from olmoasr_tpu.models.whisper import _quantize_rows
    from olmoasr_tpu.ops.attention import cross_block_decode

    Bkv, G, T, D, H, L = 2, 3, 96, 64, 4, 2
    B = Bkv * G
    ks = jax.random.split(jax.random.PRNGKey(5), 12)
    x = jax.random.normal(ks[0], (B, 1, D), jnp.float32)
    ln_g = jax.random.normal(ks[1], (L, D)) * 0.1 + 1.0
    ln_b = jax.random.normal(ks[2], (L, D)) * 0.1
    wq = jax.random.normal(ks[3], (L, D, D)) * 0.1
    bq = jax.random.normal(ks[4], (L, D)) * 0.1
    wo = jax.random.normal(ks[5], (L, D, D)) * 0.1
    bo = jax.random.normal(ks[6], (L, D)) * 0.1
    ck_f = jax.random.normal(ks[7], (L, Bkv, T, D))
    cv_f = jax.random.normal(ks[8], (L, Bkv, T, D))
    ckq, cks = _quantize_rows(ck_f)
    cvq, cvs = _quantize_rows(cv_f)

    rep = lambda a: jnp.repeat(a, G, axis=1)  # audio-major replication
    for kt in (False, True):
        ckq_l = ckq.transpose(0, 1, 3, 2) if kt else ckq
        ref = cross_block_decode(
            x, ln_g, ln_b, wq, bq, wo, bo,
            rep(ckq_l), rep(cvq), rep(cks), rep(cvs),
            jnp.int32(1), n_head=H, interpret=True, k_transposed=kt,
        )
        out = cross_block_decode(
            x, ln_g, ln_b, wq, bq, wo, bo,
            ckq_l, cvq, cks, cvs,
            jnp.int32(1), n_head=H, interpret=True, k_transposed=kt,
            kv_group=G,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )


def test_decode_step_shared_cross_cache_matches_replicated():
    """Model-level: init_cache(self_batch=B*G) + decode_step == the fully
    replicated cache, through prefill AND single-token steps (XLA path)."""
    from olmoasr_tpu.models import whisper as m
    from olmoasr_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=96, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=256, n_text_ctx=32, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = m.init_params(jax.random.PRNGKey(0), dims)
    Bkv, G = 2, 3
    af = jax.random.normal(jax.random.PRNGKey(1), (Bkv, 96, 64), jnp.float32)

    for quant in (False, True):
        shared = m.init_cache(
            params, dims, af, max_len=16, quantize_cross=quant,
            self_batch=Bkv * G,
        )
        repl = m.init_cache(
            params, dims, jnp.repeat(af, G, axis=0), max_len=16,
            quantize_cross=quant,
        )
        prompt = jnp.tile(jnp.array([[5, 7, 9]], jnp.int32), (Bkv * G, 1))
        lo_s, shared = m.decode_step(params, dims, prompt, shared)
        lo_r, repl = m.decode_step(params, dims, prompt, repl)
        np.testing.assert_allclose(
            np.asarray(lo_s), np.asarray(lo_r), atol=2e-5, rtol=1e-5
        )
        tok = jnp.argmax(lo_s[:, -1], axis=-1)[:, None].astype(jnp.int32)
        l2_s, _ = m.decode_step(params, dims, tok, shared)
        l2_r, _ = m.decode_step(params, dims, tok, repl)
        np.testing.assert_allclose(
            np.asarray(l2_s), np.asarray(l2_r), atol=2e-5, rtol=1e-5
        )

def test_self_kernel_beam_ancestry_matches_gather():
    """Beam-ancestry kernel == physically gathering the rings by ancestry and
    running the plain cached attention (the XLA fallback in decode_step)."""
    from olmoasr_tpu.models.whisper import _attend_cached
    from olmoasr_tpu.ops.attention import self_attend_decode

    B, K, C, D, H, L = 8, 4, 96, 64, 4, 2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    kr = jnp.asarray(rng.standard_normal((L, B, C, D)), jnp.float32)
    vr = jnp.asarray(rng.standard_normal((L, B, C, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.float32)
    ident = np.tile(np.arange(B)[:, None] % K, (1, C)).astype(np.int32)
    for off in (0, 40, 96):
        anc = rng.integers(0, K, (B, C)).astype(np.int32)
        anc[:, off:] = ident[:, off:]
        g_rows = (np.arange(B) // K * K)[:, None] + anc
        for li in (0, 1):
            sk = np.take_along_axis(np.asarray(kr)[li], g_rows[:, :, None], axis=0)
            sv = np.take_along_axis(np.asarray(vr)[li], g_rows[:, :, None], axis=0)
            ref = _attend_cached(
                q, jnp.asarray(sk), jnp.asarray(sv), kn, vn, jnp.int32(off), H
            )
            out = self_attend_decode(
                q, kr, vr, kn, vn, jnp.int32(off), jnp.int32(li),
                n_head=H, interpret=True, beam_anc=jnp.asarray(anc), beam_k=K,
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestTrainAttentionKernel:
    """ops/train_attention.py: the specialized encoder training kernel
    (one-pass softmax fwd, fused single-pass bwd, residuals=(q,k,v))."""

    def _mk(self, B, T, D, seed=0):
        rng = np.random.default_rng(seed)
        f = lambda: jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
        return f(), f(), f()

    @pytest.mark.parametrize("B,T,D,H", [(2, 300, 128, 2), (1, 1500, 256, 4)])
    def test_fwd_matches_sdpa(self, B, T, D, H):
        from olmoasr_tpu.models.whisper import sdpa
        from olmoasr_tpu.ops.train_attention import enc_self_attention

        q, k, v = self._mk(B, T, D)
        ref = np.asarray(sdpa(q, k, v, H, None), np.float32)
        out = np.asarray(enc_self_attention(q, k, v, H, True), np.float32)
        assert np.max(np.abs(ref - out)) < 0.05  # bf16 prob-cast noise

    @pytest.mark.parametrize("B,T,D,H", [(2, 300, 128, 2), (1, 1500, 256, 4)])
    def test_grads_match_sdpa(self, B, T, D, H):
        from olmoasr_tpu.models.whisper import sdpa
        from olmoasr_tpu.ops.train_attention import enc_self_attention

        q, k, v = self._mk(B, T, D)

        def loss(att):
            return lambda q, k, v: jnp.sum(att(q, k, v).astype(jnp.float32) ** 2)

        gr = jax.grad(loss(lambda q, k, v: sdpa(q, k, v, H, None)), (0, 1, 2))(q, k, v)
        gn = jax.grad(
            loss(lambda q, k, v: enc_self_attention(q, k, v, H, True)), (0, 1, 2)
        )(q, k, v)
        for a, b in zip(gr, gn):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert rel < 0.05  # bf16 noise band (flash kernel: 1.6e-2)

    def test_under_remat_policy(self):
        """The kernel's custom VJP must compose with jax.checkpoint +
        save_only_these_names (the training configuration)."""
        from olmoasr_tpu.ops.train_attention import enc_self_attention
        from olmoasr_tpu.models.whisper import _tag_attn

        B, T, D, H = 1, 300, 128, 2
        q, k, v = self._mk(B, T, D)

        def block(q, k, v):
            return jnp.sum(
                _tag_attn(enc_self_attention(q, k, v, H, True)).astype(jnp.float32) ** 2
            )

        ck = jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"),
        )
        g_plain = jax.grad(block, (0, 1, 2))(q, k, v)
        g_remat = jax.grad(ck, (0, 1, 2))(q, k, v)
        for a, b in zip(g_plain, g_remat):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5
            )


class TestWholeRowTrainAttention:
    """The whole-row grid variant (grid (N,), k/v loaded once per row —
    default since r4, +10% fwd / +3% bwd on v5e, perf/r4_timing.md) must
    match the grid-blocked kernels bit-for-bit in fwd and bwd.

    The row/blocked switch is read at trace time, so the jit caches must be
    cleared between env flips (same caveat as OLMOASR_ATTN_BF16_EXP)."""

    @staticmethod
    def _clear():
        from olmoasr_tpu.ops import train_attention as ta

        ta._attn_fwd.clear_cache()
        ta._attn_bwd.clear_cache()

    @pytest.mark.parametrize(
        "Tq,Tk,causal", [(384, 384, False), (384, 384, True), (448, 300, False)]
    )
    def test_row_matches_blocked_fwd_bwd(self, Tq, Tk, causal, monkeypatch):
        from olmoasr_tpu.ops.train_attention import train_attention

        B, D, H = 2, 128, 2
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.standard_normal((B, Tq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, Tk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Tk, D)), jnp.bfloat16)

        def loss(q, k, v):
            return jnp.sum(
                train_attention(q, k, v, H, causal, True).astype(jnp.float32)
                ** 2
            )

        outs = {}
        for row in ("0", "1"):
            monkeypatch.setenv("OLMOASR_ATTN_WHOLE_ROW", row)
            self._clear()
            o = train_attention(q, k, v, H, causal, True)
            g = jax.grad(loss, (0, 1, 2))(q, k, v)
            outs[row] = (np.asarray(o, np.float32),
                         [np.asarray(x, np.float32) for x in g])
        self._clear()
        np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
        # grads: identical math, but dk/dv accumulate in a different order
        # (one whole-row dot vs per-q-block partial sums) — f32 rounding that
        # can flip the final bf16 cast by 1 ulp (~0.8% rel on small values)
        for a, b in zip(outs["0"][1], outs["1"][1]):
            np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-2)

    @pytest.mark.parametrize("mode", ["1", "fwd"])
    @pytest.mark.parametrize("causal", [False, True])
    def test_d128_pad_matches_unpadded(self, mode, causal, monkeypatch):
        """OLMOASR_ATTN_D128 zero-pads d_head 64->128 for full-MXU-depth
        contractions; the padded columns carry exact zeros so fwd AND grads
        must be bit-equal to the unpadded kernels ("fwd" pads the forward
        only — the bwd's padded output traffic measured as a net loss,
        perf/r5_d128_ab.log vs perf/r5_d128_fwd_ab.log)."""
        from olmoasr_tpu.ops.train_attention import train_attention

        B, T, D, H = 2, 256, 128, 2  # dh=64: the d128 trigger shape
        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)

        def loss(q, k, v):
            return jnp.sum(
                train_attention(q, k, v, H, causal, True).astype(jnp.float32)
                ** 2
            )

        outs = {}
        for d128 in ("0", mode):
            monkeypatch.setenv("OLMOASR_ATTN_D128", d128)
            self._clear()
            o = train_attention(q, k, v, H, causal, True)
            g = jax.grad(loss, (0, 1, 2))(q, k, v)
            outs[d128] = (np.asarray(o, np.float32),
                          [np.asarray(x, np.float32) for x in g])
        self._clear()
        np.testing.assert_array_equal(outs["0"][0], outs[mode][0])
        for a, b in zip(outs["0"][1], outs[mode][1]):
            if mode == "1":
                # padded-bwd grads: the 64 zero products are exact, but the
                # d=128 contraction re-blocks the nonzero partial sums —
                # f32 reassociation that can flip the final bf16 cast by
                # 1 ulp (same class as the row/blocked dk/dv tolerance)
                np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-2)
            else:
                np.testing.assert_array_equal(a, b)

    def test_row_sub_block_selection(self):
        from olmoasr_tpu.ops.train_attention import _row_sub_block

        assert _row_sub_block(1536, 1536) == 256  # encoder: measured best
        assert _row_sub_block(512, 512) == 512    # decoder self: one block
        assert _row_sub_block(512, 1536) == 256   # cross
        assert _row_sub_block(128, 128) == 128


class TestDecoderTrainAttentionKernels:
    """ops/train_attention.py decoder variants: causal self-attention with the
    loader's per-sample key bias, and 448q-over-1500k cross-attention."""

    def _mk(self, B, Tq, Tk, D, seed=0):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((B, Tq, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, Tk, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Tk, D)), jnp.bfloat16)
        return q, k, v

    @staticmethod
    def _causal_mask(T):
        return jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)[None, None]

    @pytest.mark.parametrize("B,T,D,H", [(2, 300, 128, 2), (1, 448, 256, 4)])
    def test_causal_self_with_key_bias(self, B, T, D, H):
        from olmoasr_tpu.ops.train_attention import dec_self_attention

        q, k, v = self._mk(B, T, T, D)
        # loader-style suffix pad columns (-inf), different length per sample
        kb = np.zeros((B, T), np.float32)
        for b in range(B):
            kb[b, T - 10 * (b + 1):] = -np.inf
        kb = jnp.asarray(kb)
        ref = np.asarray(
            sdpa(q, k, v, H, self._causal_mask(T), kb), np.float32
        )
        out = np.asarray(
            dec_self_attention(q, k, v, H, key_bias=kb, interpret=True),
            np.float32,
        )
        # compare only valid rows (pad-query rows are garbage-in/garbage-out
        # in both paths but normalized differently)
        n_valid = T - 10 * B
        assert np.max(np.abs(ref[:, :n_valid] - out[:, :n_valid])) < 0.05

    def test_causal_self_no_bias_grads(self):
        from olmoasr_tpu.ops.train_attention import dec_self_attention

        B, T, D, H = 2, 300, 128, 2
        q, k, v = self._mk(B, T, T, D)

        def loss(att):
            return lambda *a: jnp.sum(att(*a).astype(jnp.float32) ** 2)

        mask = self._causal_mask(T)
        gr = jax.grad(loss(lambda q, k, v: sdpa(q, k, v, H, mask)), (0, 1, 2))(
            q, k, v
        )
        gn = jax.grad(
            loss(lambda q, k, v: dec_self_attention(q, k, v, H, interpret=True)),
            (0, 1, 2),
        )(q, k, v)
        for a, b in zip(gr, gn):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert rel < 0.05

    def test_cross_fwd_and_grads(self):
        from olmoasr_tpu.ops.train_attention import cross_attention

        B, Tq, Tk, D, H = 2, 448, 300, 128, 2
        q, k, v = self._mk(B, Tq, Tk, D)
        ref = np.asarray(sdpa(q, k, v, H, None), np.float32)
        out = np.asarray(cross_attention(q, k, v, H, interpret=True), np.float32)
        assert np.max(np.abs(ref - out)) < 0.05

        def loss(att):
            return lambda *a: jnp.sum(att(*a).astype(jnp.float32) ** 2)

        gr = jax.grad(loss(lambda q, k, v: sdpa(q, k, v, H, None)), (0, 1, 2))(
            q, k, v
        )
        gn = jax.grad(
            loss(lambda q, k, v: cross_attention(q, k, v, H, interpret=True)),
            (0, 1, 2),
        )(q, k, v)
        for a, b in zip(gr, gn):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
            assert rel < 0.05

    def test_prepadded_valid_len_matches_unpadded(self):
        """Pre-padded inputs + valid_len == unpadded inputs (the encoder runs
        its whole stack at 1536 and masks keys >= 1500 in-kernel; fwd AND
        grads on the valid region must be identical)."""
        from olmoasr_tpu.ops.train_attention import (
            cross_attention, enc_self_attention,
        )

        B, T, D, H = 2, 300, 128, 2
        T_pad = 384
        q, k, v = self._mk(B, T, T, D)
        pad = lambda x: jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
        ref = enc_self_attention(q, k, v, H, interpret=True)
        out = enc_self_attention(
            pad(q), pad(k), pad(v), H, interpret=True, valid_len=T
        )
        np.testing.assert_allclose(
            np.asarray(out[:, :T], np.float32), np.asarray(ref, np.float32),
            atol=1e-3,
        )

        def loss(fn, *args):
            return jnp.sum(fn(*args).astype(jnp.float32) ** 2)

        g_ref = jax.grad(
            lambda q_: loss(
                lambda x: enc_self_attention(x, k, v, H, interpret=True), q_
            )
        )(q)
        g_pad = jax.grad(
            lambda q_: loss(
                lambda x: enc_self_attention(
                    x, pad(k), pad(v), H, interpret=True, valid_len=T
                )[:, :T], q_,
            )
        )(pad(q))
        np.testing.assert_allclose(
            np.asarray(g_pad[:, :T], np.float32),
            np.asarray(g_ref, np.float32), atol=1e-3,
        )
        # padded-region grads never leak into valid rows via keys
        assert np.all(np.isfinite(np.asarray(g_pad, np.float32)))

        # 16-multiple pre-pad: whole-row kernels take non-128-multiple
        # query rows directly (the unpadded-decoder-query-rows path)
        pad16 = lambda x: jnp.pad(x, ((0, 0), (0, 304 - T), (0, 0)))
        out16 = enc_self_attention(
            pad16(q), pad16(k), pad16(v), H, interpret=True, valid_len=T
        )
        np.testing.assert_allclose(
            np.asarray(out16[:, :T], np.float32), np.asarray(ref, np.float32),
            atol=1e-3,
        )

        # cross: pre-padded keys, unpadded queries
        kc, vc = self._mk(B, 200, 200, D)[1:]
        refc = cross_attention(q, kc, vc, H, interpret=True)
        padk = lambda x: jnp.pad(x, ((0, 0), (0, 256 - 200), (0, 0)))
        outc = cross_attention(
            q, padk(kc), padk(vc), H, interpret=True, valid_len=200
        )
        np.testing.assert_allclose(
            np.asarray(outc, np.float32), np.asarray(refc, np.float32),
            atol=1e-3,
        )

    def test_shard_map_multidevice_matches(self):
        """train_attention under a registered 8-device mesh shards the batch
        through shard_map (same SPMD rule as flash_mha); fwd + grads of the
        interpret-mode kernel must equal the single-device result."""
        from olmoasr_tpu.ops import flash as flash_mod
        from olmoasr_tpu.ops.train_attention import dec_self_attention
        from olmoasr_tpu.parallel import mesh as mesh_mod

        B, T, D, H = 8, 256, 128, 2
        q, k, v = self._mk(B, T, T, D)
        kb = np.zeros((B, T), np.float32)
        kb[:, T - 16:] = -np.inf
        kb = jnp.asarray(kb)

        def loss(qq):
            return jnp.sum(
                dec_self_attention(
                    qq, k, v, H, key_bias=kb, interpret=True
                ).astype(jnp.float32) ** 2
            )

        ref = dec_self_attention(q, k, v, H, key_bias=kb, interpret=True)
        g_ref = jax.grad(loss)(q)
        mesh = mesh_mod.make_mesh(2, 4)
        flash_mod.set_flash_mesh(mesh)
        try:
            out = dec_self_attention(q, k, v, H, key_bias=kb, interpret=True)
            g = jax.grad(loss)(q)
        finally:
            flash_mod.set_flash_mesh(None)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(g_ref, np.float32), atol=1e-3
        )

    def test_key_bias_gets_zero_grad_not_crash(self):
        from olmoasr_tpu.ops.train_attention import dec_self_attention

        B, T, D, H = 1, 256, 128, 2
        q, k, v = self._mk(B, T, T, D)
        kb = jnp.zeros((B, T), jnp.float32)

        def loss(kb):
            return jnp.sum(
                dec_self_attention(q, k, v, H, key_bias=kb, interpret=True)
                .astype(jnp.float32) ** 2
            )

        g = jax.grad(loss)(kb)
        assert np.allclose(np.asarray(g), 0.0)


def test_layer_block_fused_matches_composition():
    """The fused decoder-layer kernel (self + cross + MLP in one launch) ==
    the composed XLA reference, for rows 1/2/4 and several ring offsets."""
    from olmoasr_tpu.models.whisper import (
        _attend_cached, _linear, layer_norm,
    )
    from olmoasr_tpu.ops.attention import layer_block_decode

    B, C, T, D, F, H, L = 4, 96, 96, 64, 128, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(33), 24)
    mk = lambda i, *sh: jax.random.normal(ks[i], sh) * 0.2
    x = mk(0, B, 1, D)
    g1, b1 = jnp.ones((L, D)) * 1.05, jnp.zeros((L, D)) + 0.02
    wqkv, bqkv = mk(1, L, D, 3 * D), mk(2, L, 3 * D)
    wo1, bo1 = mk(3, L, D, D), mk(4, L, D)
    g2, b2 = jnp.ones((L, D)) * 0.95, mk(5, L, D) * 0.1
    wq, bq = mk(6, L, D, D), mk(7, L, D)
    wo2, bo2 = mk(8, L, D, D), mk(9, L, D)
    g3, b3 = jnp.ones((L, D)), mk(10, L, D) * 0.1
    w1, b1m = mk(11, L, D, F), mk(12, L, F)
    w2, b2m = mk(13, L, F, D), mk(14, L, D)
    kr, vr = mk(15, L, B, C, D), mk(16, L, B, C, D)
    ckq, cks = _quantize_rows(jax.random.normal(ks[17], (L, B, T, D)))
    cvq, cvs = _quantize_rows(jax.random.normal(ks[18], (L, B, T, D)))
    li = 1
    for off in (0, 40, 96):
        h = layer_norm(x, g1[li], b1[li])
        qkv = _linear(h, wqkv[li], bqkv[li])
        q, kn, vn = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
        attn = _attend_cached(q, kr[li], vr[li], kn, vn, jnp.int32(off), H)
        x1 = x + _linear(attn, wo1[li], bo1[li])
        qc = _linear(layer_norm(x1, g2[li], b2[li]), wq[li], bq[li])
        cattn = cross_attend(qc, ckq[li], cvq[li], H, cks[li], cvs[li])
        x2 = x1 + _linear(cattn, wo2[li], bo2[li])
        hh = _linear(layer_norm(x2, g3[li], b3[li]), w1[li], b1m[li])
        hh = jax.nn.gelu(hh, approximate=False)
        want = x2 + _linear(hh, w2[li], b2m[li])
        for rows in (1, 2, 4):
            got_x, got_k, got_v = layer_block_decode(
                x, g1, b1, wqkv, bqkv, wo1, bo1, g2, b2, wq, bq, wo2, bo2,
                g3, b3, w1, b1m, w2, b2m, kr, vr,
                ckq.transpose(0, 1, 3, 2), cvq, cks, cvs,
                jnp.int32(off), jnp.int32(li), n_head=H, rows=rows,
                interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(got_x), np.asarray(want), atol=3e-5
            )
            np.testing.assert_allclose(np.asarray(got_k), np.asarray(kn), atol=3e-5)
            np.testing.assert_allclose(np.asarray(got_v), np.asarray(vn), atol=3e-5)


def test_defer_l_backward_matches_default(monkeypatch):
    """OLMOASR_ATTN_DEFER_L=1 (1/l folded into do + delta instead of
    normalizing the (BQ, Tk) prob block) produces the same grads as the
    default backward, up to bf16 rounding placement."""
    from olmoasr_tpu.ops.train_attention import dec_self_attention

    B, T, D, H = 2, 128, 64, 4
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, T, D)) * 0.3
    k = jax.random.normal(ks[1], (B, T, D)) * 0.3
    v = jax.random.normal(ks[2], (B, T, D)) * 0.3
    bias = jnp.where(jnp.arange(T)[None, :] < 100, 0.0, -jnp.inf) * jnp.ones(
        (B, 1)
    )

    def grads():
        jax.clear_caches()  # the knob is read at trace time

        def loss(args):
            q_, k_, v_ = args
            o = dec_self_attention(q_, k_, v_, H, bias, interpret=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        return jax.grad(loss)((q, k, v))

    base = grads()
    monkeypatch.setenv("OLMOASR_ATTN_DEFER_L", "1")
    defer = grads()
    monkeypatch.delenv("OLMOASR_ATTN_DEFER_L")
    jax.clear_caches()
    for a, b in zip(base, defer):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-2,
            rtol=1e-2,
        )


def test_layer_block_sc_mode_stops_after_cross():
    """include_mlp=False ("sc"): the kernel output is the post-cross residual
    stream (the caller runs mlp_block) — checked against the composition."""
    from olmoasr_tpu.models.whisper import (
        _attend_cached, _linear, layer_norm,
    )
    from olmoasr_tpu.ops.attention import layer_block_decode

    B, C, T, D, F, H, L = 4, 96, 96, 64, 128, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(66), 24)
    mk = lambda i, *sh: jax.random.normal(ks[i], sh) * 0.2
    x = mk(0, B, 1, D)
    g1, b1 = jnp.ones((L, D)) * 1.05, jnp.zeros((L, D)) + 0.02
    wqkv, bqkv = mk(1, L, D, 3 * D), mk(2, L, 3 * D)
    wo1, bo1 = mk(3, L, D, D), mk(4, L, D)
    g2, b2 = jnp.ones((L, D)) * 0.95, mk(5, L, D) * 0.1
    wq, bq = mk(6, L, D, D), mk(7, L, D)
    wo2, bo2 = mk(8, L, D, D), mk(9, L, D)
    g3, b3 = jnp.ones((L, D)), mk(10, L, D) * 0.1
    w1, b1m = mk(11, L, D, F), mk(12, L, F)
    w2, b2m = mk(13, L, F, D), mk(14, L, D)
    kr, vr = mk(15, L, B, C, D), mk(16, L, B, C, D)
    ckq, cks = _quantize_rows(jax.random.normal(ks[17], (L, B, T, D)))
    cvq, cvs = _quantize_rows(jax.random.normal(ks[18], (L, B, T, D)))
    li, off = 0, 96

    h = layer_norm(x, g1[li], b1[li])
    qkv = _linear(h, wqkv[li], bqkv[li])
    q, kn, vn = qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :]
    attn = _attend_cached(q, kr[li], vr[li], kn, vn, jnp.int32(off), H)
    x1 = x + _linear(attn, wo1[li], bo1[li])
    qc = _linear(layer_norm(x1, g2[li], b2[li]), wq[li], bq[li])
    cattn = cross_attend(qc, ckq[li], cvq[li], H, cks[li], cvs[li])
    want = x1 + _linear(cattn, wo2[li], bo2[li])  # post-cross, NO MLP

    got_x, got_k, got_v = layer_block_decode(
        x, g1, b1, wqkv, bqkv, wo1, bo1, g2, b2, wq, bq, wo2, bo2,
        g3, b3, w1, b1m, w2, b2m, kr, vr,
        ckq.transpose(0, 1, 3, 2), cvq, cks, cvs,
        jnp.int32(off), jnp.int32(li), n_head=H, rows=2, include_mlp=False,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(kn), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(vn), atol=3e-5)
