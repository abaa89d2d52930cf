"""Decode-kernel flag-matrix parity (r4 VERDICT weak #4 / next #6).

``decode_step`` threads a handful of trace-time env knobs selecting between
fused Pallas kernels and XLA fallbacks. An untested flag combination is
untested surface — the r3 advisor found a real crash in one. After the r5
pruning (CROSS_VIL / FAST_SOFTMAX / ENC_PAD16 deleted as settled measured
negatives) this suite pins the SURVIVING matrix: every reachable combination
must produce logits matching the pure-XLA path within bf16 tolerance, for
both bf16 and int8-quantized caches, greedy (kv_group=1) and beam-shaped
(shared cross + ancestry) decode.

TPU-only (the Pallas kernels gate on ``jax.default_backend() == "tpu"``):
run with ``OLMOASR_TEST_TPU=1 python -m pytest tests/test_decode_flag_matrix.py``
on a chip. Committed chip run: perf/r5_flag_matrix.log.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.dims import ModelDimensions

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="decode kernel paths gate on the TPU backend "
    "(run with OLMOASR_TEST_TPU=1 on a chip)",
)

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=128, n_audio_head=2,
    n_audio_layer=2, n_vocab=51864, n_text_ctx=448, n_text_state=128,
    n_text_head=2, n_text_layer=2,
)

FLAG_NAMES = (
    "OLMOASR_LAYER_BLOCK", "OLMOASR_PALLAS_SELF", "OLMOASR_PALLAS_CROSS_BLOCK",
    "OLMOASR_PALLAS_CROSS", "OLMOASR_PALLAS_MLP", "OLMOASR_WV_MODE",
    "OLMOASR_SELF_ROWS", "OLMOASR_SELF_HT", "OLMOASR_CROSS_ROWS",
)

# the surviving reachable combinations (defaults first); every entry is a
# dict of env overrides on top of the hard-off baseline
XLA_BASELINE = {
    "OLMOASR_LAYER_BLOCK": "0", "OLMOASR_PALLAS_SELF": "0",
    "OLMOASR_PALLAS_CROSS_BLOCK": "0", "OLMOASR_PALLAS_CROSS": "0",
    "OLMOASR_PALLAS_MLP": "0",
}
COMBOS = [
    {},  # production defaults: sc layer block + cross_block + self + mlp
    {"OLMOASR_LAYER_BLOCK": "0"},  # split kernels
    {"OLMOASR_LAYER_BLOCK": "1"},  # full-fusion layer block (small-D models)
    {"OLMOASR_LAYER_BLOCK": "0", "OLMOASR_PALLAS_SELF": "0"},
    {"OLMOASR_LAYER_BLOCK": "0", "OLMOASR_PALLAS_CROSS_BLOCK": "0",
     "OLMOASR_PALLAS_CROSS": "1"},
    {"OLMOASR_LAYER_BLOCK": "0", "OLMOASR_PALLAS_MLP": "0"},
    {"OLMOASR_WV_MODE": "expand"},
    {"OLMOASR_LAYER_BLOCK": "0", "OLMOASR_SELF_ROWS": "1"},
    {"OLMOASR_LAYER_BLOCK": "0", "OLMOASR_SELF_HT": "1"},
    {"OLMOASR_CROSS_ROWS": "2", "OLMOASR_LAYER_BLOCK": "0"},
]


def _set_flags(overrides):
    for name in FLAG_NAMES:
        os.environ.pop(name, None)
    for k, v in overrides.items():
        os.environ[k] = v
    jax.clear_caches()  # flags are read at trace time


@pytest.fixture(scope="module")
def setup():
    params = m.init_params(jax.random.PRNGKey(0), DIMS,
                           include_padding_token=False)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng = np.random.default_rng(3)
    feats = jnp.asarray(
        rng.standard_normal((8, 1500, DIMS.n_audio_state)) * 0.3, jnp.bfloat16
    )
    prompt = jnp.asarray(
        np.tile(np.array([[50257, 50362]], np.int32), (8, 1))
    )
    toks = jnp.asarray(rng.integers(0, 5000, (8, 6)), jnp.int32)
    return params, feats, prompt, toks


def _run(params, feats, prompt, toks, *, quant_cross, quant_self,
         self_batch=None, kv_group=1):
    """Prefill + 6 single-token decode steps; returns stacked step logits."""
    B = feats.shape[0] * kv_group
    cache = m.init_cache(
        params, DIMS, feats, max_len=64,
        quantize_cross=quant_cross, quantize_self=quant_self,
        self_batch=B if kv_group > 1 else None,
    )
    pr = jnp.repeat(prompt, kv_group, axis=0) if kv_group > 1 else prompt
    tk = jnp.repeat(toks, kv_group, axis=0) if kv_group > 1 else toks
    logits, cache = m.decode_step(params, DIMS, pr, cache)
    outs = [logits[:, -1]]
    for i in range(tk.shape[1]):
        logits, cache = m.decode_step(params, DIMS, tk[:, i : i + 1], cache)
        outs.append(logits[:, -1])
    return jnp.stack(outs, axis=1).astype(jnp.float32)


@pytest.mark.parametrize("quant", ["bf16", "int8"])
def test_flag_matrix_greedy(setup, quant):
    params, feats, prompt, toks = setup
    qc = qs = quant == "int8"
    _set_flags(XLA_BASELINE)
    ref = np.asarray(_run(params, feats, prompt, toks,
                          quant_cross=qc, quant_self=qs))
    ref_arg = ref.argmax(-1)
    try:
        for combo in COMBOS:
            if quant == "bf16" and combo.get("OLMOASR_WV_MODE") == "dot8":
                continue
            _set_flags(combo)
            out = np.asarray(_run(params, feats, prompt, toks,
                                  quant_cross=qc, quant_self=qs))
            err = np.abs(out - ref).max()
            # bf16 kernels vs bf16 XLA: identical math, different op order
            assert err < 0.15, (combo, err)
            # argmax agreement is a secondary sanity check: with a RANDOM
            # 2-layer micro model the top-2 logit gap is often inside bf16
            # op-order noise, so a couple of flips per 56 argmaxes are
            # expected (measured 0.964 on-chip for the split+XLA-self combo,
            # perf/r5_flag_matrix.log); full-scale run-to-run determinism is
            # pinned separately (test_decode_determinism_fullscale)
            agree = (out.argmax(-1) == ref_arg).mean()
            assert agree > 0.9, (combo, agree)
    finally:
        _set_flags({})


def test_flag_matrix_dot8(setup):
    """int8 weight-quantized value contraction: looser tolerance."""
    params, feats, prompt, toks = setup
    _set_flags(XLA_BASELINE)
    ref = np.asarray(_run(params, feats, prompt, toks,
                          quant_cross=True, quant_self=True))
    try:
        _set_flags({"OLMOASR_WV_MODE": "dot8"})
        out = np.asarray(_run(params, feats, prompt, toks,
                              quant_cross=True, quant_self=True))
        err = np.abs(out - ref).max()
        assert err < 0.6, err
        agree = (out.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.95, agree
    finally:
        _set_flags({})


@pytest.mark.parametrize("quant", ["bf16", "int8"])
def test_flag_matrix_beam_shape(setup, quant):
    """kv_group>1 (shared cross cache) rides the split kernels: the grouped
    cache must agree with a per-row replicated XLA run."""
    params, feats, prompt, toks = setup
    qc = qs = quant == "int8"
    _set_flags(XLA_BASELINE)
    ref = np.asarray(_run(params, feats, prompt, toks,
                          quant_cross=qc, quant_self=qs, kv_group=2))
    try:
        for combo in ({}, {"OLMOASR_LAYER_BLOCK": "0"}):
            _set_flags(combo)
            out = np.asarray(_run(params, feats, prompt, toks,
                                  quant_cross=qc, quant_self=qs, kv_group=2))
            err = np.abs(out - ref).max()
            assert err < 0.15, (combo, err)
    finally:
        _set_flags({})
