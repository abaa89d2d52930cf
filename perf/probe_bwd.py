"""Honest (chain-difference) timing of the training-attention BWD kernel.

Variants:
  base        : production _attn_bwd (grid (N, Tq/bq), bq=256)
  bq<B>       : production kernel at block_q=B
  row<SB>     : whole-row program (grid (N,)), python loop over SB-row
                sub-blocks, dk/dv accumulated in VMEM scratch
Usage: probe_bwd.py base bq512 row256 row512 ...
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from olmoasr_tpu.ops.train_attention import _attn_bwd, _prep

B, T, D, H = 16, 1500, 1024, 16
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
qh, kh, vh, bias, (Tq_pad, Tk_pad, scale) = _prep(q, k, v, H, None)
do = jnp.asarray(rng.standard_normal(qh.shape), jnp.bfloat16)
N = B * H
dh = D // H
# bwd matmul FLOPs: fwd recompute (2 dots) + dp + ds·K + dsᵀ·q + pᵀ·do = 5 more
flops_bwd = 2 * 5 * N * Tq_pad * Tk_pad * dh


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def make_row(sb):
    ns = Tq_pad // sb

    def kern(q_ref, k_ref, v_ref, do_ref, bias_ref, dq_ref, dk_ref, dv_ref,
             dk_acc, dv_acc):
        kk = k_ref[0]
        vv = v_ref[0]
        bb = bias_ref[0]
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)
        for a in range(ns):
            sl = slice(a * sb, (a + 1) * sb)
            qq = q_ref[0, sl]
            dd = do_ref[0, sl]
            s = _dot(qq, kk, ((1,), (1,))) + bb
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pn = p / l
            pnb = pn.astype(jnp.bfloat16)
            dp = _dot(dd, vv, ((1,), (1,)))
            delta = jnp.sum(dp * pn, axis=-1, keepdims=True)
            ds = (pn * (dp - delta)).astype(jnp.bfloat16)
            dq_ref[0, sl] = _dot(ds, kk, ((1,), (0,))).astype(dq_ref.dtype)
            dk_acc[:] += _dot(ds, qq, ((0,), (0,)))
            dv_acc[:] += _dot(pnb, dd, ((0,), (0,)))
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    @jax.jit
    def run(qh, kh, vh, do, bias):
        bias3 = bias[:, None, :]
        row = pl.BlockSpec((1, Tq_pad, dh), lambda n: (n, 0, 0))
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((N, Tq_pad, dh), qh.dtype),
                jax.ShapeDtypeStruct((N, Tk_pad, dh), kh.dtype),
                jax.ShapeDtypeStruct((N, Tk_pad, dh), vh.dtype),
            ),
            grid=(N,),
            in_specs=[row,
                      pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0)),
                      pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0)),
                      row,
                      pl.BlockSpec((1, 1, Tk_pad), lambda n: (0, 0, 0))],
            out_specs=(row,
                       pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0)),
                       pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0))),
            scratch_shapes=[pltpu.VMEM((Tk_pad, dh), jnp.float32),
                            pltpu.VMEM((Tk_pad, dh), jnp.float32)],
        )(qh, kh, vh, do, bias3)

    return run


def chain_time(f, n):
    t0 = time.perf_counter()
    dq = do
    for _ in range(n):
        dq, dk, dv = f(qh, kh, vh, dq, bias)
    np.asarray(dq[0, 0, :4])
    return time.perf_counter() - t0


def bench(name, f, ref=None):
    dq, dk, dv = f(qh, kh, vh, do, bias)
    np.asarray(dq[0, 0, :4])
    if ref is not None:
        rq, rk, rv = ref
        for a, b, lbl in ((dq, rq, "dq"), (dk, rk, "dk"), (dv, rv, "dv")):
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
            if err > 1e-2:
                print(f"  !! {name} {lbl} maxerr {err:.3e}")
    chain_time(f, 3)
    t_s, t_l = chain_time(f, 10), chain_time(f, 40)
    dt = (t_l - t_s) / 30
    print(f"{name:16s} {dt*1e3:8.3f} ms  {flops_bwd/dt/1e12:6.1f} TF/s-bwd", flush=True)
    return (dq, dk, dv)


ref = None
for variant in sys.argv[1:]:
    if variant == "base":
        ref = bench("base bq256", lambda q_, k_, v_, d_, b_: _attn_bwd(q_, k_, v_, d_, b_, H))
    elif variant.startswith("bq"):
        bq = int(variant[2:])
        bench(variant, lambda q_, k_, v_, d_, b_, bq=bq: _attn_bwd(
            q_, k_, v_, d_, b_, H, block_q=bq), ref)
    elif variant.startswith("row"):
        sb = int(variant[3:])
        bench(variant, make_row(sb), ref)
