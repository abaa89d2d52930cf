"""MXU/VPU overlap probe for the training-attention forward kernel.

Hypothesis (docs/TRAIN_PERF.md): the dot -> softmax -> dot chain serializes
within a block; software-pipelining independent q sub-blocks inside one
program lets Mosaic overlap block i's softmax (VPU) with block i+1's score
dot (MXU), moving the kernel from sum(MXU, VPU) toward max(MXU, VPU).

Variants:
  base      : production _attn_fwd (grid over 512-row q blocks)
  seq<SB>   : one program per (n), python loop over SB-row sub-blocks,
              strictly sequential chain per sub-block (control)
  pipe<SB>  : same blocking, software-pipelined: S_{a+1} issued before
              softmax_a / PV_a so the scheduler can overlap
Usage: probe_pipe.py <variant> [<variant> ...]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from olmoasr_tpu.ops.train_attention import _attn_fwd, _prep

B, T, D, H = 16, 1500, 1024, 16
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
qh, kh, vh, bias, (Tq_pad, Tk_pad, scale) = _prep(q, k, v, H, None)
N = B * H
dh = D // H
flops_fwd = 2 * 2 * N * Tq_pad * Tk_pad * dh


def _sm(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p.astype(jnp.bfloat16), l


def _dot(a, b, tb=False):
    dn = (((1,), (1,)), ((), ())) if tb else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)


def make_whole(sb, pipelined):
    ns = Tq_pad // sb

    def kern(q_ref, k_ref, v_ref, bias_ref, o_ref):
        kk = k_ref[0]
        vv = v_ref[0]
        bb = bias_ref[0]
        if not pipelined:
            for a in range(ns):
                s = _dot(q_ref[0, a * sb:(a + 1) * sb], kk, tb=True) + bb
                p, l = _sm(s)
                o = _dot(p, vv)
                o_ref[0, a * sb:(a + 1) * sb] = (o / l).astype(o_ref.dtype)
        else:
            s_prev = _dot(q_ref[0, 0:sb], kk, tb=True) + bb
            for a in range(1, ns):
                s_next = _dot(q_ref[0, a * sb:(a + 1) * sb], kk, tb=True) + bb
                p, l = _sm(s_prev)
                o = _dot(p, vv)
                o_ref[0, (a - 1) * sb:a * sb] = (o / l).astype(o_ref.dtype)
                s_prev = s_next
            p, l = _sm(s_prev)
            o = _dot(p, vv)
            o_ref[0, (ns - 1) * sb:] = (o / l).astype(o_ref.dtype)

    @jax.jit
    def run(qh, kh, vh, bias):
        bias3 = bias[:, None, :]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, Tq_pad, dh), qh.dtype),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, Tq_pad, dh), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, 1, Tk_pad), lambda n: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Tq_pad, dh), lambda n: (n, 0, 0)),
        )(qh, kh, vh, bias3)

    return run


def _chain_time(f, n):
    """Chain n dependent executions (output feeds the q input), fetch once.
    block_until_ready is a NO-OP through the axon tunnel and per-call fetches
    pay a ~33ms RTT — see perf/r4_timing.md."""
    t0 = time.perf_counter()
    r = qh
    for _ in range(n):
        r = f(r, kh, vh, bias)
    np.asarray(r[0, 0, :4])
    return time.perf_counter() - t0


def bench(name, f):
    out = f(qh, kh, vh, bias)
    np.asarray(out[0, 0, :4])  # compile + warm fetch shape
    ref = _attn_fwd(qh, kh, vh, bias, H)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    _chain_time(f, 5)
    t_short, t_long = _chain_time(f, 30), _chain_time(f, 120)
    dt = (t_long - t_short) / 90
    print(f"{name:24s} {dt*1e3:8.3f} ms  {flops_fwd/dt/1e12:6.1f} TF/s-fwd  maxerr {err:.3e}", flush=True)


for variant in sys.argv[1:]:
    if variant == "ablate":
        continue
    if variant == "base":
        bench("base bq512", lambda qh, kh, vh, bias: _attn_fwd(qh, kh, vh, bias, H))
    else:
        kind = "pipe" if variant.startswith("pipe") else "seq"
        sb = int(variant[len(kind):])
        bench(variant, make_whole(sb, kind == "pipe"))


def make_ablate(sb, drop):
    """drop: set of stages to remove — 'bias','max','exp','div','sum'."""
    ns = Tq_pad // sb

    def kern(q_ref, k_ref, v_ref, bias_ref, o_ref):
        kk = k_ref[0]
        vv = v_ref[0]
        bb = bias_ref[0]
        for a in range(ns):
            s = _dot(q_ref[0, a * sb:(a + 1) * sb], kk, tb=True)
            if "bias" not in drop:
                s = s + bb
            if "max" not in drop:
                s = s - jnp.max(s, axis=-1, keepdims=True)
            if "exp" not in drop:
                if "bf16exp" in drop:
                    p = jnp.exp(s.astype(jnp.bfloat16))
                elif "exp2" in drop:
                    p = jnp.exp2(s * 1.4426950408889634)
                else:
                    p = jnp.exp(s)
            else:
                p = s
            if "sum" not in drop:
                l = jnp.sum(p, axis=-1, keepdims=True)
            else:
                l = 1.0
            o = _dot(p.astype(jnp.bfloat16), vv)
            if "div" not in drop:
                o = o / l
            o_ref[0, a * sb:(a + 1) * sb] = o.astype(o_ref.dtype)

    @jax.jit
    def run(qh, kh, vh, bias):
        bias3 = bias[:, None, :]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, Tq_pad, dh), qh.dtype),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, Tq_pad, dh), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk_pad, dh), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, 1, Tk_pad), lambda n: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Tq_pad, dh), lambda n: (n, 0, 0)),
        )(qh, kh, vh, bias3)

    return run


def bench_raw(name, f):
    out = f(qh, kh, vh, bias)
    np.asarray(out[0, 0, :4])
    _chain_time(f, 5)
    t_short, t_long = _chain_time(f, 30), _chain_time(f, 120)
    dt = (t_long - t_short) / 90
    print(f"{name:24s} {dt*1e3:8.3f} ms  {flops_fwd/dt/1e12:6.1f} TF/s-fwd", flush=True)


if __name__ == "__main__" and sys.argv[1:] and sys.argv[1] == "ablate":
    sb = 512
    for drop in [set(), {"bias"}, {"max"}, {"exp"}, {"sum"}, {"div"},
                 {"bias", "max", "exp", "sum", "div"},
                 {"bf16exp"}, {"exp2"}]:
        bench_raw(f"sb512 -{','.join(sorted(drop)) or 'none'}",
                  make_ablate(sb, drop))
