"""Two-head MXU packing probe for the d=64 training-attention wall.

The d_head=64 whisper shapes fill only half the MXU's 128-deep contraction
on the score dot (q.kT, K=64) and half its output lanes on the value dot
(P.V, N=64) — docs/TRAIN_PERF.md puts the resulting ceiling at ~98 TF/s vs
153.6 measured dense peak. Any linear "packing" of two heads into one
128-deep contraction necessarily doubles the MAC count (the MXU cannot
skip the zero blocks / the cross-head terms), so packing wins IFF

    rate(K=128 at these shapes)  >  2 x rate(K=64 at these shapes)

i.e. iff the half-depth matmul runs at materially LESS than half the
full-depth rate (per-pass overheads, pipeline bubbles). This probe measures
exactly that, at the production encoder training shape, with the production
whole-row kernel structure:

  seq<SB>    : d=64 per-head baseline (production structure, one program per
               (batch, head) row, SB-row sub-blocks)
  pad<SB>    : identical, but q/k/v zero-padded to d=128 OUTSIDE the kernel
               (rate question in isolation: same block structure, K=N=128,
               2x MACs, 2x kernel HBM traffic)
  pack<SB>   : two REAL heads per program (grid N/2): q rides packed
               (Tq, 128) = [qA | qB]; zero-padded K~_A = [kA | 0],
               K~_B = [0 | kB] built in-kernel once per row; two full-depth
               score dots + two full-width PV dots accumulated into a
               (SB, 128) = [oA | oB] output. Same HBM traffic as seq, 2x MACs
               at (hopefully) full-depth rate.

All variants report TF/s-fwd against the same USEFUL (d=64) flop count.
Usage: probe_pack.py seq256 pad256 pack256 [...]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, T, D, H = 16, 1500, 1024, 16
Tq = Tk = 1536
dh = 64
N = B * H
rng = np.random.default_rng(0)
qh = jnp.asarray(rng.standard_normal((N, Tq, dh)), jnp.bfloat16)
kh = jnp.asarray(rng.standard_normal((N, Tk, dh)), jnp.bfloat16)
vh = jnp.asarray(rng.standard_normal((N, Tk, dh)), jnp.bfloat16)
flops_fwd = 2 * 2 * N * Tq * Tk * dh  # useful (d=64) fwd flops


def _sm(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p.astype(jnp.bfloat16), l


def _dot(a, b, tb=False):
    dn = (((1,), (1,)), ((), ())) if tb else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)


def make_seq(sb, d):
    """Per-head whole-row forward at head dim d (64 = baseline, 128 = padded)."""
    ns = Tq // sb

    def kern(q_ref, k_ref, v_ref, o_ref):
        kk = k_ref[0]
        vv = v_ref[0]
        for a in range(ns):
            s = _dot(q_ref[0, a * sb:(a + 1) * sb], kk, tb=True)
            p, l = _sm(s)
            o = _dot(p, vv)
            o_ref[0, a * sb:(a + 1) * sb] = (o / l).astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        if d != dh:
            pad = ((0, 0), (0, 0), (0, d - dh))
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, Tq, d), q.dtype),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, Tq, d), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk, d), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk, d), lambda n: (n, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Tq, d), lambda n: (n, 0, 0)),
        )(q, k, v)
        return out[..., :dh]

    return run


def make_pack(sb):
    """Two real heads per program: packed (Tq, 128) q, zero-padded per-head
    K/V built in-kernel, all four dots at full MXU depth/width."""
    ns = Tq // sb
    d2 = 2 * dh

    def kern(q_ref, k_ref, v_ref, o_ref):
        kk = k_ref[0]  # (Tk, 128) = [kA | kB]
        vv = v_ref[0]
        zeros = jnp.zeros((Tk, dh), jnp.bfloat16)
        ka = jnp.concatenate([kk[:, :dh], zeros], axis=1)  # [kA | 0]
        kb = jnp.concatenate([zeros, kk[:, dh:]], axis=1)  # [0 | kB]
        va = jnp.concatenate([vv[:, :dh], zeros], axis=1)
        vb = jnp.concatenate([zeros, vv[:, dh:]], axis=1)
        for a in range(ns):
            qq = q_ref[0, a * sb:(a + 1) * sb]  # (sb, 128) = [qA | qB]
            sa = _dot(qq, ka, tb=True)  # (sb, Tk) head-A scores, K=128
            sb_ = _dot(qq, kb, tb=True)  # head-B scores
            pa, la = _sm(sa)
            pb, lb = _sm(sb_)
            o = _dot(pa, va) + _dot(pb, vb)  # (sb, 128) = [oA | oB], N=128
            l = jnp.concatenate(
                [jnp.broadcast_to(la, (sb, dh)),
                 jnp.broadcast_to(lb, (sb, dh))], axis=1)
            o_ref[0, a * sb:(a + 1) * sb] = (o / l).astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        # pack head pairs: (N, T, 64) -> (N/2, T, 128)
        pk = lambda x: x.reshape(N // 2, 2, -1, dh).transpose(0, 2, 1, 3)\
            .reshape(N // 2, -1, d2)
        qp, kp, vp = pk(q), pk(k), pk(v)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N // 2, Tq, d2), q.dtype),
            grid=(N // 2,),
            in_specs=[
                pl.BlockSpec((1, Tq, d2), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk, d2), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk, d2), lambda n: (n, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, Tq, d2), lambda n: (n, 0, 0)),
        )(qp, kp, vp)
        return out.reshape(N // 2, Tq, 2, dh).transpose(0, 2, 1, 3)\
            .reshape(N, Tq, dh)

    return run


def make_raw(sb, d, n_heads_per_prog=1):
    """Score dot only (no softmax, no PV): isolates rate(K=d)."""
    ns = Tq // sb

    def kern(q_ref, k_ref, o_ref):
        kk = k_ref[0]
        acc = jnp.zeros((sb, 128), jnp.float32)
        for a in range(ns):
            s = _dot(q_ref[0, a * sb:(a + 1) * sb], kk, tb=True)
            acc = acc + s[:, :128]
        o_ref[0] = acc[:1]

    @jax.jit
    def run(q, k, v):
        qp, kp = q, k
        if d != dh:
            pad = ((0, 0), (0, 0), (0, d - dh))
            qp, kp = jnp.pad(q, pad), jnp.pad(k, pad)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((N, 1, 128), jnp.float32),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, Tq, d), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, Tk, d), lambda n: (n, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 128), lambda n: (n, 0, 0)),
        )(qp, kp)
        # chain dependency: negligible-epsilon fold of the result into q
        return q + (out[:, :1, :dh] * 1e-30).astype(q.dtype)

    return run


def _chain_time(f, n):
    """Chain n dependent executions (output feeds the q input), fetch once —
    the r4 timing rule (perf/r4_timing.md): unchained dispatch through the
    axon tunnel measures nothing."""
    t0 = time.perf_counter()
    r = qh
    for _ in range(n):
        r = f(r, kh, vh)
    np.asarray(r).ravel()[:4]
    return time.perf_counter() - t0


def bench(name, f, ref=None, flops=None):
    out = f(qh, kh, vh)
    np.asarray(out).ravel()[:4]
    if ref is not None:
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
    else:
        err = float("nan")
    _chain_time(f, 5)
    t_short, t_long = _chain_time(f, 30), _chain_time(f, 120)
    dt = (t_long - t_short) / 90
    fl = flops or flops_fwd
    print(f"{name:16s} {dt*1e3:8.3f} ms  {fl/dt/1e12:6.1f} TF/s-useful"
          f"  maxerr {err:.3e}", flush=True)


ref = None
for variant in sys.argv[1:]:
    if variant.startswith("seq"):
        sb = int(variant[3:])
        f = make_seq(sb, dh)
        if ref is None:
            ref = f(qh, kh, vh)
        bench(variant, f, ref)
    elif variant.startswith("pad"):
        bench(variant, make_seq(int(variant[3:]), 128), ref)
    elif variant.startswith("pack"):
        bench(variant, make_pack(int(variant[4:])), ref)
    elif variant.startswith("rawd"):  # rawd<64|128>x<sb>
        d, sb = variant[4:].split("x")
        # score-dot-only useful flops (half the fwd count)
        bench(variant, make_raw(int(sb), int(d)), None, flops_fwd // 2)
