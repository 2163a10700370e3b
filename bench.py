"""Benchmark: likelihood throughput (tracks/second) on TPU vs NumPy baseline.

The hot path of the whole framework is the per-track log-likelihood
evaluation (every optimizer iteration calls it; the reference spends ~a day
on a 5000-track model scan, BASELINE.md).  This measures the batched
fixed-window engine on the real TPU and compares against a NumPy
implementation of the *same* fixed-window algorithm running on this host —
an honest stand-in for the reference's pure-NumPy engine
(extrack/tracking.py:109-318), which uses the same vectorized recursion.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# benchmark configuration: 2-state model, 10-frame tracks, window 6
B_TPU = 1 << 20          # ~1M tracks amortize the tunnel dispatch latency
B_NP = 2048
T, D, W, S = 10, 2, 6, 2
MIN_LEN = 3


def _numpy_fixed_window_loglik(xs, lengths, isbl, tb, W):
    """NumPy twin of the engine (same math, host execution) for the baseline."""
    from extrack_tpu.core.tables import branch_log_trans, init_log_prob
    from extrack_tpu.core.engine import make_register_spec
    spec = make_register_spec(S, W, 1)
    K, G, A = spec.K, spec.G, spec.A
    logT = np.asarray(tb.log_trans, np.float64)
    lt_ag = np.asarray(branch_log_trans(jnp.asarray(logT), 1))[:, spec.prev0_g]
    lsurv = np.asarray(tb.log_survive, np.float64)
    end_k = np.asarray(tb.end_ll, np.float64)[spec.prev0_k]
    lp0 = np.asarray(init_log_prob(jnp.asarray(logT),
                                   jnp.asarray(tb.log_frac), 1), np.float64)
    sig2 = np.asarray(tb.sig2, np.float64)[0]
    l2 = float(np.asarray(tb.loc_err2).ravel()[0])
    Bn = xs.shape[0]

    m = np.repeat(xs[:, 0:1], K, axis=1)                    # (B,K,D)
    s2 = np.full((Bn, K, D), l2) + sig2[spec.init_pat][None, :, None]
    lp = np.broadcast_to(lp0[spec.init_pat]
                         - spec.dummy_digits * np.log(S), (Bn, K)).copy()
    logl = np.zeros(Bn)
    sig2_ag = sig2[(np.arange(A)[:, None] * S
                    + spec.prev0_g[None, :])]               # (A,G)
    for t in range(1, T):
        x_t = xs[:, t]
        is_final = t == lengths - 1
        is_int = t < lengths - 1
        tot = l2 + s2
        fin = lp + isbl[:, None] * end_k[None] + np.sum(
            -0.5 * np.log(2 * np.pi * tot)
            - (x_t[:, None, :] - m) ** 2 / (2 * tot), -1)
        mx = fin.max(1, keepdims=True)
        logl += np.where(is_final,
                         np.log(np.exp(fin - mx).sum(1)) + mx[:, 0], 0.0)
        new_m = (m * l2 + x_t[:, None, :] * s2) / tot
        tail = l2 * s2 / tot
        lc = np.sum(-0.5 * np.log(2 * np.pi * tot)
                    - (x_t[:, None, :] - m) ** 2 / (2 * tot), -1)
        gate = float(t + 1 >= MIN_LEN)
        base = (lp + lc).reshape(Bn, G, A)
        lpc = (base[:, None] + lt_ag[None, :, :, None]
               + gate * lsurv[None, :, None, None])         # (B,A,G,A)
        mx2 = lpc.max(-1, keepdims=True)
        w = np.exp(lpc - mx2)
        sw = w.sum(-1, keepdims=True)
        wn = w / sw
        lp_new = (mx2[..., 0] + np.log(sw[..., 0])).reshape(Bn, K)
        m_f = np.einsum('bago,bgod->bagd', wn,
                        new_m.reshape(Bn, G, A, D)).reshape(Bn, K, D)
        t_f = np.einsum('bago,bgod->bagd', wn,
                        tail.reshape(Bn, G, A, D))
        s2_new = (sig2_ag[None, :, :, None] + t_f).reshape(Bn, K, D)
        keep = is_int[:, None]
        m = np.where(keep[..., None], m_f, m)
        s2 = np.where(keep[..., None], s2_new, s2)
        lp = np.where(keep, lp_new, lp)
    return logl


def main():
    from extrack_tpu import simulate
    from extrack_tpu.core import engine, tables

    dtype = jnp.float32
    tb = tables.build_tables(
        Ds=jnp.asarray([0.0, 0.08], dtype), loc_err=jnp.asarray(0.02, dtype),
        Fs=jnp.asarray([0.5, 0.5], dtype),
        rates=jnp.asarray([[0.0, 0.1], [0.1, 0.0]], dtype),
        pBL=jnp.asarray(0.05, dtype), dt=jnp.asarray(0.02, dtype),
        cell_dims=(0.5,), nb_substeps=1)

    key = jax.random.PRNGKey(0)
    xs, _ = simulate.brownian_frames(key, B_TPU, T, jnp.asarray([0.0, 0.08]),
                                     jnp.asarray([0.5, 0.5]),
                                     jnp.asarray([[0.9, 0.1], [0.1, 0.9]]),
                                     0.02, 0.02, D)
    xs = xs.astype(dtype)
    rng = np.random.default_rng(1)
    lengths = jnp.asarray(rng.integers(MIN_LEN, T + 1, B_TPU), jnp.int32)
    isbl = (lengths < T).astype(dtype)

    from extrack_tpu.ops import pallas_engine

    use_pallas = jax.default_backend() == "tpu"

    @jax.jit
    def total(xs, lengths, isbl):
        if use_pallas:
            return jnp.sum(pallas_engine.forward_pallas(
                xs, lengths, isbl, tb, window=W, min_len=MIN_LEN,
                block=1024))
        return jnp.sum(engine.forward(xs, lengths, isbl, tb, window=W,
                                      nb_substeps=1, min_len=MIN_LEN))

    total(xs, lengths, isbl).block_until_ready()     # compile
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        total(xs, lengths, isbl).block_until_ready()
    dt_tpu = (time.perf_counter() - t0) / n_rep
    tracks_per_sec = B_TPU / dt_tpu

    # NumPy baseline (same algorithm, float64 like the reference);
    # best of 3 to be robust against host load
    xs_np = np.asarray(xs[:B_NP], np.float64)
    len_np = np.asarray(lengths[:B_NP])
    isbl_np = np.asarray(isbl[:B_NP], np.float64)
    dt_np = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        logl_np = _numpy_fixed_window_loglik(xs_np, len_np, isbl_np, tb, W)
        dt_np = min(dt_np, time.perf_counter() - t0)
    np_tracks_per_sec = B_NP / dt_np

    # sanity: engine and numpy twin agree (f32 vs f64 tolerance); report the
    # deviation rather than crash the benchmark on a transient blip
    logl_dev = np.asarray(total(xs[:B_NP], lengths[:B_NP], isbl[:B_NP]))
    rel = abs(float(logl_dev) - logl_np.sum()) / max(abs(logl_np.sum()), 1.0)
    if rel > 1e-3:
        import sys
        print(f"WARNING: engine/baseline mismatch rel={rel:.2e}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "likelihood_throughput",
        "value": round(tracks_per_sec, 1),
        "unit": "tracks/s (2-state, T=10, window=6, incl. baseline parity "
                f"check rel_err={rel:.2e}; numpy baseline "
                f"{np_tracks_per_sec:.1f} tracks/s)",
        "vs_baseline": round(tracks_per_sec / np_tracks_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
