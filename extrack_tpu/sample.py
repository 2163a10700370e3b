"""Bayesian posterior sampling for the diffusion-state model (HMC).

Beyond the reference's surface (point MLE + Fisher errors,
extrack/tracking.py:1299-1387 and the tutorial's notebook-level error
analysis): full posterior samples over {LocErr, D_i, F_i, p_ij, pBL},
using the SAME jitted likelihood the fit driver optimizes — on TPU every
leapfrog step runs the Pallas custom-VJP gradient kernel, so a thousand
posterior draws cost about a thousand optimizer iterations.

TPU-native design: each chain — dual-averaging step-size warmup,
diagonal mass-matrix estimation, and the sampling phase — runs as
``lax.scan``s with ALL chains vmapped into each jitted dispatch, so the
number of tunnel syncs is independent of the chain count (through the
remote-TPU tunnel a per-sample dispatch would cost ~28 ms each,
dwarfing the kernel; measured multi-chain overhead: 4 chains = 1.08x
one chain's wall time).  Long runs split into ``dispatch_chunk``-
iteration dispatches with the chain state carried across, bit-
identically — a monolithic multi-thousand-iteration program crashed
the remote TPU worker (benchmarks/sampler_bench.py).  Track batches
enter as jit ARGUMENTS (never closed over — a closed-over 1M-track
dataset bakes into the executable, CLAUDE.md).  When the warm-start
fit's Fisher errors are passed (``fisher_sd``) they precondition the
warmup metric and the start spread — without this, large datasets make
the posterior sharp enough that identity-metric warmup never brings
the over-dispersed chains together (R-hat 7-15 at 10k tracks).

The target density is the likelihood times a flat prior on the BOUNDED
parameters: sampling runs in the fit's unconstrained space z, so the
bijections' log-Jacobian (params.Parameters.unconstrained_log_jacobian)
is added to keep the flat prior flat after the change of variables.
Improper posteriors this can produce for truly unbounded parameters are
the user's usual responsibility (the default parameter bounds are all
finite except via generate_params' explicit choices).
"""
from __future__ import annotations

import functools

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from extrack_tpu import data as tdata
from extrack_tpu import fit as tfit
from extrack_tpu import params as tparams


@dataclass
class SampleResult:
    """Posterior samples in CONSTRAINED (physical) parameter space.

    samples: name -> (num_chains, num_samples) array; free parameters
    only (expr-derived quantities can be recomputed via spec.resolve).
    """
    samples: Dict[str, np.ndarray]
    accept_rate: float
    step_size: float
    mass: np.ndarray
    rhat: Dict[str, float] = field(default_factory=dict)
    ess: Dict[str, float] = field(default_factory=dict)

    def summary(self) -> str:
        rows = [f"{'param':>14}  {'mean':>10}  {'std':>10}  {'5%':>10}  "
                f"{'95%':>10}  {'R-hat':>6}  {'ESS':>7}"]
        for n, s in self.samples.items():
            flat = s.reshape(-1)
            q5, q95 = np.quantile(flat, [0.05, 0.95])
            rows.append(
                f"{n:>14}  {flat.mean():10.5g}  {flat.std():10.4g}  "
                f"{q5:10.5g}  {q95:10.5g}  "
                f"{self.rhat.get(n, float('nan')):6.3f}  "
                f"{self.ess.get(n, float('nan')):7.1f}")
        rows.append(f"acceptance {self.accept_rate:.2f}, "
                    f"step size {self.step_size:.3g}")
        return "\n".join(rows)


def _leapfrog(vg, z, p, inv_mass, eps, n_steps, data):
    """n_steps of leapfrog on H = U(z) + 0.5 p^T M^-1 p."""
    def step(carry, _):
        z, p, g = carry
        p_half = p - 0.5 * eps * g
        z_new = z + eps * inv_mass * p_half
        u_new, g_new = vg(z_new, data)
        p_new = p_half - 0.5 * eps * g_new
        return (z_new, p_new, g_new), u_new

    (z, p, g), us = jax.lax.scan(step, (z, p, vg(z, data)[1]), None,
                                 length=n_steps)
    return z, p, us[-1], g


def _hmc_kernels(vg, *, n_leapfrog, target_accept, jitter, dim, dtype):
    """Chunk-steppable HMC pieces (one chain; the driver vmaps them).

    Warmup runs in two phases: (A) dual-averaging step-size adaptation
    (Hoffman & Gelman 2014, sec. 3.2) at identity mass, estimating the
    posterior variance over its second half; (B) re-adaptation under
    the new diagonal mass (a step size tuned for one metric does not
    transfer to another).  Then the sampling scan with both frozen.

    Each piece scans a bounded number of iterations from an explicit
    carry so the driver can split a long run into several device
    dispatches: a monolithic 1500-iteration x 4-chain program
    (~36k sequential gradient kernels in ONE dispatch) crashed the
    remote TPU worker outright — the chunked form is bit-identical
    (same per-iteration key splits, phase-local iteration indices ride
    in as a traced ``start``) while keeping every dispatch minutes
    long at most.

    ``jitter`` randomizes the per-iteration step size by a uniform
    factor in [1-jitter, 1+jitter], which jitters the TRAJECTORY LENGTH
    eps*n_leapfrog — the standard fixed-compute-cost guard against
    periodic-orbit resonance.  Randomizing the step count instead would
    either waste gradient evals on masked no-op steps or break the
    fixed shapes jit needs; scaling eps is equivalent for resonance and
    free.
    """
    def kinetic(p, inv_mass):
        return 0.5 * jnp.sum(p * p * inv_mass)

    def hmc_step(z, u, key, eps, inv_mass, data):
        k1, k2, k3 = jax.random.split(key, 3)
        eps = eps * jax.random.uniform(
            k3, dtype=dtype, minval=1.0 - jitter, maxval=1.0 + jitter)
        p = jax.random.normal(k1, (dim,), dtype) / jnp.sqrt(inv_mass)
        z_new, p_new, u_new, _ = _leapfrog(vg, z, p, inv_mass, eps,
                                           n_leapfrog, data)
        h0 = u + kinetic(p, inv_mass)
        h1 = u_new + kinetic(p_new, inv_mass)
        log_acc = jnp.where(jnp.isfinite(h1), jnp.minimum(0.0, h0 - h1),
                            -jnp.inf)
        accept = jnp.log(jax.random.uniform(k2, dtype=dtype)) < log_acc
        z = jnp.where(accept, z_new, z)
        u = jnp.where(accept, u_new, u)
        return z, u, jnp.exp(log_acc)

    def masked(active, new, old):
        # iterations at i >= n_active are pure no-ops (carry unchanged,
        # key NOT consumed), so every chunk can run the SAME static
        # ``steps`` — one compiled program shape per phase type instead
        # of a fresh 100-300 s remote compile per remainder size — while
        # staying bit-identical to the unmasked monolithic chain
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), new, old)

    def warm_chunk(carry, data, inv_mass, mu, collect_from, n_active,
                   start, *, steps):
        """``steps`` warmup iterations from phase-local index ``start``
        (those at i >= n_active are masked no-ops);
        carry = (z, u, key, log_eps, log_eps_bar, h_bar, s1, s2, n)."""
        def body(c, i):
            z, u, key, log_eps, log_eps_bar, h_bar, s1, s2, n = c
            key, sub = jax.random.split(key)
            z, u, alpha = hmc_step(z, u, sub, jnp.exp(log_eps), inv_mass,
                                   data)
            t = i + 1.0
            h_bar = (1.0 - 1.0 / (t + 10.0)) * h_bar \
                + (target_accept - alpha) / (t + 10.0)
            log_eps = mu - jnp.sqrt(t) / 0.05 * h_bar
            w = t ** -0.75
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            in_win = (i >= collect_from).astype(dtype)
            new = (z, u, key, log_eps, log_eps_bar, h_bar,
                   s1 + in_win * z, s2 + in_win * z * z, n + in_win)
            return masked(i < n_active, new, c), None

        return jax.lax.scan(body, carry,
                            jnp.arange(steps, dtype=dtype) + start)[0]

    def samp_chunk(carry, data, eps, inv_mass, n_active, start, *, steps):
        """``steps`` sampling iterations (masked past n_active; the
        masked rows of the emitted samples are discarded host-side);
        carry = (z, u, key)."""
        def body(c, i):
            z, u, key = c
            key, sub = jax.random.split(key)
            z, u, alpha = hmc_step(z, u, sub, eps, inv_mass, data)
            new = masked(i < n_active, (z, u, key), c)
            return new, (new[0], alpha)

        return jax.lax.scan(body, carry,
                            jnp.arange(steps, dtype=dtype) + start)

    return warm_chunk, samp_chunk


def _hmc_chain(vg, z0, data, key, *, num_warmup, num_samples, n_leapfrog,
               target_accept, init_step, jitter=0.2):
    """One chain as a single traceable program (the integrator tests jit
    this directly; production runs go through sample_posterior's chunked
    driver, which executes the SAME kernels and is bit-identical)."""
    dim, dtype = z0.shape[0], z0.dtype
    warm_chunk, samp_chunk = _hmc_kernels(
        vg, n_leapfrog=n_leapfrog, target_accept=target_accept,
        jitter=jitter, dim=dim, dtype=dtype)

    def phase(z, u, k, inv_mass, steps, eps0, collect_from):
        log_eps0 = jnp.log(eps0)
        zs_ = jnp.zeros((), dtype)
        zd = jnp.zeros((dim,), dtype)
        carry = (z, u, k, log_eps0, log_eps0, zs_, zd, zd, zs_)
        carry = warm_chunk(carry, data, inv_mass,
                           jnp.log(10.0) + log_eps0,
                           jnp.asarray(collect_from, dtype),
                           jnp.asarray(steps, dtype),
                           jnp.zeros((), dtype), steps=steps)
        eps_bar = jnp.exp(carry[4])
        n = jnp.maximum(carry[8], 2.0)
        var = jnp.maximum(carry[7] / n - (carry[6] / n) ** 2, 0.0)
        return carry[0], carry[1], carry[2], eps_bar, var

    u0 = vg(z0, data)[0]
    steps_a = max(2 * num_warmup // 3, 1)
    steps_b = max(num_warmup - steps_a, 1)
    key, ka = jax.random.split(key)
    z, u, key, eps_a, var = phase(z0, u0, ka, jnp.ones((dim,), dtype),
                                  steps_a, jnp.asarray(init_step, dtype),
                                  steps_a // 2)
    inv_mass = jnp.clip(var, 1e-6, 1e6)
    z, u, key, eps, _ = phase(z, u, key, inv_mass, steps_b, eps_a,
                              steps_b + 1)
    (z, u, _), (zs, alphas) = samp_chunk(
        (z, u, key), data, eps, inv_mass,
        jnp.asarray(num_samples, dtype), jnp.zeros((), dtype),
        steps=num_samples)
    return zs, jnp.mean(alphas), eps, inv_mass


def _split_rhat(x: np.ndarray) -> float:
    """Split-chain R-hat of (chains, samples)."""
    c, n = x.shape
    if n < 4:
        return float("nan")
    halves = x[:, : (n // 2) * 2].reshape(c * 2, n // 2)
    m, s = halves.mean(1), halves.var(1, ddof=1)
    w = s.mean()
    b = halves.shape[1] * m.var(ddof=1)
    if w <= 0:
        return float("nan")
    return float(np.sqrt((halves.shape[1] - 1) / halves.shape[1]
                         + b / (w * halves.shape[1])))


def _ess(x: np.ndarray) -> float:
    """Bulk effective sample size of (chains, samples) via pairwise
    autocorrelation sums (Geyer initial positive sequence)."""
    c, n = x.shape
    if n < 4:
        return float("nan")
    xc = x - x.mean(axis=1, keepdims=True)
    acov = np.stack([np.correlate(r, r, mode="full")[n - 1:] / n
                     for r in xc]).mean(0)
    if acov[0] <= 0:
        return float("nan")
    rho = acov / acov[0]
    tau = 1.0
    for k in range(1, n - 2, 2):
        pair = rho[k] + rho[k + 1]
        if pair < 0:
            break
        tau += 2.0 * pair
    return float(c * n / tau)


def sample_posterior(all_tracks: Dict[str, np.ndarray],
                     dt,
                     params: Optional[tparams.Parameters] = None,
                     nb_states: int = 2,
                     *,
                     num_samples: int = 1000,
                     num_warmup: int = 500,
                     num_chains: int = 2,
                     n_leapfrog: int = 24,
                     target_accept: float = 0.8,
                     init_step: float = 0.05,
                     jitter: float = 0.2,
                     seed: int = 0,
                     cell_dims=(0.5, None, None),
                     nb_substeps: int = 1,
                     window: Optional[int] = None,
                     min_len: Optional[int] = None,
                     matrix_type: int = 1,
                     input_LocErr=None,
                     max_buckets: int = 4,
                     sharded: bool = False,
                     dispatch_chunk: int = 256,
                     fisher_sd: Optional[Dict[str, float]] = None,
                     init_spread: float = 0.1,
                     verbose: int = 0) -> SampleResult:
    """HMC posterior samples for the model parameters on a track dataset.

    Same dataset/model arguments as ``fit.param_fitting``; ``params``
    (its values = the chains' start point — run a fit first for a warm
    start) defaults to ``generate_params(nb_states)``.  Flat priors on
    the bounded parameters; fixed (vary=False) and expr-derived
    parameters stay fixed/derived exactly as in the fit.

    Returns a SampleResult with per-parameter samples in physical space,
    split-chain R-hat and effective sample sizes.

    ``dispatch_chunk`` bounds the HMC iterations per device dispatch
    (chains are vmapped inside each): the default keeps every dispatch
    minutes long at most through the remote-TPU tunnel — a monolithic
    1500-iteration x 4-chain program crashed the TPU worker — at the
    cost of one tunnel sync per chunk.  Results are bit-identical for
    any chunking.

    ``fisher_sd`` (name -> standard error in PHYSICAL space, e.g.
    ``fit(..., compute_errors=True).std_errors``) preconditions the
    sampler: converted to unconstrained space through the bijection
    Jacobian at the start point, it seeds the warmup's mass metric and
    scales the over-dispersed start spread (``init_spread`` posterior
    sds instead of ``init_spread`` absolute units).  Large datasets make
    the posterior arbitrarily sharp in z, and identity-mass warmup from
    fixed-width starts then leaves chains stranded ~100 sds apart
    (measured on TPU: R-hat 7-15 at 10k tracks without this, ~1.0
    with).  Entries that are missing, zero (pinned at a bound), or
    non-finite keep the identity metric for that coordinate.
    """
    if dispatch_chunk < 1:
        raise ValueError(
            f"dispatch_chunk must be >= 1, got {dispatch_chunk}")
    if num_chains < 1:
        raise ValueError(f"num_chains must be >= 1, got {num_chains}")
    if not 0.0 <= jitter < 1.0:
        raise ValueError(f"jitter must be in [0, 1), got {jitter}")
    if params is None:
        params = tparams.generate_params(nb_states=nb_states,
                                         nb_dims=2, LocErr_type=1)
    spec = params
    batches = tdata.from_dict_bucketed(
        all_tracks, max_buckets=max_buckets, canonical_shapes=True,
        input_loc_err=input_LocErr,
        dt=dt if isinstance(dt, dict) else None)
    neg_logl = tfit.make_objective(
        batches, spec, dt if not isinstance(dt, dict) else 0.0, nb_states,
        cell_dims=cell_dims, nb_substeps=nb_substeps, window=window,
        min_len=min_len, matrix_type=matrix_type,
        input_loc_err=input_LocErr is not None, sharded=sharded)
    data = jax.device_put(neg_logl.batches)

    def potential(z, data):
        # U = -log posterior = neg_logl - log|dtheta/dz| (flat prior)
        return neg_logl(z, data) - spec.unconstrained_log_jacobian(z)

    vg = jax.value_and_grad(potential)

    z0 = jnp.asarray(spec.to_unconstrained(),
                     jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
    dim, dtype = z0.shape[0], z0.dtype
    names = spec.free_names()
    # Fisher preconditioning: physical std errors -> z-space sds via the
    # per-coordinate bijection Jacobian at z0 (sd_z = sd_theta/|dtheta/dz|),
    # computed HOST-SIDE in closed form (the same cases as
    # params._logdet_from_z) — a per-parameter eager jax.grad here would
    # cost one un-jitted device dispatch each through the TPU tunnel
    sd_z = np.ones(dim)
    if fisher_sd:
        z0_np = np.asarray(z0, np.float64)
        for i, n in enumerate(names):
            se = fisher_sd.get(n)
            if se is None or not np.isfinite(se) or se <= 0:
                continue
            p = spec._params[n]
            lo, hi, zi = p.min, p.max, z0_np[i]
            if np.isinf(lo) and np.isinf(hi):
                g = 1.0
            elif np.isinf(hi):
                g = np.exp(zi)
            elif np.isinf(lo):
                g = np.exp(-zi)
            else:
                sig = np.clip(1.0 / (1.0 + np.exp(-zi)),
                              1e-14, 1.0 - 1e-14)
                g = (hi - lo) * sig * (1.0 - sig)
            if np.isfinite(g) and g > 0:
                sd_z[i] = float(np.clip(se / g, 1e-12, 1e6))
    sd_zj = jnp.asarray(sd_z, dtype)
    keys = jnp.stack([jax.random.PRNGKey(seed + 1000003 * c)
                      for c in range(num_chains)])
    # over-dispersed starts: jitter the init per chain (in posterior sds
    # when preconditioned)
    jit_keys, keys = jax.vmap(jax.random.split, out_axes=1)(keys)
    z_starts = z0 + init_spread * sd_zj * jax.vmap(
        lambda k: jax.random.normal(k, z0.shape, dtype=z0.dtype))(jit_keys)

    # All chains run vmapped inside each dispatch (a per-chain Python
    # loop would pay the ~28 ms tunnel sync per chain and serialize what
    # the TPU can batch): data broadcast, chain state mapped.  Long runs
    # are split into <= dispatch_chunk-iteration dispatches — the carry
    # (chain state + dual-averaging stats) rides across them bit-
    # identically, and phase boundaries (eps_bar, variance -> mass)
    # compute host-side from one small fetch.  A monolithic multi-
    # thousand-iteration program crashed the remote TPU worker (see
    # _hmc_kernels), and chunking costs one tunnel sync per chunk.
    warm_chunk, samp_chunk = _hmc_kernels(
        vg, n_leapfrog=n_leapfrog, target_accept=target_accept,
        jitter=jitter, dim=dim, dtype=dtype)
    wjits, sjits = {}, {}

    def run_warm(carry, inv_mass_c, mu_c, collect_from, total):
        # fixed chunk shape per phase (min(chunk, total)); the final
        # partial chunk runs the SAME program with its tail masked, so
        # remainders never cost a fresh remote compile
        steps = min(dispatch_chunk, total)
        f = wjits.get(steps)
        if f is None:
            f = jax.jit(jax.vmap(
                functools.partial(warm_chunk, steps=steps),
                in_axes=(0, None, 0, 0, None, None, None)))
            wjits[steps] = f
        done = 0
        while done < total:
            carry = f(carry, data, inv_mass_c, mu_c,
                      jnp.asarray(collect_from, dtype),
                      jnp.asarray(total, dtype),
                      jnp.asarray(done, dtype))
            done += steps
        return carry

    def warm_phase(z, u, key, inv_mass_c, steps, eps0_c, collect_from):
        log_eps0 = jnp.log(eps0_c)
        zs_ = jnp.zeros((num_chains,), dtype)
        zd = jnp.zeros((num_chains, dim), dtype)
        carry = (z, u, key, log_eps0, log_eps0, zs_, zd, zd, zs_)
        mu_c = jnp.log(10.0) + log_eps0
        carry = run_warm(carry, inv_mass_c, mu_c, collect_from, steps)
        c = jax.device_get(carry)
        eps_bar = np.exp(c[4])
        nn = np.maximum(c[8], 2.0)[:, None]
        var = np.maximum(c[7] / nn - (c[6] / nn) ** 2, 0.0)
        return carry[0], carry[1], carry[2], eps_bar, var

    u0 = jax.jit(jax.vmap(lambda z, d: vg(z, d)[0],
                          in_axes=(0, None)))(z_starts, data)
    steps_a = max(2 * num_warmup // 3, 1)
    steps_b = max(num_warmup - steps_a, 1)
    # (key, ka = split(key); phase A consumes ka, the scans evolve it —
    # same stream as the pre-chunking monolithic chain)
    _, ka = jax.vmap(jax.random.split, out_axes=1)(keys)
    # phase A starts from the Fisher metric (identity when none given):
    # inv_mass tracks the posterior VARIANCE, so seed it with sd_z^2
    z, u, keyc, eps_a, var = warm_phase(
        z_starts, u0, ka,
        jnp.broadcast_to(sd_zj * sd_zj, (num_chains, dim)), steps_a,
        jnp.full((num_chains,), init_step, dtype), steps_a // 2)
    inv_mass_c = jnp.asarray(np.clip(var, 1e-6, 1e6), dtype)
    z, u, keyc, eps_np, _ = warm_phase(z, u, keyc, inv_mass_c, steps_b,
                                       jnp.asarray(eps_a, dtype),
                                       steps_b + 1)
    epss = jnp.asarray(eps_np, dtype)

    zs_parts, alpha_parts = [], []
    carry = (z, u, keyc)
    steps = min(dispatch_chunk, num_samples)
    f = sjits.get(steps)
    if f is None:
        f = jax.jit(jax.vmap(
            functools.partial(samp_chunk, steps=steps),
            in_axes=(0, None, 0, 0, None, None)))
        sjits[steps] = f
    done = 0
    while done < num_samples:
        carry, (zs_c, al_c) = f(carry, data, epss, inv_mass_c,
                                jnp.asarray(num_samples, dtype),
                                jnp.asarray(done, dtype))
        real = min(steps, num_samples - done)   # drop masked tail rows
        zs_parts.append(np.asarray(zs_c)[:, :real])
        alpha_parts.append(np.asarray(al_c)[:, :real])
        done += steps
    zs = np.concatenate(zs_parts, axis=1)      # (chains, samples, dim)
    accs = np.mean(np.concatenate(alpha_parts, axis=1), axis=1)
    inv_mass = jnp.mean(inv_mass_c, axis=0)
    if verbose:
        for c in range(num_chains):
            print(f"chain {c}: acceptance {float(accs[c]):.2f}, "
                  f"step size {float(epss[c]):.3g}")

    z_arr = np.asarray(zs)                       # (chains, samples, dim)
    # constrained-space samples per free parameter
    samples: Dict[str, np.ndarray] = {}
    for i, n in enumerate(names):
        p = spec._params[n]
        samples[n] = np.asarray(
            tparams._from_z(jnp.asarray(z_arr[..., i]), p.min, p.max))
    rhat = {n: _split_rhat(samples[n]) for n in names}
    ess = {n: _ess(samples[n]) for n in names}
    return SampleResult(samples=samples,
                        accept_rate=float(np.mean(accs)),
                        step_size=float(np.mean(epss)),
                        mass=np.asarray(1.0 / np.maximum(
                            np.asarray(inv_mass), 1e-300)),
                        rhat=rhat, ess=ess)
