"""Maximum-likelihood fitting drivers.

The reference minimizes the negative log likelihood with lmfit BFGS over
finite-difference gradients — (n_params+1) objective evaluations per gradient
(extrack/tracking.py:1299-1387).  Here the whole objective (parameter
constraint graph -> model tables -> scan engine -> psum) is differentiable,
so one jitted value_and_grad replaces the finite-difference stencil, and
L-BFGS-B runs on exact gradients.  Parameter bounds are honored through the
sigmoid bijection in extrack_tpu.params (lmfit applies the equivalent Minuit
transform internally).

Also provides Fisher-information uncertainties via ``jax.hessian`` — the
reference does this only manually in its tutorial notebook (SURVEY.md item 9).
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Dict, Optional

import numpy as np
import scipy.optimize

import jax
import jax.numpy as jnp

from extrack_tpu import data as tdata
from extrack_tpu import params as tparams
from extrack_tpu.core import engine, tables
from extrack_tpu.parallel import mesh as pmesh


@dataclasses.dataclass
class FitResult:
    params: tparams.Parameters
    logl: float
    success: bool
    n_evals: int
    message: str
    history: list
    std_errors: Optional[Dict[str, float]] = None
    residual: float = 0.0          # -logL, lmfit-style

    def __repr__(self):
        lines = [f"FitResult(logL={self.logl:.4f}, success={self.success}, "
                 f"evals={self.n_evals})"]
        for name, p in self.params.items():
            err = ""
            if self.std_errors and name in self.std_errors:
                err = f" +/- {self.std_errors[name]:.4g}"
            lines.append(f"  {name} = {p.value:.6g}{err}")
        return "\n".join(lines)


def default_window(nb_states: int, nb_substeps: int = 1) -> int:
    """Per-state-count fitting window: 6 / 5 / 4 / 3 for 2 / 3 / 4 / >=5
    states — the reference's own step-down pattern (its tutorial fits use
    frame_len=6, 5, 4 for 2, 3, 4 states; Tutorial_ExTrack.ipynb cells at
    lines 807 and 1457, GUI default ExTrack_GUI.py:1212).  K = S**window
    stays in the low hundreds, which keeps every state count inside the
    Pallas kernels' VMEM envelope (2: K=64, 3: 243, 4: 256, 5: 125)."""
    w = 6 if nb_states <= 2 else 5 if nb_states == 3 else \
        4 if nb_states == 4 else 3
    return max(w, nb_substeps + 1)


def make_objective(batch,
                   spec: tparams.Parameters,
                   dt,
                   nb_states: int,
                   cell_dims=(1.0,),
                   nb_substeps: int = 1,
                   window: Optional[int] = None,
                   min_len: Optional[int] = None,
                   matrix_type: int = 1,
                   input_loc_err: bool = False,
                   pallas_block: Optional[int] = None,
                   sharded: bool = False,
                   compute_engine: str = "auto") -> Callable:
    """Build -logL(z) over unconstrained free-parameter vector z.

    ``batch`` is a TrackBatch or a list of them (length buckets from
    data.from_dict_bucketed); bucket contributions sum inside one jit.
    Mirrors cum_Proba_Cs (extrack/tracking.py:991-1088): parameter extraction
    happens inside the objective so its gradient flows; ``min_len`` defaults
    to the shortest track length present in the dataset (tracking.py:1009).

    compute_engine: 'auto' uses the Pallas custom-VJP kernel for value and
    gradient on TPU (constant or per-track dt, unsharded); 'xla' /
    'pallas' force a path.
    """
    if window is None:
        window = default_window(nb_states, nb_substeps)
    batches = batch if isinstance(batch, (list, tuple)) else [batch]
    if min_len is None:
        lens = np.concatenate([tdata.host_lengths(b) for b in batches])
        min_len = tdata.default_min_len(lens)
    mesh = None
    if sharded:
        mesh = pmesh.make_mesh()
        batches = [pmesh.shard_batch(b, mesh) for b in batches]

    def _pallas_ok(b):
        from extrack_tpu.ops import pallas_grad
        dt_ok = (b.dt is None
                 or (np.ndim(b.dt) == 2
                     and b.dt.shape[1] == b.max_len - 1))
        return (dt_ok and pallas_grad.supports(
            b.max_len, b.nb_dims, nb_states, window, nb_substeps))

    if compute_engine == "auto":
        # decided per length bucket: long-track buckets exceed the grad
        # kernel's VMEM carry budget and take the XLA engine instead.
        # Sharded fits run the same kernel per shard inside shard_map.
        pallas_batches = [jax.default_backend() == "tpu" and _pallas_ok(b)
                          for b in batches]
    else:
        pallas_batches = [compute_engine == "pallas"] * len(batches)

    # static per-bucket facts decided at build time.  has_len2 must come
    # from the original batches here: np_lengths is a host-side cache that
    # does not survive pytree flatten/unflatten (jax.device_put drops it),
    # so computing it from the runtime ``data`` would silently pin the
    # kernels to the conservative has_len2=True variant on the main fit
    # path — and disagree with the trace signature below.
    has_len2s = [bool((np.asarray(b.np_lengths) == 2).any())
                 if getattr(b, "np_lengths", None) is not None else True
                 for b in batches]

    def core(z, bs):
        # the data-as-argument objective body: deliberately closes over no
        # track arrays, so jitted artifacts cached across objectives
        # (_shared_jit / _JIT_CACHE) never retain a dataset
        values = spec.resolve(spec.from_unconstrained(z))
        total = 0.0
        Fs = None
        for b, use_pallas, has_len2 in zip(bs, pallas_batches, has_len2s):
            loc_err_input = b.loc_err if input_loc_err else None
            Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
                values, nb_states, input_loc_err=loc_err_input)
            dt_arr = b.dt if b.dt is not None else jnp.asarray(dt)
            tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                                     cell_dims=cell_dims,
                                     nb_substeps=nb_substeps,
                                     matrix_type=matrix_type)
            if sharded:
                total = total + pmesh.sharded_log_likelihood(
                    b, tb, window=window, nb_substeps=nb_substeps,
                    min_len=min_len, mesh=mesh,
                    compute_engine="pallas" if use_pallas else "xla",
                    has_len2=has_len2)
            elif use_pallas:
                from extrack_tpu.ops import pallas_grad
                total = total - pallas_grad.neg_log_likelihood(
                    b.positions, b.lengths, b.is_bleached, tb,
                    window=window, nb_substeps=nb_substeps,
                    min_len=min_len, block=pallas_block or 512,
                    has_len2=has_len2)
            else:
                total = total + jnp.sum(engine.forward(
                    b.positions, b.lengths, b.is_bleached, tb,
                    window=window, nb_substeps=nb_substeps,
                    min_len=min_len))
        # reference validity guard (tracking.py:1017): the derived last
        # fraction F_last = 1 - sum(F_i) can go negative at >= 3 states
        # (each free F is bounded, their SUM is not).  log(F < 0) used to
        # surface as NaN and trip the drivers' non-finite guard by
        # accident; build_tables' finite log floor now keeps such a prior
        # silently UNNORMALIZED (inflating logL by B*log(sum F)) — reject
        # the region explicitly instead.
        neg = -total
        return jnp.where(jnp.all(Fs >= 0.0), neg,
                         jnp.asarray(jnp.inf, neg.dtype))

    def neg_logl(z, data=None):
        # ``data`` lets callers pass the track batches as jit ARGUMENTS
        # (fit() does): with them closed over instead, every compiled
        # program embeds the dataset as constants — a 10^6-track fit's
        # cached executable was 215MB (860MB for the on-device L-BFGS
        # loop), and shipping that to the accelerator per process cost
        # minutes.  Single-arg calls keep working for hand-held use.
        return core(z, batches if data is None else data)

    neg_logl.batches = batches        # fit() passes these as arguments
    neg_logl.core = core              # dataset-free body for shared jits
    neg_logl.uses_pallas = any(pallas_batches)
    # per-bucket facts + resolved defaults, consumed by the exact-HVP
    # Fisher path (hessian_hvp_exact must rebuild the SAME per-bucket
    # kernel configuration the objective ran)
    neg_logl.pallas_batches = list(pallas_batches)
    neg_logl.has_len2s = list(has_len2s)
    neg_logl.resolved_window = window
    neg_logl.resolved_min_len = min_len
    neg_logl.is_sharded = sharded
    # Everything the closure BAKES into a trace (the track arrays ride as
    # arguments, so they are deliberately absent): two objectives with equal
    # signatures lower to identical programs, letting drivers reuse jitted
    # artifacts instead of paying a re-trace + Mosaic re-lowering (~10 s
    # host-side) per independently-built fit — e.g. every state count
    # repeat in a model-selection scan, or per-FOV fits of equal shape.
    dt_sig = (np.asarray(dt).shape, np.asarray(dt, np.float64).tobytes())
    neg_logl.trace_signature = (
        spec.trace_signature(), dt_sig, nb_states, tuple(cell_dims),
        nb_substeps, window, min_len, matrix_type, bool(input_loc_err),
        bool(sharded), None if mesh is None else len(mesh.devices.ravel()),
        tuple(pallas_batches), jax.default_backend(), tuple(has_len2s))
    return neg_logl


# jitted artifacts shared across objectives with equal trace signatures;
# keyed on (kind, signature).  Bounded in practice by the number of distinct
# fit configurations a process runs.
_JIT_CACHE: Dict = {}


def _shared_jit(neg_logl: Callable, kind, build: Callable):
    """Return a cached jitted artifact for this objective's trace signature,
    building (and caching) it on first use.  Correct because the signature
    covers every constant the closure bakes into its trace; jax.jit itself
    re-specializes if the *argument* shapes differ."""
    sig = getattr(neg_logl, "trace_signature", None)
    if sig is None:
        return build()
    key = (kind, sig)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = build()
    return fn


def run_lbfgs_device(neg_logl: Callable, z0, *, data=None,
                     max_iter: int = 500,
                     ftol: float = 2.2e-9, gtol: float = 1e-6):
    """L-BFGS entirely on device: one jitted ``lax.while_loop`` with a zoom
    linesearch (optax), so a whole fit is a single dispatch.

    The scipy driver round-trips value+gradient to the host every
    evaluation — ~2 syncs x ~60 evals; on a remote or busy accelerator that
    latency dominates small fits.  Bounds are already handled by the
    sigmoid bijections (the objective is over unconstrained z), so plain
    L-BFGS suffices.  Returns ``(z, value, n_iters)`` (host scalars).
    """
    import optax
    import optax.tree_utils as otu

    # Rebuilding the jitted loop per call costs a full re-trace + Mosaic
    # re-lowering (~10 s host time for the 4-bucket Pallas objective), and
    # the loop program itself is the most expensive one in the package to
    # compile (the zoom linesearch instantiates the objective several
    # times: 50-200 s through the remote-compile tunnel).  So (a)
    # max_iter/ftol/gtol ride as DYNAMIC arguments — one program per
    # objective trace signature, shared across every setting of the knobs —
    # and (b) the program is memoized per objective always, and across
    # objectives with equal trace signatures when the data rides as an
    # argument (with data=None the closed-over arrays are baked into the
    # trace, so sharing would alias datasets).
    cache_key = (data is None,)
    cached = getattr(neg_logl, "_lbfgs_runs", None)
    if cached is None:
        cached = neg_logl._lbfgs_runs = {}
    run = cached.get(cache_key)
    if run is None and data is not None:
        run = _JIT_CACHE.get((("run",) + cache_key,
                              getattr(neg_logl, "trace_signature", object())))
    if run is None:
        opt = optax.lbfgs()
        # the data-as-argument variant is cached across objectives in
        # _JIT_CACHE, so it must close over the dataset-free core only —
        # retaining neg_logl would pin its closed-over batches for the
        # process lifetime
        if data is None:
            base = lambda z, _: neg_logl(z)          # noqa: E731
        else:
            base = getattr(neg_logl, "core", None) or neg_logl

        @jax.jit
        def run(z0, data, max_iter, ftol, gtol):
            fn = lambda z: base(z, data)             # noqa: E731
            value_and_grad = optax.value_and_grad_from_state(fn)

            def step(carry):
                z, state, _ = carry
                value, grad = value_and_grad(z, state=state)
                updates, state = opt.update(grad, state, z, value=value,
                                            grad=grad, value_fn=fn)
                return optax.apply_updates(z, updates), state, value

            def cont(carry):
                z, state, f_prev = carry
                count = otu.tree_get(state, "count")
                grad = otu.tree_get(state, "grad")
                value = otu.tree_get(state, "value")
                small_grad = otu.tree_norm(grad) <= gtol
                rel = jnp.abs(f_prev - value) / jnp.maximum(
                    jnp.maximum(jnp.abs(value), jnp.abs(f_prev)), 1.0)
                return (count == 0) | ((count < max_iter) & ~small_grad
                                       & (rel > ftol) & jnp.isfinite(value))

            state0 = opt.init(z0)
            big = jnp.asarray(jnp.inf, z0.dtype)
            z, state, _ = jax.lax.while_loop(cont, step, (z0, state0, big))
            # the linesearch-accepted value at the final z already sits in
            # the optimizer state — re-evaluating fn(z) would pay one extra
            # full forward scan per start
            return z, otu.tree_get(state, "value"), \
                otu.tree_get(state, "count")

        if data is not None and hasattr(neg_logl, "trace_signature"):
            _JIT_CACHE[(("run",) + cache_key, neg_logl.trace_signature)] = run
    cached[cache_key] = run
    z, value, iters = run(jnp.asarray(z0), data, jnp.asarray(max_iter),
                          jnp.asarray(ftol), jnp.asarray(gtol))
    return np.asarray(z), float(value), int(iters)


def device_lbfgs_ready(neg_logl: Callable, data=None) -> bool:
    """True when the on-device L-BFGS program for this objective is already
    built in-process (so dispatching it costs no trace/compile)."""
    if (getattr(neg_logl, "_lbfgs_runs", None)
            and (data is None,) in neg_logl._lbfgs_runs):
        return True
    return (data is not None
            and (("run", False), getattr(neg_logl, "trace_signature",
                                         object())) in _JIT_CACHE)


def fit(batch: tdata.TrackBatch,
        spec: tparams.Parameters,
        dt,
        nb_states: int,
        cell_dims=(1.0,),
        nb_substeps: int = 1,
        window: Optional[int] = None,
        min_len: Optional[int] = None,
        matrix_type: int = 1,
        input_loc_err: bool = False,
        method: str = "L-BFGS-B",
        verbose: int = 0,
        max_iter: int = 500,
        compute_errors: bool = False,
        sharded: bool = False,
        callback=None,
        checkpoint_path: Optional[str] = None,
        resume: bool = True,
        n_starts: int = 1,
        start_scale: float = 1.0,
        seed: int = 0,
        compute_engine: str = "auto") -> FitResult:
    """Fit the free parameters of ``spec`` to a TrackBatch.

    callback: called as ``callback(n_eval, objective, values)`` per
        evaluation (see utils.observe.FitRecorder).
    checkpoint_path: JSON checkpoint written on every improvement; with
        ``resume=True`` an existing checkpoint warm-starts the fit.
    n_starts: multi-start optimization — run L-BFGS from the given initial
        values plus ``n_starts-1`` perturbed restarts (scale ``start_scale``
        in unconstrained space) and keep the best optimum.  Multi-state
        likelihoods are multi-modal; the reference has no equivalent guard.
    """
    if window is None:
        window = default_window(nb_states, nb_substeps)
    if checkpoint_path and resume:
        from extrack_tpu.utils.observe import CheckpointManager
        state = CheckpointManager(checkpoint_path).load()
        if state is not None:
            spec = spec.copy()
            spec.set_values(state["values"])
    # keyword args from here on: make_objective grew ``pallas_block``
    # BEFORE ``sharded`` in round 4 and this (then-positional) call kept
    # passing sharded into pallas_block and compute_engine ("auto",
    # truthy!) into sharded — every fit() silently ran the shard_map path
    # on a 1-device mesh and the exact-HVP Fisher path always fell back
    # to finite differences (it refuses sharded objectives)
    neg_logl = make_objective(batch, spec, dt, nb_states, cell_dims,
                              nb_substeps, window, min_len, matrix_type,
                              input_loc_err, sharded=sharded,
                              compute_engine=compute_engine)
    # track data rides as jit arguments — closed-over data gets baked into
    # the executable as constants (a 10^6-track fit's cached executable was
    # 215-860MB).  Host arrays go to the device ONCE here; already-sharded
    # device arrays pass through untouched.
    data = jax.device_put(neg_logl.batches)   # no-op for committed arrays
    vg2 = _shared_jit(neg_logl, "vg",
                      lambda: jax.jit(jax.value_and_grad(neg_logl.core)))
    vg = lambda z: vg2(z, data)    # noqa: E731
    z0 = spec.to_unconstrained()
    history = []
    n_evals = [0]
    best = [np.inf]
    ckpt = None
    if checkpoint_path:
        from extrack_tpu.utils.observe import CheckpointManager
        ckpt = CheckpointManager(checkpoint_path)

    def fun(z):
        v, g = jax.device_get(vg(jnp.asarray(z)))   # one sync for both
        v = float(v)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            # out-of-domain guard, mirrors the reference's inf objective
            # (extrack/tracking.py:1078-1086)
            return 1e300, np.zeros_like(g)
        n_evals[0] += 1
        history.append(v)
        if callback or ckpt or verbose:
            vals = spec.resolve(spec.from_unconstrained(z))
            if callback:
                callback(n_evals[0], v, vals)
            if ckpt and v < best[0]:
                best[0] = v
                ckpt.save(vals, v, n_evals[0])
            if verbose:
                q = {k: float(np.round(np.asarray(v2), 6))
                     for k, v2 in vals.items()}
                print(-v, q)
        return v, g

    # gradient-free methods (the reference GUI's first iteration uses
    # Powell, ExTrack_GUI.py:298) get a value-only objective
    grad_free = method.lower() in ("powell", "nelder-mead", "cobyla")
    # the host driver syncs value+grad twice per evaluation; when nobody
    # watches per-eval state, the whole L-BFGS loop can run on device
    # instead (one dispatch per start — latency-proof on remote/busy
    # accelerators).  But the loop PROGRAM is the most expensive one in
    # the package to build (the zoom linesearch instantiates the objective
    # several times; 50-200 s to compile/load through the remote tunnel vs
    # ~3 s for the plain value_and_grad program), so auto mode only takes
    # it when the program already exists in-process; ``method=
    # "device-lbfgs"`` opts in explicitly (worth it for fleets of
    # same-shaped fits).  The zoom linesearch also evaluates the objective
    # several times per iteration, which loses on compute-bound
    # multi-million-position datasets where scipy's ~1.3 evals/iter win.
    batches_n = batch if isinstance(batch, (list, tuple)) else [batch]
    n_positions = sum(int(b.batch_size) * int(b.max_len) for b in batches_n)
    on_device = (method.lower() in ("device", "device-lbfgs")
                 or (method == "L-BFGS-B"
                     and jax.default_backend() == "tpu"
                     and n_positions <= 2_000_000
                     and not (callback or checkpoint_path or verbose)
                     and device_lbfgs_ready(neg_logl, data)))
    if grad_free:
        def run_opt(z_init):
            return scipy.optimize.minimize(
                lambda z: fun(z)[0], z_init, method=method,
                options={"maxiter": max_iter})
    elif on_device:
        if callback or verbose:
            import warnings
            warnings.warn(
                "method='device-lbfgs' runs the whole optimization in one "
                "dispatch: per-evaluation callback/verbose output is not "
                "available (use the default host L-BFGS-B for that)",
                stacklevel=2)

        def run_opt(z_init):
            z, value, iters = run_lbfgs_device(neg_logl, z_init, data=data,
                                               max_iter=max_iter)
            if not np.isfinite(value):      # fall back to the host driver
                return scipy.optimize.minimize(
                    fun, z_init, jac=True, method="L-BFGS-B",
                    options={"maxiter": max_iter})
            n_evals[0] += iters
            history.append(value)
            if ckpt and value < best[0]:
                best[0] = value
                ckpt.save(spec.resolve(spec.from_unconstrained(
                    jnp.asarray(z))), value, n_evals[0])
            converged = iters < max_iter    # else: iteration cap hit
            return scipy.optimize.OptimizeResult(
                x=z, fun=value, success=converged, nit=iters,
                message=("device L-BFGS converged" if converged else
                         "device L-BFGS stopped on the max_iter cap"))
    else:
        def run_opt(z_init):
            return scipy.optimize.minimize(fun, z_init, jac=True,
                                           method=method,
                                           options={"maxiter": max_iter})

    t0 = time.time()
    res = run_opt(z0)
    if n_starts > 1:
        rng = np.random.default_rng(seed)
        for _ in range(n_starts - 1):
            alt = run_opt(z0 + rng.normal(0, start_scale, z0.shape))
            if np.isfinite(alt.fun) and alt.fun < res.fun:
                res = alt
    if verbose:
        print(f"fit: {n_evals[0]} evaluations in {time.time() - t0:.2f}s")

    fitted = spec.copy()
    values = fitted.resolve(fitted.from_unconstrained(jnp.asarray(res.x)))
    fitted.set_values({k: float(np.asarray(v)) for k, v in values.items()
                       if np.ndim(v) == 0})

    std_errors = None
    if compute_errors:
        if neg_logl.uses_pallas:
            # exact second order through the Pallas path: the dual-number
            # HVP kernel (ops/pallas_hvp.py) differentiates the gradient
            # kernel's table cotangents, so each Hessian column is ONE
            # kernel dispatch (jax.jvp of the exact gradient).  Configs
            # whose dual carry history exceeds the VMEM budget fall back
            # to central differences of the exact gradients (~1e-4
            # relative).
            try:
                H = hessian_hvp_exact(
                    neg_logl.batches, spec, res.x, dt, nb_states,
                    cell_dims=cell_dims, nb_substeps=nb_substeps,
                    window=neg_logl.resolved_window,
                    min_len=neg_logl.resolved_min_len,
                    matrix_type=matrix_type,
                    input_loc_err=input_loc_err,
                    pallas_flags=neg_logl.pallas_batches,
                    has_len2s=neg_logl.has_len2s,
                    sharded=neg_logl.is_sharded)
            except NotImplementedError as exc:
                # same driver-level fallback contract predict/hist/refine
                # use: degrade, but say so (VERDICT r4 #3)
                import warnings
                warnings.warn(
                    "fit(compute_errors=True): exact HVP unavailable for "
                    f"this configuration ({exc}); using central "
                    "differences of the exact gradients (~1e-4 relative "
                    "on the Hessian).", RuntimeWarning, stacklevel=2)
                H = hessian_fd_from_gradients(
                    lambda z: vg2(z, data)[1], res.x)
        else:
            # XLA path admits exact second-order AD; logL is additive over
            # tracks, so the observed information accumulates over jitted
            # chunks: memory stays bounded at any dataset size
            batches_e = (batch if isinstance(batch, (list, tuple))
                         else [batch])
            H = hessian_chunked(batches_e, spec, res.x, dt, nb_states,
                                cell_dims=cell_dims,
                                nb_substeps=nb_substeps,
                                window=window, min_len=min_len,
                                matrix_type=matrix_type,
                                input_loc_err=input_loc_err)
        std_errors = fisher_errors_from_hessian(H, fitted, res.x)

    return FitResult(params=fitted, logl=-float(res.fun),
                     success=bool(res.success), n_evals=n_evals[0],
                     message=str(res.message), history=history,
                     std_errors=std_errors, residual=float(res.fun))


def hessian_hvp_exact(batches, spec: tparams.Parameters, z_opt, dt,
                      nb_states: int, *, cell_dims=(1.0,), nb_substeps=1,
                      window=6, min_len=3, matrix_type=1,
                      input_loc_err=False, pallas_flags=None,
                      has_len2s=None, sharded=False,
                      block: int = 512) -> np.ndarray:
    """Observed-information Hessian of -logL at z_opt, EXACT through the
    Pallas kernels: column j = jax.jvp(grad_z, (z,), (e_j,)) runs the
    dual-number HVP kernel (ops/pallas_hvp.py) — one dispatch per
    parameter per bucket.  Buckets the gradient kernel did not cover run
    ``hessian_chunked`` (exact XLA second order) instead.

    Raises NotImplementedError when any Pallas bucket's dual carry
    history exceeds the VMEM budget (fit() falls back to central
    differences) or when the batches are sharded (the HVP kernel runs
    unsharded only)."""
    from extrack_tpu.ops import pallas_hvp
    if sharded:
        raise NotImplementedError("exact HVP path runs unsharded only")
    if pallas_flags is None:
        pallas_flags = [True] * len(batches)
    if has_len2s is None:
        has_len2s = [True] * len(batches)
    z = jnp.asarray(z_opt, jnp.float32)
    n = int(z.shape[0])
    H = np.zeros((n, n))
    eye = np.eye(n, dtype=np.float32)
    for b, use_pallas, has_len2 in zip(batches, pallas_flags, has_len2s):
        if not use_pallas:
            H += hessian_chunked([b], spec, z_opt, dt, nb_states,
                                 cell_dims=cell_dims,
                                 nb_substeps=nb_substeps, window=window,
                                 min_len=min_len, matrix_type=matrix_type,
                                 input_loc_err=input_loc_err)
            continue
        if not pallas_hvp.supports(b.max_len, b.nb_dims, nb_states,
                                   window, nb_substeps):
            raise NotImplementedError(
                "dual carry history exceeds the VMEM budget for "
                f"T={b.max_len}")
        dt_arr = b.dt if b.dt is not None else jnp.asarray(dt)
        loc_err_input = b.loc_err if input_loc_err else None

        def tables_fn(z_, _loc=loc_err_input, _dt=dt_arr):
            values = spec.resolve(spec.from_unconstrained(z_))
            Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
                values, nb_states, input_loc_err=_loc)
            return tables.build_tables(Ds, loc_err, Fs, rates, pBL, _dt,
                                       cell_dims=tuple(cell_dims),
                                       nb_substeps=nb_substeps,
                                       matrix_type=matrix_type)

        grad_z = pallas_hvp.make_grad_z(
            b.positions, b.lengths, b.is_bleached, tables_fn,
            window=window, nb_substeps=nb_substeps, min_len=min_len,
            block=block, has_len2=has_len2)
        hvp = jax.jit(lambda z_, v, _g=grad_z: jax.jvp(_g, (z_,), (v,))[1])
        for j in range(n):
            H[:, j] += np.asarray(hvp(z, jnp.asarray(eye[j])),
                                  dtype=np.float64)
    return 0.5 * (H + H.T)


def hessian_fd_from_gradients(grad_fn, z_opt,
                              rel_step: float = 1e-2) -> np.ndarray:
    """Observed-information Hessian from central differences of EXACT
    gradients: column j = (g(z + h e_j) - g(z - h e_j)) / 2h, symmetrized.

    ``grad_fn(z) -> grad`` must be exact (autodiff); the only error is the
    O(h^2) difference truncation plus gradient round-off / h — with f32
    Pallas gradients and h ~ 1e-2, ~1e-4 relative on the Hessian, far
    below the statistical uncertainty of the errors it feeds.  Used when
    the objective runs the Pallas custom-VJP kernel (whose backward pass
    admits no second-order AD).
    """
    z = np.asarray(z_opt, dtype=np.float64)
    n = len(z)
    H = np.zeros((n, n))
    for j in range(n):
        h = rel_step * max(1.0, abs(z[j]))
        e = np.zeros(n)
        e[j] = h
        gp = np.asarray(grad_fn(jnp.asarray(z + e)), dtype=np.float64)
        gm = np.asarray(grad_fn(jnp.asarray(z - e)), dtype=np.float64)
        H[:, j] = (gp - gm) / (2.0 * h)
    return 0.5 * (H + H.T)


def hessian_chunked(batches, spec: tparams.Parameters, z_opt, dt,
                    nb_states: int, *, cell_dims=(1.0,), nb_substeps=1,
                    window=6, min_len=3, matrix_type=1,
                    input_loc_err=False, chunk: int = 65536) -> np.ndarray:
    """Observed-information Hessian of -logL at z_opt, accumulated over
    track chunks (one jitted second-order program reused per chunk shape).

    Padded chunk rows carry length 0 and contribute exactly zero, so the
    sum equals the full-batch Hessian while memory stays O(chunk).
    """
    z = jnp.asarray(z_opt)
    if min_len is None:
        lens = np.concatenate([tdata.host_lengths(b) for b in batches])
        min_len = tdata.default_min_len(lens)

    @functools.partial(jax.jit, static_argnames=("use_loc_err",))
    def chunk_hess(z, pos, lens, isbl, loc_err_b, dt_arr, use_loc_err):
        def nl(z):
            values = spec.resolve(spec.from_unconstrained(z))
            Ds, Fs, rates, loc_err, pBL = tparams.extract_arrays(
                values, nb_states,
                input_loc_err=loc_err_b if use_loc_err else None)
            tb = tables.build_tables(Ds, loc_err, Fs, rates, pBL, dt_arr,
                                     cell_dims=tuple(cell_dims),
                                     nb_substeps=nb_substeps,
                                     matrix_type=matrix_type)
            return -jnp.sum(engine.forward(
                pos, lens, isbl, tb, window=window,
                nb_substeps=nb_substeps, min_len=min_len))
        return jax.hessian(nl)(z)

    H = np.zeros((len(z), len(z)))
    for b in batches:
        bb = b
        if bb.batch_size > chunk:
            bb = bb.pad_batch_to(
                int(np.ceil(bb.batch_size / chunk)) * chunk)
        n_chunks = max(1, bb.batch_size // min(chunk, bb.batch_size))
        step_b = bb.batch_size // n_chunks
        dt_arr = bb.dt if bb.dt is not None else jnp.asarray(dt)
        for c in range(n_chunks):
            sl = slice(c * step_b, (c + 1) * step_b)
            H += np.asarray(chunk_hess(
                z, bb.positions[sl], bb.lengths[sl], bb.is_bleached[sl],
                bb.loc_err[sl] if (input_loc_err and bb.loc_err is not None)
                else None,
                dt_arr[sl] if dt_arr.ndim > 1 else dt_arr,
                use_loc_err=input_loc_err and bb.loc_err is not None),
                dtype=np.float64)
    return H


def fisher_errors_from_hessian(H: np.ndarray, spec: tparams.Parameters,
                               z_opt) -> Dict[str, float]:
    """Standard errors of the free natural parameters from a Hessian in
    unconstrained space: cov = J H^-1 J^T with J the bijection Jacobian."""
    z_opt = jnp.asarray(z_opt)

    def natural(z):
        vals = spec.from_unconstrained(z)
        return jnp.stack([vals[n] * jnp.ones(()) for n in spec.free_names()])

    J = np.asarray(jax.jacfwd(natural)(z_opt), dtype=np.float64)
    try:
        cov_z = np.linalg.inv(H)
    except np.linalg.LinAlgError:
        cov_z = np.linalg.pinv(H)
    cov = J @ cov_z @ J.T
    var = np.clip(np.diag(cov), 0.0, np.inf)
    return {n: float(np.sqrt(v)) for n, v in zip(spec.free_names(), var)}


def fisher_errors(neg_logl, spec: tparams.Parameters, z_opt) -> Dict[str, float]:
    """Parameter standard errors from the inverse observed Fisher information.

    The covariance of the free *natural* parameters is J H^-1 J^T with H the
    Hessian in unconstrained space and J the bijection Jacobian at the
    optimum.  Replaces the tutorial-notebook finite-difference Hessian
    (SURVEY.md section 0, capability 9).  For large datasets prefer
    ``hessian_chunked`` + ``fisher_errors_from_hessian`` (what fit() uses).
    """
    z_opt = jnp.asarray(z_opt)
    H = np.asarray(jax.hessian(neg_logl)(z_opt), dtype=np.float64)
    return fisher_errors_from_hessian(H, spec, z_opt)


# ---------------------------------------------------------------------------
# Reference-compatible driver
# ---------------------------------------------------------------------------

def param_fitting(all_tracks,
                  dt,
                  params: Optional[tparams.Parameters] = None,
                  nb_states: int = 2,
                  nb_substeps: int = 1,
                  frame_len: Optional[int] = None,
                  verbose: int = 1,
                  workers: int = 1,
                  Matrix_type: int = 1,
                  method: str = "L-BFGS-B",
                  steady_state: bool = False,
                  cell_dims=(1.0,),
                  input_LocErr=None,
                  threshold: float = 0.2,
                  max_nb_states: int = 120,
                  compute_errors: bool = False,
                  sharded: bool = False,
                  length_buckets: int = 4,
                  **fit_kwargs) -> FitResult:
    """Drop-in style equivalent of the reference param_fitting
    (extrack/tracking.py:1299-1387).

    ``all_tracks`` is the length-keyed dict format.  ``workers``,
    ``threshold`` and ``max_nb_states`` are accepted for API compatibility:
    data parallelism is the device mesh (not a fork pool), and the engine's
    fixed window (``frame_len``) replaces the CPU-era threshold pruning
    (SURVEY.md section 7.3).  ``frame_len`` defaults per state count
    (``default_window``: 6/5/4/3 for 2/3/4/5+ states, the reference
    tutorials' own step-down pattern), keeping every model inside the
    Pallas kernels' VMEM envelope out of the box.
    """
    del workers, threshold, max_nb_states
    if params is None:
        params = tparams.generate_params(
            nb_states=nb_states, LocErr_type=1, LocErr_bounds=(0.005, 0.1),
            D_max=3.0, estimated_transition_rates=0.1,
            steady_state=steady_state)
    batch = tdata.from_dict_bucketed(
        all_tracks, max_buckets=max(1, length_buckets),
        canonical_shapes=True,          # quantized program shapes: fresh
        input_loc_err=input_LocErr,     # processes reuse cached TPU
        dt=dt if isinstance(dt, dict) else None)  # executables
    return fit(batch, params,
               dt if not isinstance(dt, dict) else 0.0, nb_states,
               cell_dims=cell_dims, nb_substeps=nb_substeps,
               window=frame_len, matrix_type=Matrix_type, method=method,
               verbose=verbose, input_loc_err=input_LocErr is not None,
               compute_errors=compute_errors, sharded=sharded,
               **fit_kwargs)
