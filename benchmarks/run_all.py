"""Benchmark suite: the driver-defined configs from BASELINE.md.

1. 2-state fit on the reference fixture Tutorials/example_tracks.csv
2. predict_Bs + duration histograms
3. 3-state fit with nb_substeps=2
4. 2-state position refinement
5. 10^6-track simulated-FOV fit (sharded over the available mesh)
6. model-selection scan 2->4 states on 5000 x 10-frame tracks
   (the reference tutorial quotes "around a day" for this, md cell 49)

Writes benchmarks/results.json and prints one line per config.
Run on TPU: python benchmarks/run_all.py [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax

RESULTS = {}


def timed(name, repeat_warm=True):
    """Time fn twice: wall_cold_s includes first-call jit compilation /
    cache loads, wall_warm_s is the steady-state repeat."""
    def deco(fn):
        def run(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            cold = time.perf_counter() - t0
            rec = {"wall_cold_s": round(cold, 3), **(out or {})}
            if repeat_warm and not os.environ.get("EXTRACK_BENCH_NO_WARM"):
                t0 = time.perf_counter()
                fn(*a, **kw)
                rec["wall_warm_s"] = round(time.perf_counter() - t0, 3)
            RESULTS[name] = rec
            print(f"{name}: cold {cold:.2f}s "
                  f"warm {rec.get('wall_warm_s', float('nan'))}s "
                  f"{out or ''}", flush=True)
            return out
        return run
    return deco


FIXTURE = "/root/reference/Tutorials/example_tracks.csv"


def prep_fit_fixture():
    from extrack_tpu.io import readers
    tracks, _, _ = readers.read_table(FIXTURE, lengths=np.arange(5, 12))
    return tracks


@timed("fit_2state_example_tracks")
def bench_fit_fixture(tracks):
    from extrack_tpu import fit
    res = fit.param_fitting(tracks, 0.02, nb_states=2, frame_len=6,
                            cell_dims=(1.0,), verbose=0)
    return {"logL": round(res.logl, 3), "n_evals": res.n_evals,
            "D1": round(res.params["D1"].value, 5)}


def _sim(n_tracks, seed=1, max_len=12):
    from extrack_tpu import simulate
    return simulate.sim_fov(
        nb_tracks=n_tracks, max_track_len=max_len, min_track_len=3,
        LocErr=0.02, Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]),
        dt=0.02, pBL=0.05, cell_dims=(0.5, None, None), seed=seed)


@timed("predict_and_histograms_20k")
def bench_predict_hist(tracks):
    from extrack_tpu import histograms, params as xp, predict
    spec = xp.generate_params(nb_states=2, estimated_LocErr=[0.02],
                              estimated_Ds=[0.0, 0.08],
                              estimated_Fs=[0.5, 0.5],
                              estimated_transition_rates=0.1)
    preds = predict.predict_Bs(tracks, 0.02, spec, cell_dims=(0.5,),
                               nb_states=2, frame_len=5)
    hist = histograms.len_hist(tracks, spec, 0.02, cell_dims=(0.5,),
                               nb_states=2, max_nb_states=256)
    n_pos = sum(v.shape[0] * v.shape[1] for v in tracks.values())
    return {"n_tracks": sum(v.shape[0] for v in tracks.values()),
            "n_positions": n_pos,
            "hist_total": round(float(hist.sum()), 1)}


def prep_3state(n):
    from extrack_tpu import simulate
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=n, max_track_len=10, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.03, 0.3), nb_dims=2,
        TrMat=np.array([[.85, .1, .05], [.1, .85, .05], [.05, .1, .85]]),
        dt=0.02, pBL=0.05, cell_dims=(0.5, None, None), seed=3)
    return tracks


@timed("fit_3state_substeps2_5k")
def bench_3state(tracks):
    from extrack_tpu import data as tdata, fit, params as xp
    spec = xp.generate_params(nb_states=3, LocErr_type=1, D_max=3.0,
                              estimated_Ds=[0.001, 0.03, 0.2],
                              estimated_transition_rates=0.08)
    res = fit.fit(tdata.from_dict(tracks), spec, 0.02, 3, cell_dims=(0.5,),
                  nb_substeps=2, window=4, verbose=0)
    return {"logL": round(res.logl, 1), "n_evals": res.n_evals,
            "success": bool(res.success)}


def prep_refine_large(n):
    from extrack_tpu import simulate
    batches, _ = simulate.sim_fov_batch(
        nb_tracks=n, max_track_len=10, min_track_len=3,
        LocErr=0.02, Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]),
        dt=0.02, pBL=0.05, cell_dims=(0.5, None, None), seed=7)
    jax.block_until_ready([b.positions for b in batches])
    return batches


@timed("refine_2state_1M")
def bench_refine_large(batches):
    """Production-scale refinement through the Pallas kernel."""
    from extrack_tpu.ops import pallas_refine
    import jax.numpy as jnp
    log_trans = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9]], jnp.float32))
    sig2 = jnp.asarray(2 * np.array([0.0, 0.08]) * 0.02, jnp.float32)
    le2 = jnp.asarray(0.02 ** 2, jnp.float32)[None, None, None]
    n_tracks = 0
    for b in batches:
        mu, sig = pallas_refine.refine_pallas(
            b.positions, b.lengths, le2, log_trans, sig2, window=7,
            interpret=jax.default_backend() != "tpu")
        mu.block_until_ready()
        n_tracks += b.batch_size
    return {"n_tracks": n_tracks}


@timed("refine_2state_10k")
def bench_refine(tracks):
    from extrack_tpu import refine
    Ds = np.array([0.0, 0.08])
    tr = np.array([[0.9, .1], [.1, .9]])
    mus, sigmas = refine.position_refinement(
        tracks, 0.02, np.sqrt(2 * Ds * 0.02), np.array([.5, .5]), tr,
        frame_len=5)
    n_pos = sum(v.shape[0] * v.shape[1] for v in mus.values())
    return {"n_positions": n_pos,
            "mean_sigma": round(float(np.mean(
                np.concatenate([s.ravel() for s in sigmas.values()]))), 5)}


@timed("fit_1M_tracks_sim_fov")
def bench_million(quick, n=1_000_000):
    from extrack_tpu import fit, params as xp, simulate
    if quick:
        n = 100_000
    t0 = time.perf_counter()
    # on-device simulation: data never leaves the accelerator
    batches, _ = simulate.sim_fov_batch(
        nb_tracks=n, max_track_len=10, min_track_len=3,
        LocErr=0.02, Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]),
        dt=0.02, pBL=0.05, cell_dims=(0.5, None, None), seed=5)
    jax.block_until_ready([b.positions for b in batches])
    sim_t = time.perf_counter() - t0
    n_tracks = sum(b.batch_size for b in batches)
    spec = xp.generate_params(nb_states=2, LocErr_type=1, D_max=1.0,
                              estimated_Ds=[0.005, 0.05],
                              estimated_transition_rates=0.08)
    t0 = time.perf_counter()
    res = fit.fit(batches, spec, 0.02, 2, cell_dims=(0.5,), window=5,
                  verbose=0, sharded=len(jax.devices()) > 1)
    fit_t = time.perf_counter() - t0
    return {"n_tracks": n_tracks, "sim_s": round(sim_t, 2),
            "fit_s": round(fit_t, 2), "n_evals": res.n_evals,
            "D1": round(res.params["D1"].value, 5),
            "logL": round(res.logl, 1)}


@timed("model_selection_2to4_states_5k")
def bench_model_selection(tracks):
    from extrack_tpu import auto_fitting
    ms = auto_fitting.model_selection(tracks, 0.02, state_range=(2, 3, 4),
                                      cell_dims=(0.5,), verbose=0)
    return {"best": ms.best_nb_states,
            "bic": {k: round(v, 1) for k, v in ms.bic.items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", help="comma-separated substring filter on "
                    "benchmark names; results merge into results.json")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    # record the disk-cache state so every wall_cold_s is interpretable:
    # "cold" always means cold-PROCESS (first call in this process); whether
    # it also paid remote compiles depends on the persistent cache, so the
    # entry count before/after disambiguates cold-disk from warm-disk runs
    # (three labels of record: warm / cold-process-warm-disk / cold-disk)
    cache_dir = os.path.expanduser(
        os.environ.get("EXTRACK_TPU_COMPILE_CACHE",
                       "~/.cache/extrack_tpu_jax"))
    count_cache = lambda: (len(os.listdir(cache_dir))  # noqa: E731
                           if os.path.isdir(cache_dir) else 0)
    cache_before = count_cache()
    # (name, untimed data preparation, timed benchmark) — simulation /
    # file reads happen OUTSIDE the timed region so cold/warm measure the
    # analysis itself.  bench_million deliberately keeps simulation inside
    # (it benchmarks the sim->fit pipeline and reports sim_s/fit_s).
    q = args.quick
    # names match the @timed names (the keys recorded in results.json), so
    # --only filters copied from results.json select what they name
    cases = [
        ("fit_2state_example_tracks", prep_fit_fixture, bench_fit_fixture),
        ("predict_and_histograms_20k",
         lambda: _sim(2000 if q else 20000, seed=2)[0], bench_predict_hist),
        ("fit_3state_substeps2_5k",
         lambda: prep_3state(1000 if q else 5000), bench_3state),
        ("refine_2state_10k",
         lambda: _sim(1000 if q else 10000, seed=4, max_len=10)[0],
         bench_refine),
        ("refine_2state_1M",
         lambda: prep_refine_large(50_000 if q else 939_000),
         bench_refine_large),
        ("fit_1M_tracks_sim_fov", lambda: q, bench_million),
        ("model_selection_2to4_states_5k",
         lambda: _sim(1000 if q else 5000, seed=6, max_len=10)[0],
         bench_model_selection),
    ]
    wanted = args.only.split(",") if args.only else None
    out = os.path.join(os.path.dirname(__file__), "results.json")

    def dump():
        # incremental AND merging: hours of completed TPU measurements
        # must survive a later case failing, and the first case of a full
        # run must not clobber the previous file's other entries
        results = {}
        if os.path.exists(out):
            with open(out) as fh:
                results = json.load(fh)
        results.update(RESULTS)
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)

    failures = []
    for name, prep, fn in cases:
        if wanted and not any(w in name for w in wanted):
            continue
        case_before = count_cache()
        try:
            fn(prep())
        except Exception as exc:       # isolate: record, keep the rest
            print(f"FAILED {name}: {exc!r}")
            RESULTS[name] = {"error": repr(exc)}
            failures.append(name)
        # per-CASE cache delta (ADVICE r4): a multi-case run can mix
        # warm-disk and cold-disk cases; one global pair cannot attribute
        # which wall_cold_s paid remote compiles
        case_after = count_cache()
        RESULTS[name]["cache_entries_before"] = case_before
        RESULTS[name]["cache_entries_after"] = case_after
        RESULTS[name]["cold_label"] = (
            "cold-process-warm-disk" if case_after == case_before
            else "cold-disk")
        RESULTS["_meta"] = {
            "backend": jax.default_backend(),
            "n_devices": len(jax.devices()),
            "cache_entries_before": cache_before,
            "cache_entries_after": count_cache(),
            "cold_means": ("per-case cache_entries_before/after label each "
                           "wall_cold_s: cold-process-warm-disk if "
                           "unchanged, cold-disk otherwise"),
            "quick": bool(args.quick)}
        dump()
    print(f"wrote {out}")
    if failures:
        raise SystemExit(f"benchmark case(s) failed: {', '.join(failures)}")


if __name__ == "__main__":
    main()
