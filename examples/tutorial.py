"""extrack-tpu end-to-end tutorial.

The same story as the reference's Tutorials/Tutorial_ExTrack.ipynb: simulate
tracks with known ground truth, fit the model, check the recovered
parameters, annotate states, compare duration histograms against ground
truth, refine positions, and export — plus the things the reference only
does by hand: Fisher-information error bars and a BIC model-selection scan.

Run:  python examples/tutorial.py [--small]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))  # repo-root run without install
# Honor JAX_PLATFORMS even when an accelerator plugin is importable: the
# env var alone does not beat plugin auto-registration (see cli.main), so
# `JAX_PLATFORMS=cpu python examples/...` would silently grab the TPU.
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import argparse

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--small", action="store_true", help="tiny sizes (CI smoke)")
ap.add_argument("--outdir", default="/tmp/extrack_tpu_tutorial")
args = ap.parse_args()
os.makedirs(args.outdir, exist_ok=True)
N = 2000 if args.small else 20000

# ---------------------------------------------------------------------------
# 1. Simulate tracks with known kinetics
# ---------------------------------------------------------------------------
from extrack_tpu import simulate  # noqa: E402

TRUE = dict(LocErr=0.02, Ds=(0.0, 0.05), dt=0.02, pBL=0.1)
TRMAT = np.array([[0.9, 0.1], [0.05, 0.95]])

tracks, true_states, sigmas = simulate.sim_fov(
    nb_tracks=N, max_track_len=30, min_track_len=5, LocErr=TRUE["LocErr"],
    Ds=TRUE["Ds"], TrMat=TRMAT, dt=TRUE["dt"], pBL=TRUE["pBL"],
    cell_dims=(0.5, None, None), seed=0, verbose=True)

# ---------------------------------------------------------------------------
# 2. Fit a 2-state model by maximum likelihood (exact gradients)
# ---------------------------------------------------------------------------
from extrack_tpu import fit  # noqa: E402

res = fit.param_fitting(tracks, TRUE["dt"], nb_states=2, frame_len=5,
                        cell_dims=(0.5,), verbose=0, compute_errors=True)
print("\nfitted parameters (truth: LocErr=0.02 D1=0.05 p01=0.1 p10=0.05 "
      "pBL=0.1):")
print(res)

# ---------------------------------------------------------------------------
# 3. Annotate every localization with state probabilities
# ---------------------------------------------------------------------------
from extrack_tpu import predict  # noqa: E402
from extrack_tpu.io import exporters  # noqa: E402

preds = predict.predict_Bs(tracks, TRUE["dt"], res.params,
                           cell_dims=(0.5,), nb_states=2, frame_len=7)
acc = np.mean([np.mean(np.argmax(preds[k], -1) == true_states[k])
               for k in preds])
print(f"\nstate labeling accuracy vs ground truth: {acc:.3f}")

df = exporters.extrack_2_pandas(tracks, preds)
df.to_csv(f"{args.outdir}/annotated.csv", index=False)
exporters.save_extrack_2_xml(tracks, preds, res.params,
                             f"{args.outdir}/annotated.xml", TRUE["dt"])
exporters.save_params(res.params, args.outdir, fmt="json")

# ---------------------------------------------------------------------------
# 4. State duration histograms: posterior vs ground truth
# ---------------------------------------------------------------------------
from extrack_tpu import histograms  # noqa: E402

hist = histograms.len_hist(tracks, res.params, TRUE["dt"],
                           cell_dims=(0.5,), nb_states=2,
                           max_nb_states=256)
gt = histograms.ground_truth_hist(true_states, 2)
print("\nduration histogram (state 1), first 6 lengths:")
print("  posterior  :", np.round(hist[:6, 1] / hist[:, 1].sum(), 3))
print("  groundtruth:", np.round(gt[:6, 1] / gt[:, 1].sum(), 3))

# ---------------------------------------------------------------------------
# 5. Position refinement
# ---------------------------------------------------------------------------
from extrack_tpu import params as xp, refine  # noqa: E402
from extrack_tpu.core import tables  # noqa: E402

vals = res.params.resolve()
Ds, Fs, rates, loc_err, _ = xp.extract_arrays(vals, 2)
tr = np.asarray(tables.transition_matrix(rates))
mus, sigs = refine.position_refinement(
    tracks, float(np.asarray(loc_err).ravel()[0]),
    np.sqrt(2 * np.asarray(Ds) * TRUE["dt"]), np.asarray(Fs), tr,
    frame_len=5)
mean_sig = float(np.mean(np.concatenate([s.ravel() for s in sigs.values()])))
print(f"\nrefined position uncertainty: {mean_sig:.4f} um "
      f"(raw localization error: {TRUE['LocErr']} um)")

# ---------------------------------------------------------------------------
# 6. Model selection: how many states?
# ---------------------------------------------------------------------------
from extrack_tpu import auto_fitting  # noqa: E402

ms = auto_fitting.model_selection(tracks, TRUE["dt"],
                                  state_range=(2,) if args.small
                                  else (2, 3), cell_dims=(0.5,))
print("\nmodel selection:")
print(ms.summary())
print(f"\noutputs in {args.outdir}")
