"""Automated per-replicate analysis of a TrackMate experiment layout.

Equivalent of the reference's Tutorials/automated_fitting.py: walk an
experiment directory tree (Exp*/replicate XMLs), fit each experiment,
save per-experiment parameters + state annotations, and summarize.

Run: python examples/automated_fitting.py [dataset_root] [--per-replicate]
     (defaults to the layout extracted from the reference's dataset.zip)
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
import glob
import json

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("root", nargs="?", default="/tmp/extrack_ds/dataset")
ap.add_argument("--dt", type=float, default=0.02)
ap.add_argument("--states", type=int, default=2)
ap.add_argument("--outdir", default="/tmp/extrack_tpu_automated")
ap.add_argument("--per-replicate", action="store_true",
                help="fit each XML separately instead of pooling")
args = ap.parse_args()
os.makedirs(args.outdir, exist_ok=True)

from extrack_tpu import fit, predict  # noqa: E402
from extrack_tpu.io import exporters, readers  # noqa: E402

experiments = sorted(d for d in glob.glob(os.path.join(args.root, "*"))
                     if os.path.isdir(d))
if not experiments:
    raise SystemExit(f"no experiment directories under {args.root}")

summary = {}
for exp in experiments:
    name = os.path.basename(exp)
    xmls = sorted(glob.glob(os.path.join(exp, "*.xml")))
    if not xmls:
        print(f"[{name}] no XML files — skipping")
        continue
    groups = [[x] for x in xmls] if args.per_replicate else [xmls]
    for gi, group in enumerate(groups):
        tag = name if not args.per_replicate else f"{name}_rep{gi}"
        tracks, frames, _ = readers.read_trackmate_xml(
            group, lengths=np.arange(5, 40), dist_th=0.5)
        n = sum(v.shape[0] for v in tracks.values())
        print(f"[{tag}] {len(group)} file(s), {n} tracks")
        res = fit.param_fitting(tracks, args.dt, nb_states=args.states,
                                frame_len=6, cell_dims=(0.5,), verbose=0,
                                compute_errors=True)
        vals = res.params.valuesdict()
        print(f"[{tag}] logL={res.logl:.1f} "
              + " ".join(f"{k}={vals[k]:.4g}" for k in
                         ("LocErr", "D1", "F0", "p01", "p10", "pBL")
                         if k in vals))
        with open(f"{args.outdir}/{tag}_params.json", "w") as fh:
            json.dump({"values": vals, "std_errors": res.std_errors,
                       "logL": res.logl, "n_tracks": n}, fh, indent=1)
        preds = predict.predict_Bs(tracks, args.dt, res.params,
                                   cell_dims=(0.5,),
                                   nb_states=args.states, frame_len=6)
        exporters.save_extrack_2_CSV(f"{args.outdir}/{tag}_annotated.csv",
                                     tracks, preds, args.dt,
                                     all_frames=frames)
        summary[tag] = {k: vals[k] for k in ("D1", "F0", "p01", "p10")
                        if k in vals}

print("\nper-experiment summary:")
for tag, v in summary.items():
    print(f"  {tag}: " + " ".join(f"{k}={x:.4g}" for k, x in v.items()))
with open(f"{args.outdir}/summary.json", "w") as fh:
    json.dump(summary, fh, indent=1)
print(f"outputs in {args.outdir}")
