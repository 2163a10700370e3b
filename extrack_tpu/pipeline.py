"""Device-resident analysis pipeline: read -> fit -> annotate -> histogram
-> refine -> export, with length-keyed dicts only at the file edges.

The reference's workflow (Tutorials/Tutorial_ExTrack.ipynb) round-trips its
length-keyed dict format between every stage; on a remote TPU each dict
assembly is host work plus device transfers.  Here the dataset is converted
ONCE into canonical-shape TrackBatches (data.from_dict_bucketed) and every
stage consumes batches directly (fit.fit, predict.predict_batch,
histograms.hist_batch, refine.refine_batch); results come back to the host
in one pull per stage.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from extrack_tpu import data as tdata
from extrack_tpu import params as tparams


@dataclasses.dataclass
class PipelineResult:
    """All artifacts of one end-to-end analysis.

    Per-track arrays are length-keyed dicts (the reference's exchange
    format), produced once at the pipeline edge.
    """
    fit: "object"                              # fit.FitResult
    preds: Optional[Dict[str, np.ndarray]]     # per-peak state posteriors
    hist: Optional[np.ndarray]                 # (T, S) expected durations
    mus: Optional[Dict[str, np.ndarray]]       # refined positions
    sigmas: Optional[Dict[str, np.ndarray]]    # refinement stds
    tracks: Dict[str, np.ndarray]              # input tracks (dict form)
    frames: Optional[Dict[str, np.ndarray]]


def analyze(tracks_or_path,
            dt: float,
            nb_states: int = 2,
            cell_dims=(1.0, None, None),
            window: Optional[int] = None,
            nb_substeps: int = 1,
            hist_window: int = 7,
            refine_frame_len: Optional[int] = None,
            lengths=tuple(range(3, 100)),
            max_buckets: int = 4,
            do_predict: bool = True,
            do_hist: bool = True,
            do_refine: bool = True,
            export_csv: Optional[str] = None,
            export_xml: Optional[str] = None,
            fit_kwargs: Optional[dict] = None,
            params: Optional[tparams.Parameters] = None,
            sharded: bool = False,
            verbose: int = 0) -> PipelineResult:
    """Run the full reference workflow on a CSV path or a track dict.

    Equivalent chain in the reference: readers.read_table ->
    tracking.param_fitting -> tracking.predict_Bs -> histograms.len_hist ->
    refined_localization.position_refinement -> exporters.save_extrack_2_CSV
    (Tutorial_ExTrack.ipynb), each stage re-entering the length-dict format.
    Here each stage runs on the canonical TrackBatch buckets.
    """
    from extrack_tpu import fit as tfit
    from extrack_tpu import histograms, predict, refine

    if (export_csv or export_xml) and not do_predict:
        raise ValueError("export_csv/export_xml need the state posteriors; "
                         "call with do_predict=True")
    frames = None
    if isinstance(tracks_or_path, str):
        from extrack_tpu.io import readers
        tracks, frames, _ = readers.read_table(tracks_or_path,
                                               lengths=list(lengths))
    else:
        tracks = tracks_or_path

    batches = tdata.from_dict_bucketed(tracks, max_buckets=max_buckets,
                                       canonical_shapes=True)
    # min_len is a DATASET property (shortest track present, reference
    # tracking.py:1009) — per-bucket inference would differ between
    # buckets; the shared default keeps every stage on one closing-gate
    # convention
    min_len = tdata.default_min_len(
        np.array([int(k) for k in tracks if len(tracks[k]) > 0]))

    if window is None:
        # per-state-count schedule (fit.default_window); the predict stage
        # below reuses the fitting window
        window = tfit.default_window(nb_states, nb_substeps)
    if refine_frame_len is None:
        # largest refinement window whose VMEM kernel register fits
        refine_frame_len = refine.pallas_window(
            nb_states, max(tdata.host_lengths(b).max(initial=2)
                           for b in batches))

    spec = params if params is not None else tparams.generate_params(
        nb_states=nb_states, estimated_LocErr=0.025, D_max=10.0,
        estimated_transition_rates=0.1)
    res = tfit.fit(batches, spec, dt, nb_states, cell_dims=cell_dims,
                   nb_substeps=nb_substeps, window=window, sharded=sharded,
                   verbose=verbose, **(fit_kwargs or {}))
    values = res.params.resolve()

    preds_dict = None
    if do_predict:
        parts = []
        for b in batches:
            _, preds = predict.predict_batch(b, values, dt, nb_states,
                                             cell_dims=cell_dims,
                                             window=window, min_len=min_len,
                                             sharded=sharded)
            parts.append((b, np.asarray(preds)))
        preds_dict = {}
        for b, arr in parts:
            preds_dict.update(tdata.to_dict(b, arr))

    hist = None
    if do_hist:
        for b in batches:
            h = np.asarray(histograms.hist_batch(
                b, values, dt, cell_dims=cell_dims, nb_states=nb_states,
                nb_substeps=nb_substeps, window=hist_window,
                min_len=min_len, sharded=sharded))
            if hist is None:
                hist = np.array(h)
            else:                      # buckets have different max lengths
                if h.shape[0] > hist.shape[0]:
                    hist, h = np.array(h), hist
                hist[:h.shape[0]] += h

    mus = sigmas = None
    if do_refine:
        from extrack_tpu.core import tables as ttables
        Ds, _, rates, loc_err_arr, _ = tparams.extract_arrays(values,
                                                              nb_states)
        trmat = np.asarray(ttables.transition_matrix(rates))
        ds = np.sqrt(2.0 * np.asarray(Ds) * dt)
        loc_err = float(np.asarray(loc_err_arr).ravel()[0])
        mus, sigmas = {}, {}
        for b in batches:
            mu, sig, B0 = refine.refine_batch(
                b, loc_err, ds, trmat, frame_len=refine_frame_len,
                sharded=sharded)
            lens = tdata.host_lengths(b)[:B0]
            trimmed = tdata.TrackBatch(np.zeros((B0, 0, 0)), lens)
            mus.update(tdata.to_dict(trimmed, mu))
            sigmas.update(tdata.to_dict(trimmed, sig[..., 0]))

    if export_csv and preds_dict is not None:
        from extrack_tpu.io import exporters
        exporters.save_extrack_2_CSV(export_csv, tracks, preds_dict, dt,
                                     all_frames=frames)
    if export_xml and preds_dict is not None:
        from extrack_tpu.io import exporters
        exporters.save_extrack_2_xml(tracks, preds_dict, res.params,
                                     export_xml, dt, all_frames=frames)

    return PipelineResult(fit=res, preds=preds_dict, hist=hist,
                          mus=mus, sigmas=sigmas, tracks=tracks,
                          frames=frames)
