"""Tkinter desktop app: the four ExTrack analyses with a point-and-click UI.

Functional equivalent of the reference's stand-alone GUI (ExTrack_GUI.py):
a main window configures the input file, track lengths, column names and
localization-error handling, then opens one of four analysis windows —
Model Fitting, State Labeling, State Lifetime Histogram, Position Refinement
(ExTrack_GUI.py:1288-1293).  All compute runs through the TPU backends.

Design: every analysis is a plain function over a ``Session`` dataclass
(testable without a display); the Tk layer is a thin shell that fills the
dataclass from widgets.  Launch with ``python -m extrack_tpu.gui`` or
``extrack-tpu-gui``.
"""
from __future__ import annotations

import dataclasses
import json
import threading
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class Session:
    """Everything the GUI windows configure (ExTrack_GUI.py:1203-1212)."""
    path: str = ""
    dt: float = 0.02
    min_len: int = 5
    max_len: int = 40
    dist_th: float = np.inf
    x_col: str = "POSITION_X"
    y_col: str = "POSITION_Y"
    frame_col: str = "FRAME"
    id_col: str = "TRACK_ID"
    quality_col: str = ""          # maps to LocErr = 1/sqrt(q), GUI :273-278
    nb_states: int = 2
    cell_dims: tuple = (1.0,)
    frame_len_fit: int = 6         # GUI default frame_len 6 for fitting
    frame_len_label: int = 10      # and 10 for labeling (ExTrack_GUI.py:1207)
    nb_iters: int = 3              # GUI default 3 fit iterations
    params_values: Optional[Dict[str, float]] = None
    params_spec: Optional[object] = None   # full Parameters (editor result)
    output_dir: str = "."

    # loaded data
    tracks: Optional[dict] = None
    frames: Optional[dict] = None
    input_loc_err: Optional[dict] = None

    def load(self):
        from extrack_tpu.io import readers
        lengths = np.arange(self.min_len, self.max_len + 1)
        opt = [self.quality_col] if self.quality_col else []
        if self.path.endswith(".xml"):
            tracks, frames, om = readers.read_trackmate_xml(
                self.path, lengths=lengths, dist_th=self.dist_th,
                opt_metrics_names=opt)
        else:
            tracks, frames, om = readers.read_table(
                self.path, lengths=lengths, dist_th=self.dist_th,
                colnames=[self.x_col, self.y_col, self.frame_col,
                          self.id_col],
                opt_colnames=opt)
        self.tracks, self.frames = tracks, frames
        if self.quality_col:
            q = om[self.quality_col]
            self.input_loc_err = {
                k: 1.0 / np.sqrt(np.maximum(q[k].astype(np.float64), 1e-12))
                for k in q}
        return sum(v.shape[0] for v in tracks.values())

    def spec(self):
        from extrack_tpu import params as tparams
        from extrack_tpu.io import exporters
        if self.params_spec is not None:
            return self.params_spec.copy()
        if self.params_values:
            spec = tparams.Parameters()
            for k, v in self.params_values.items():
                spec.add(k, float(v), vary=False)
            return spec
        return tparams.generate_params(
            nb_states=self.nb_states,
            LocErr_type=None if self.input_loc_err is not None else 1,
            D_max=3.0)


# ---------------------------------------------------------------------------
# parameter editor logic (display-free; the Tk ParameterWindow is a shell)
# ---------------------------------------------------------------------------

def spec_rows(spec):
    """Editor rows for a Parameters spec: (name, value, min, max, vary,
    expr).  Rows with an expr are derived quantities (read-only vary).
    Equivalent surface to the reference ParameterWindow
    (ExTrack_GUI.py:1096-1189) plus per-parameter min/max/vary."""
    return [(name, p.value, p.min, p.max, p.vary, p.expr)
            for name, p in spec.items()]


def apply_rows(spec, rows):
    """Apply edited (name, value, min, max, vary) rows onto a copy of
    ``spec``.  Expression-constrained parameters keep their expr (their
    value is derived; vary edits are ignored, as in lmfit)."""
    out = spec.copy()
    for row in rows:
        name, value, mn, mx, vary = row[:5]
        if name not in out:
            continue
        p = out[name]
        p.value = float(value)
        p.min = float(mn)
        p.max = float(mx)
        if p.expr is None:
            p.vary = bool(vary)
    return out


# ---------------------------------------------------------------------------
# analysis runners (display-free; the Tk shell calls these in a thread)
# ---------------------------------------------------------------------------

def run_fitting(s: Session, progress=print):
    """Iterated fit like the GUI (nb_iters rounds, ExTrack_GUI.py:289-321);
    with exact gradients one L-BFGS run usually converges, extra iterations
    simply restart from the optimum.  Starts from the parameter-editor spec
    when one was configured."""
    from extrack_tpu import fit
    params = s.params_spec.copy() if s.params_spec is not None else None
    res = None
    for it in range(max(1, s.nb_iters)):
        res = fit.param_fitting(
            s.tracks, s.dt, params=params, nb_states=s.nb_states,
            frame_len=s.frame_len_fit, cell_dims=s.cell_dims,
            input_LocErr=s.input_loc_err, verbose=0, compute_errors=True)
        params = res.params
        progress(f"iteration {it + 1}: logL = {res.logl:.3f}")
    s.params_values = res.params.valuesdict()
    out = f"{s.output_dir}/extrack_fitted_params.json"
    with open(out, "w") as fh:
        json.dump({"values": s.params_values,
                   "std_errors": res.std_errors, "logL": res.logl}, fh,
                  indent=1)
    progress(f"saved {out}")
    return res


def run_predictions(s: Session, progress=print):
    """State labeling (ExTrack_GUI.py:495-586) -> annotated CSV."""
    from extrack_tpu import predict
    from extrack_tpu.io import exporters
    preds = predict.predict_Bs(
        s.tracks, s.dt, s.spec(), cell_dims=s.cell_dims,
        nb_states=s.nb_states, frame_len=s.frame_len_label,
        input_LocErr=s.input_loc_err)
    out = f"{s.output_dir}/extrack_predictions.csv"
    exporters.save_extrack_2_CSV(out, s.tracks, preds, s.dt,
                                 all_frames=s.frames)
    progress(f"saved {out}")
    return preds


def run_lifetime(s: Session, progress=print):
    """State lifetime histogram (ExTrack_GUI.py:708-767) -> CSV + PNG."""
    from extrack_tpu import visualization as viz
    import matplotlib.pyplot as plt
    hists = viz.visualize_states_durations(
        s.tracks, s.spec(), s.dt, cell_dims=s.cell_dims,
        nb_states=s.nb_states, input_LocErr=s.input_loc_err,
        long_tracks=False)
    out = f"{s.output_dir}/extrack_durations"
    np.savetxt(out + ".csv", hists, delimiter=",")
    plt.savefig(out + ".png", dpi=150)
    progress(f"saved {out}.csv / .png")
    return hists


def run_refinement(s: Session, progress=print):
    """Position refinement (ExTrack_GUI.py:895-978) -> CSV."""
    import pandas as pd
    from extrack_tpu import params as tparams, refine
    from extrack_tpu.core import tables
    vals = s.spec().resolve()
    Ds, Fs, rates, loc_err, _ = tparams.extract_arrays(vals, s.nb_states)
    tr = np.asarray(tables.transition_matrix(rates))
    ds = np.sqrt(2.0 * np.asarray(Ds) * s.dt)
    mus, sigmas = refine.position_refinement(
        s.tracks,
        s.input_loc_err if s.input_loc_err is not None
        else float(np.asarray(loc_err).ravel()[0]),
        ds, np.asarray(Fs), tr, frame_len=min(s.frame_len_label, 7))
    rows = []
    tid = 0
    for k in s.tracks:
        for i in range(s.tracks[k].shape[0]):
            for j in range(int(k)):
                rows.append((tid, s.tracks[k][i, j, 0], s.tracks[k][i, j, 1],
                             mus[k][i, j, 0], mus[k][i, j, 1],
                             sigmas[k][i, j]))
            tid += 1
    out = f"{s.output_dir}/extrack_refined.csv"
    pd.DataFrame(rows, columns=["TRACK_ID", "X_OBS", "Y_OBS", "X_REFINED",
                                "Y_REFINED", "SIGMA"]).to_csv(out,
                                                              index=False)
    progress(f"saved {out}")
    return mus, sigmas


_ANALYSES = {
    "Model Fitting": run_fitting,
    "State Labeling": run_predictions,
    "State Lifetime Histogram": run_lifetime,
    "Position Refinement": run_refinement,
}


# ---------------------------------------------------------------------------
# Tk shell
# ---------------------------------------------------------------------------

class ParameterWindow:
    """Per-parameter editor: value / min / max / vary for every model
    parameter, with derived (expr) parameters shown read-only.

    Equivalent of the reference ParameterWindow (ExTrack_GUI.py:1096-1189),
    which edits values only; bounds and vary flags are first-class here
    because the fit honors them (sigmoid bound bijections).  On OK the
    edited spec is stored on the session and used by every analysis and as
    the warm start for fitting iterations (ExTrack_GUI.py:305-320).
    """

    def __init__(self, master, session: Session, on_close=None):
        import tkinter as tk
        from tkinter import ttk
        self.session = session
        self.on_close = on_close
        self.window = tk.Toplevel(master)
        self.window.title("Parameters")
        spec = session.spec()
        self._spec = spec
        self._rows = []
        for c, head in enumerate(("parameter", "value", "min", "max",
                                  "vary", "expr")):
            ttk.Label(self.window, text=head).grid(row=0, column=c,
                                                   padx=4, pady=2)
        for r, (name, value, mn, mx, vary, expr) in enumerate(
                spec_rows(spec), start=1):
            ttk.Label(self.window, text=name).grid(row=r, column=0,
                                                   sticky="w", padx=4)
            svars = []
            for c, val in enumerate((value, mn, mx)):
                var = tk.StringVar(value=f"{val:.6g}")
                ttk.Entry(self.window, textvariable=var, width=10).grid(
                    row=r, column=1 + c, padx=2)
                svars.append(var)
            vvar = tk.BooleanVar(value=bool(vary))
            chk = ttk.Checkbutton(self.window, variable=vvar)
            chk.grid(row=r, column=4)
            if expr is not None:
                chk.state(["disabled"])
                ttk.Label(self.window, text=expr).grid(row=r, column=5,
                                                       sticky="w", padx=4)
            self._rows.append((name, svars, vvar))
        ttk.Button(self.window, text="OK", command=self.ok_clicked).grid(
            row=len(self._rows) + 1, column=0, columnspan=6, pady=8)

    def edited_rows(self):
        return [(name, float(svars[0].get()), float(svars[1].get()),
                 float(svars[2].get()), bool(vvar.get()))
                for name, svars, vvar in self._rows]

    def ok_clicked(self):
        self.session.params_spec = apply_rows(self._spec,
                                              self.edited_rows())
        if self.on_close:
            self.on_close()
        self.window.destroy()


def launch():
    import tkinter as tk
    from tkinter import filedialog, scrolledtext, ttk

    session = Session()
    root = tk.Tk()
    root.title("extrack-tpu")

    frm = ttk.Frame(root, padding=10)
    frm.grid(sticky="nsew")
    entries = {}

    def add_row(r, label, default):
        ttk.Label(frm, text=label).grid(row=r, column=0, sticky="w")
        var = tk.StringVar(value=str(default))
        ttk.Entry(frm, textvariable=var, width=32).grid(row=r, column=1)
        entries[label] = var
        return r + 1

    r = 0
    ttk.Label(frm, text="Input file (CSV / TrackMate XML)").grid(
        row=r, column=0, sticky="w")
    path_var = tk.StringVar()
    ttk.Entry(frm, textvariable=path_var, width=32).grid(row=r, column=1)

    def browse():
        p = filedialog.askopenfilename()
        if p:
            path_var.set(p)
    ttk.Button(frm, text="...", command=browse).grid(row=r, column=2)
    r += 1
    r = add_row(r, "dt (s)", session.dt)
    r = add_row(r, "min length", session.min_len)
    r = add_row(r, "max length", session.max_len)
    r = add_row(r, "x column", session.x_col)
    r = add_row(r, "y column", session.y_col)
    r = add_row(r, "frame column", session.frame_col)
    r = add_row(r, "track id column", session.id_col)
    r = add_row(r, "quality column (optional)", "")
    r = add_row(r, "number of states", session.nb_states)
    r = add_row(r, "cell dims (um, comma sep.)", "1.0")
    r = add_row(r, "frame_len (fit)", session.frame_len_fit)
    r = add_row(r, "frame_len (labeling)", session.frame_len_label)
    r = add_row(r, "fit iterations", session.nb_iters)
    r = add_row(r, "params JSON (optional)", "")
    r = add_row(r, "output directory", ".")

    analysis_var = tk.StringVar(value="Model Fitting")
    ttk.Label(frm, text="Analysis").grid(row=r, column=0, sticky="w")
    ttk.Combobox(frm, textvariable=analysis_var,
                 values=list(_ANALYSES)).grid(row=r, column=1)
    r += 1

    log = scrolledtext.ScrolledText(frm, width=60, height=12)
    log.grid(row=r + 1, column=0, columnspan=3)

    def progress(msg):
        log.insert("end", str(msg) + "\n")
        log.see("end")

    def fill_session():
        session.path = path_var.get()
        session.dt = float(entries["dt (s)"].get())
        session.min_len = int(entries["min length"].get())
        session.max_len = int(entries["max length"].get())
        session.x_col = entries["x column"].get()
        session.y_col = entries["y column"].get()
        session.frame_col = entries["frame column"].get()
        session.id_col = entries["track id column"].get()
        session.quality_col = entries["quality column (optional)"].get()
        session.nb_states = int(entries["number of states"].get())
        session.cell_dims = tuple(
            float(c) for c in
            entries["cell dims (um, comma sep.)"].get().split(","))
        session.frame_len_fit = int(entries["frame_len (fit)"].get())
        session.frame_len_label = int(entries["frame_len (labeling)"].get())
        session.nb_iters = int(entries["fit iterations"].get())
        session.output_dir = entries["output directory"].get() or "."
        pj = entries["params JSON (optional)"].get()
        if pj:
            with open(pj) as fh:
                payload = json.load(fh)
            session.params_values = payload.get("values", payload)

    def run():
        try:
            fill_session()
            n = session.load()
            progress(f"loaded {n} tracks")
            fn = _ANALYSES[analysis_var.get()]
            threading.Thread(target=lambda: fn(session, progress),
                             daemon=True).start()
        except Exception as exc:          # surface errors in the log pane
            progress(f"ERROR: {exc!r}")

    def edit_params():
        try:
            fill_session()
            ParameterWindow(root, session,
                            on_close=lambda: progress("parameters updated"))
        except Exception as exc:
            progress(f"ERROR: {exc!r}")

    ttk.Button(frm, text="Edit parameters...",
               command=edit_params).grid(row=r, column=0)
    ttk.Button(frm, text="Run", command=run).grid(row=r, column=1)
    root.mainloop()


def main():
    launch()


if __name__ == "__main__":
    main()
