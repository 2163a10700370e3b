"""Data model: padded, masked track batches.

The reference keeps datasets as dicts keyed by track length (string) with
arrays of shape ``(nb_tracks, track_len, nb_dims)`` (extrack/tracking.py:1318).
That length-bucketing exists only to obtain rectangular NumPy arrays.  On TPU
we want a single rectangular batch per compilation, so the canonical container
is a padded batch with an explicit length mask; helpers convert to/from the
reference's dict format so users of the original API feel at home.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class TrackBatch:
    """A batch of tracks padded to a common length.

    Attributes
    ----------
    positions : (B, T, D) observed localizations, padded with zeros past
        ``lengths``.
    lengths : (B,) int32 number of valid localizations per track (>= 2).
    loc_err : (B, T, D) per-peak localization error std, or None when the
        error is a fitted parameter (reference ``input_LocErr``,
        extrack/tracking.py:1327).
    is_bleached : (B,) float, 1.0 if the track ended within the observation
        window (bleaching / left FOV), 0.0 if it reached the maximum length.
        Mirrors the reference's ``isBL`` flags (extrack/tracking.py:1037-1040).
    frames : (B, T) optional frame indices (for export).
    dt : optional (B, T-1) per-step frame intervals; None means the scalar
        dt passed to the model applies everywhere.
    """

    def __init__(self, positions, lengths, loc_err=None, is_bleached=None,
                 frames=None, dt=None):
        self.positions = positions
        self.lengths = lengths
        self.loc_err = loc_err
        self.is_bleached = is_bleached
        self.frames = frames
        self.dt = dt

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = (self.positions, self.lengths, self.loc_err,
                    self.is_bleached, self.frames, self.dt)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- basic properties --------------------------------------------------
    @property
    def batch_size(self):
        return self.positions.shape[0]

    @property
    def max_len(self):
        return self.positions.shape[1]

    @property
    def nb_dims(self):
        return self.positions.shape[2]

    def __repr__(self):
        return (f"TrackBatch(B={self.batch_size}, T={self.max_len}, "
                f"D={self.nb_dims})")

    # -- padding / slicing ---------------------------------------------------
    def pad_batch_to(self, n: int) -> "TrackBatch":
        """Pad the batch axis to ``n`` tracks; padded tracks get length 0 and
        contribute nothing to likelihoods (engine masks length < 2)."""
        b = self.batch_size
        if b == n:
            return self
        assert n > b
        pad = n - b

        def _pad(x, value=0):
            if x is None:
                return None
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=value)

        # loc_err / dt pad with positive values: zeros would put log(0)/
        # 0-variance terms in masked lanes, whose NaNs leak through
        # jnp.where under grad.  dt pads with its own median so the
        # median-based survival tables (tables.build_tables dt_repr) are
        # identical before and after padding.
        dt_fill = jnp.median(self.dt) if self.dt is not None else 0
        return TrackBatch(
            _pad(self.positions), _pad(self.lengths),
            _pad(self.loc_err, 1.0), _pad(self.is_bleached),
            _pad(self.frames), _pad(self.dt, dt_fill))


def from_dict(all_tracks: Dict[str, np.ndarray],
              input_loc_err: Optional[Dict[str, np.ndarray]] = None,
              frames: Optional[Dict[str, np.ndarray]] = None,
              dt: Optional[Dict[str, np.ndarray]] = None,
              max_len: Optional[int] = None,
              dtype=np.float64) -> TrackBatch:
    """Convert the reference's length-keyed dict format to a padded batch.

    ``is_bleached`` follows the reference convention: tracks whose length
    equals the dataset maximum are censored (isBL=0), all others bleached /
    left the FOV (extrack/tracking.py:1037-1040).
    """
    keys = sorted((k for k in all_tracks if len(all_tracks[k]) > 0),
                  key=lambda s: int(s))
    if not keys:
        raise ValueError("No tracks found. The loaded tracks seem empty.")
    lens = [int(k) for k in keys]
    data_max = max(lens)
    tmax = max_len or data_max

    pos_l, len_l, err_l, frm_l, dt_l, bl_l = [], [], [], [], [], []
    for k in keys:
        arr = np.asarray(all_tracks[k], dtype=dtype)
        b, t, d = arr.shape
        pos = np.zeros((b, tmax, d), dtype=dtype)
        pos[:, :t] = arr
        pos_l.append(pos)
        len_l.append(np.full((b,), t, dtype=np.int32))
        bl_l.append(np.full((b,), 0.0 if t == data_max else 1.0, dtype=dtype))
        if input_loc_err is not None:
            e = np.asarray(input_loc_err[k], dtype=dtype)
            if e.ndim == 2:
                e = e[:, :, None]
            err = np.zeros((b, tmax, e.shape[2]), dtype=dtype)
            err[:, :t] = e
            # pad region must stay positive to avoid log(0) in masked lanes
            err[:, t:] = 1.0
            err_l.append(err)
        if frames is not None:
            f = np.zeros((b, tmax), dtype=dtype)
            f[:, :t] = np.asarray(frames[k], dtype=dtype)
            frm_l.append(f)
        if dt is not None:
            dd = np.asarray(dt[k], dtype=dtype)
            step_dt = np.ones((b, tmax - 1), dtype=dtype)
            n_steps = min(t - 1, dd.shape[1])
            step_dt[:, :n_steps] = dd[:, :n_steps]
            dt_l.append(step_dt)

    return TrackBatch(
        positions=jnp.asarray(np.concatenate(pos_l)),
        lengths=jnp.asarray(np.concatenate(len_l)),
        loc_err=jnp.asarray(np.concatenate(err_l)) if err_l else None,
        is_bleached=jnp.asarray(np.concatenate(bl_l)),
        frames=jnp.asarray(np.concatenate(frm_l)) if frm_l else None,
        dt=jnp.asarray(np.concatenate(dt_l)) if dt_l else None,
    )


def from_dict_bucketed(all_tracks: Dict[str, np.ndarray],
                       max_buckets: int = 4,
                       **kw) -> list:
    """Split a length-keyed dict into a few padded TrackBatches so short
    tracks don't pay the longest track's scan length.

    Bucket edges are chosen greedily to minimize total padded work
    (sum over buckets of n_tracks * bucket_max_len).  The ``is_bleached``
    convention stays global: only tracks at the DATASET maximum length are
    censored (extrack/tracking.py:1037-1040).
    """
    lens = sorted(int(k) for k in all_tracks if len(all_tracks[k]) > 0)
    if not lens:
        raise ValueError("No tracks found. The loaded tracks seem empty.")
    counts = {l: len(all_tracks[str(l)]) for l in lens}
    data_max = max(lens)

    # dynamic programming over bucket boundaries (few distinct lengths)
    best: Dict[int, tuple] = {0: (0.0, [])}
    for j in range(1, len(lens) + 1):
        options = []
        for i in range(max(0, j - 32), j):
            if i not in best:
                continue
            cost_prev, cuts = best[i]
            if len(cuts) >= max_buckets - (0 if j == len(lens) else 1):
                continue
            width = lens[j - 1]
            cost = cost_prev + sum(counts[l] for l in lens[i:j]) * width
            options.append((cost, cuts + [j]))
        if options:
            best[j] = min(options, key=lambda t: t[0])
    cuts = best[len(lens)][1]

    batches = []
    start = 0
    for end in cuts:
        group = {str(l): all_tracks[str(l)] for l in lens[start:end]}
        sub_kw = dict(kw)
        for name in ("input_loc_err", "frames", "dt"):
            if kw.get(name) is not None:
                sub_kw[name] = {k: kw[name][k] for k in group}
        batch = from_dict(group, **sub_kw)
        # global censoring convention
        batch.is_bleached = jnp.asarray(
            np.where(np.asarray(batch.lengths) == data_max, 0.0, 1.0))
        batches.append(batch)
        start = end
    return batches


def to_dict(batch: TrackBatch, values: Optional[np.ndarray] = None
            ) -> Dict[str, np.ndarray]:
    """Regroup a padded batch (or per-track ``values`` aligned with it) into
    the reference's length-keyed dict format."""
    lengths = np.asarray(batch.lengths)
    src = np.asarray(batch.positions if values is None else values)
    out: Dict[str, np.ndarray] = {}
    for t in np.unique(lengths):
        if t < 1:
            continue
        sel = lengths == t
        out[str(int(t))] = src[sel][:, :int(t)] if src.ndim > 1 else src[sel]
    return out
