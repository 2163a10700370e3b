"""Data model: padded, masked track batches.

The reference keeps datasets as dicts keyed by track length (string) with
arrays of shape ``(nb_tracks, track_len, nb_dims)`` (extrack/tracking.py:1318).
That length-bucketing exists only to obtain rectangular NumPy arrays.  On TPU
we want a single rectangular batch per compilation, so the canonical container
is a padded batch with an explicit length mask; helpers convert to/from the
reference's dict format so users of the original API feel at home.
"""
from __future__ import annotations

import functools
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
        out = _pad_batch_axis(self, n - b)
        cached = getattr(self, "np_lengths", None)
        if cached is not None:   # keep drivers off the device->host path
            out.np_lengths = np.pad(np.asarray(cached), (0, n - b))
        return out

    def pad_len_to(self, t: int) -> "TrackBatch":
        """Pad the time axis to ``t`` frames; padded frames are masked by
        ``lengths`` and contribute nothing."""
        cur = self.max_len
        if cur == t:
            return self
        assert t > cur
        out = _pad_time_axis(self, t - cur)
        cached = getattr(self, "np_lengths", None)
        if cached is not None:
            out.np_lengths = cached
        return out


# loc_err / dt pad with positive values: zeros would put log(0)/0-variance
# terms in masked lanes, whose NaNs leak through jnp.where under grad.  dt
# pads with its own median so the median-based survival tables
# (tables.build_tables dt_repr) are identical before and after padding.
# Both pads run as ONE jitted program (persistent-cacheable) instead of up
# to seven eager dispatches: through the remote-TPU tunnel every eager op
# is a separate multi-second compile roundtrip (CLAUDE.md).
@functools.partial(jax.jit, static_argnames="pad")
def _pad_batch_axis(batch: "TrackBatch", pad: int) -> "TrackBatch":
    def _pad(x, value=0):
        if x is None:
            return None
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    dt_fill = jnp.median(batch.dt) if batch.dt is not None else 0
    return TrackBatch(
        _pad(batch.positions), _pad(batch.lengths),
        _pad(batch.loc_err, 1.0), _pad(batch.is_bleached),
        _pad(batch.frames), _pad(batch.dt, dt_fill))


@functools.partial(jax.jit, static_argnames="pad")
def _pad_time_axis(batch: "TrackBatch", pad: int) -> "TrackBatch":
    def _pad(x, value=0):
        if x is None:
            return None
        widths = [(0, 0)] * x.ndim
        widths[1] = (0, pad)
        return jnp.pad(x, widths, constant_values=value)

    dt_fill = jnp.median(batch.dt) if batch.dt is not None else 0
    return TrackBatch(
        _pad(batch.positions), batch.lengths,
        _pad(batch.loc_err, 1.0), batch.is_bleached,
        _pad(batch.frames), _pad(batch.dt, dt_fill))


def from_dict(all_tracks: Dict[str, np.ndarray],
              input_loc_err: Optional[Dict[str, np.ndarray]] = None,
              frames: Optional[Dict[str, np.ndarray]] = None,
              dt: Optional[Dict[str, np.ndarray]] = None,
              max_len: Optional[int] = None,
              pad_batch: int = 0,
              data_max: Optional[int] = None,
              dtype=np.float64) -> TrackBatch:
    """Convert the reference's length-keyed dict format to a padded batch.

    ``is_bleached`` follows the reference convention: tracks whose length
    equals the dataset maximum are censored (isBL=0), all others bleached /
    left the FOV (extrack/tracking.py:1037-1040).  ``data_max`` overrides
    the censoring length when this dict is one bucket of a larger dataset.

    ``max_len`` / ``pad_batch`` pad the time / track axes in NumPy before
    the single device transfer — through the remote-TPU tunnel every eager
    device op (pad, median) costs a multi-second compile roundtrip, so
    padding must happen host-side.  All arrays are cast to the canonical
    JAX dtype host-side too (an f64->f32 ``jnp.asarray`` is an eager
    convert_element_type compile), and shipped in ONE ``jax.device_put``.
    """
    keys = sorted((k for k in all_tracks if len(all_tracks[k]) > 0),
                  key=lambda s: int(s))
    if not keys:
        raise ValueError("No tracks found. The loaded tracks seem empty.")
    lens = [int(k) for k in keys]
    if data_max is None:
        data_max = max(lens)
    tmax = max_len or max(lens)

    # per-step dt tails pad with the dataset's median dt (NOT an arbitrary
    # constant): tables.build_tables derives its survival-table dt_repr from
    # the median of the whole (B, T-1) array, so pad values must not move it
    if dt is not None:
        _all_dt = np.concatenate(
            [np.asarray(dt[k], dtype=dtype).ravel() for k in keys])
        dt_fill = float(np.median(_all_dt)) if _all_dt.size else 1.0
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
            step_dt = np.full((b, tmax - 1), dt_fill, dtype=dtype)
            n_steps = min(t - 1, dd.shape[1])
            step_dt[:, :n_steps] = dd[:, :n_steps]
            dt_l.append(step_dt)

    pos = np.concatenate(pos_l)
    lens_a = np.concatenate(len_l)
    err = np.concatenate(err_l) if err_l else None
    bl = np.concatenate(bl_l)
    frm = np.concatenate(frm_l) if frm_l else None
    dts = np.concatenate(dt_l) if dt_l else None
    if pad_batch > pos.shape[0]:
        extra = pad_batch - pos.shape[0]

        def _padb(x, fill=0.0):
            if x is None:
                return None
            w = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, w, constant_values=fill)

        pos = _padb(pos)
        lens_a = _padb(lens_a)
        err = _padb(err, 1.0)
        bl = _padb(bl)
        frm = _padb(frm)
        dts = _padb(dts, float(np.median(dts)) if dts is not None else 0.0)

    ftype = jax.dtypes.canonicalize_dtype(np.dtype(dtype))

    def _cast(x, dt_=None):
        return None if x is None else np.asarray(x, dt_ or ftype)

    host = TrackBatch(
        positions=_cast(pos), lengths=_cast(lens_a, np.int32),
        loc_err=_cast(err), is_bleached=_cast(bl),
        frames=_cast(frm), dt=_cast(dts))
    dev = jax.device_put(host)
    # host copy of the lengths: drivers need them for min_len / chunking /
    # regrouping, and the FIRST device->host pull through the remote-TPU
    # tunnel has been measured at 60-300+ s
    dev.np_lengths = host.lengths
    return dev


def canonical_len(t: int) -> int:
    """Round a track length up to the canonical program-shape ladder
    (multiples of 4 up to 32, of 8 beyond): every new TPU program shape
    costs a 100-300 s remote compile, so fits quantize their time axis to
    a small ladder and reuse executables from the persistent cache across
    datasets.  Wasted scan steps are masked and cost <= ~3/T extra work."""
    step = 4 if t <= 32 else 8
    return max(4, -(-t // step) * step)


def canonical_batch(b: int) -> int:
    """Round a batch size up to the ladder 128, 192, 256, 384, 512, ...
    (powers of two and their 1.5x midpoints; <= 33% padding)."""
    if b <= 128:
        return 128
    p = 1 << int(b - 1).bit_length()          # next power of two
    if b <= 3 * p // 4:
        return 3 * p // 4
    return p


def canonicalize(batch: TrackBatch) -> TrackBatch:
    """Pad a batch to canonical (T, B) program shapes (see canonical_len /
    canonical_batch).  Results are unchanged: padded frames and tracks are
    masked everywhere."""
    batch = batch.pad_len_to(canonical_len(batch.max_len))
    return batch.pad_batch_to(canonical_batch(batch.batch_size))


def partition_cuts(lens, counts, max_buckets: int) -> list:
    """Exclusive end indices into the ascending distinct-length list
    ``lens`` (with per-length track ``counts``) minimizing total padded
    work sum(n_i * bucket_max_len_i) over <= max_buckets contiguous groups.

    Exact dynamic program over bucket boundaries: best[j] after b rounds =
    (min padded work covering lens[:j] with <= b buckets, its cuts).  A
    single-state DP keyed on j alone is wrong (the min-cost prefix can
    exhaust the bucket budget before reaching the end), and any fixed
    look-back window crashes on datasets with many distinct lengths, so
    this layers the bucket count explicitly: O(max_buckets * n^2) with
    n = number of distinct lengths (bounded by the longest track).
    Shared by from_dict_bucketed and simulate.sim_fov_batch.
    """
    n = len(lens)
    csum = np.concatenate([[0], np.cumsum(list(counts))])
    INF = float("inf")
    prev_cost = [0.0] + [INF] * n
    prev_cuts: list = [[]] + [None] * n
    for _ in range(min(max_buckets, n)):
        cur_cost = list(prev_cost)
        cur_cuts = list(prev_cuts)
        for j in range(1, n + 1):
            for i in range(j):
                if prev_cost[i] == INF:
                    continue
                cost = prev_cost[i] + (csum[j] - csum[i]) * lens[j - 1]
                if cost < cur_cost[j]:
                    cur_cost[j] = cost
                    cur_cuts[j] = prev_cuts[i] + [j]
        prev_cost, prev_cuts = cur_cost, cur_cuts
    return prev_cuts[n]


def from_dict_bucketed(all_tracks: Dict[str, np.ndarray],
                       max_buckets: int = 4,
                       canonical_shapes: bool = False,
                       **kw) -> list:
    """Split a length-keyed dict into a few padded TrackBatches so short
    tracks don't pay the longest track's scan length.

    Bucket edges are chosen by ``partition_cuts`` to minimize total padded
    work (sum over buckets of n_tracks * bucket_max_len).  The
    ``is_bleached`` convention stays global: only tracks at the DATASET
    maximum length are censored (extrack/tracking.py:1037-1040).
    ``canonical_shapes`` pads every bucket to the canonical (T, B)
    program-shape ladder so fresh processes hit the persistent compilation
    cache.
    """
    lens = sorted(int(k) for k in all_tracks if len(all_tracks[k]) > 0)
    if not lens:
        raise ValueError("No tracks found. The loaded tracks seem empty.")
    counts = {l: len(all_tracks[str(l)]) for l in lens}
    data_max = max(lens)
    cuts = partition_cuts(lens, [counts[l] for l in lens], max_buckets)

    batches = []
    start = 0
    for end in cuts:
        group = {str(l): all_tracks[str(l)] for l in lens[start:end]}
        sub_kw = dict(kw)
        for name in ("input_loc_err", "frames", "dt"):
            if kw.get(name) is not None:
                sub_kw[name] = {k: kw[name][k] for k in group}
        if canonical_shapes:
            # all padding happens in NumPy inside from_dict: eager device
            # pads cost a multi-second remote-compile roundtrip EACH
            width = max(int(l) for l in lens[start:end])
            n_grp = sum(len(v) for v in group.values())
            sub_kw["max_len"] = canonical_len(
                max(width, sub_kw.get("max_len") or 0))
            sub_kw["pad_batch"] = canonical_batch(n_grp)
        # global censoring convention rides into from_dict so no eager
        # device round-trip is needed here
        batches.append(from_dict(group, data_max=data_max, **sub_kw))
        start = end
    return batches


def host_lengths(batch: TrackBatch) -> np.ndarray:
    """Lengths as a host array, without a device pull when from_dict cached
    them (the first device->host transfer through the remote-TPU tunnel
    costs 60-300+ s)."""
    cached = getattr(batch, "np_lengths", None)
    if cached is not None:
        return cached
    return np.asarray(batch.lengths)


def to_dict(batch: TrackBatch, values: Optional[np.ndarray] = None
            ) -> Dict[str, np.ndarray]:
    """Regroup a padded batch (or per-track ``values`` aligned with it) into
    the reference's length-keyed dict format."""
    lengths = host_lengths(batch)
    src = np.asarray(batch.positions if values is None else values)
    out: Dict[str, np.ndarray] = {}
    for t in np.unique(lengths):
        if t < 1:
            continue
        sel = lengths == t
        out[str(int(t))] = src[sel][:, :int(t)] if src.ndim > 1 else src[sel]
    return out

def default_min_len(lens: np.ndarray) -> int:
    """Dataset default for the closing gate: the shortest real track,
    clamped to >= 2 (length-1 rows are padding or degenerate; reference
    min_len inference, extrack/tracking.py:1009).  min_len is a STATIC
    program argument shared by the fit objective, the Fisher Hessian and
    every post-fit driver — one definition keeps them in lockstep."""
    lens = np.asarray(lens)
    return int(lens[lens >= 2].min()) if (lens >= 2).any() else 2
