"""Sharded post-fit drivers == single-device results (8-CPU virtual mesh)."""
import numpy as np

import jax
import jax.numpy as jnp

from extrack_tpu import data as tdata, histograms, refine
from extrack_tpu.core import engine, tables
from extrack_tpu.parallel import mesh as pmesh


def _batch_tables(seed=0, B=36, T=9, D=2):
    rng = np.random.default_rng(seed)
    tracks = {}
    lens = rng.integers(3, T + 1, B)
    for L in np.unique(lens):
        n = int((lens == L).sum())
        tracks[str(L)] = np.cumsum(rng.normal(0, 0.05, (n, int(L), D)),
                                   axis=1)
    batch = tdata.from_dict(tracks)
    tb = tables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(0.02), jnp.asarray([0.4, 0.6]),
        jnp.asarray([[0.0, 0.1], [0.15, 0.0]]), jnp.asarray(0.1),
        jnp.asarray(0.02), cell_dims=(0.8,))
    return batch, tb


def test_sharded_posteriors_match_single():
    batch, tb = _batch_tables(1)
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    logl_1, preds_1 = engine.forward(
        batch.positions, batch.lengths, batch.is_bleached, tb,
        window=5, min_len=3, return_preds=True)
    sb = pmesh.shard_batch(batch, mesh)
    logl_8, preds_8 = pmesh.sharded_posteriors(sb, tb, window=5, min_len=3,
                                               mesh=mesh)
    B = batch.batch_size
    np.testing.assert_allclose(np.asarray(logl_8)[:B], np.asarray(logl_1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(preds_8)[:B], np.asarray(preds_1),
                               rtol=1e-12, atol=1e-12)


def test_sharded_histogram_matches_single():
    batch, tb = _batch_tables(2)
    mesh = pmesh.make_mesh()
    h1 = histograms.window_segment_histogram(
        batch.positions, batch.lengths, batch.is_bleached, tb,
        window=5, min_len=3)
    sb = pmesh.shard_batch(batch, mesh)
    h8 = pmesh.sharded_histogram(sb, tb, window=5, min_len=3, mesh=mesh)
    np.testing.assert_allclose(np.asarray(h8), np.asarray(h1),
                               rtol=1e-12, atol=1e-12)


def test_sharded_refine_matches_single():
    batch, _ = _batch_tables(3)
    mesh = pmesh.make_mesh()
    log_trans = jnp.log(jnp.asarray([[0.9, 0.1], [0.2, 0.8]]))
    sig2 = jnp.asarray([0.02 ** 2, 0.1 ** 2])
    le2 = jnp.asarray(0.02 ** 2)[None, None, None]
    mu1, sg1 = refine.refine_positions(batch.positions, batch.lengths, le2,
                                       log_trans, sig2, window=5)
    sb = pmesh.shard_batch(batch, mesh)
    mu8, sg8 = pmesh.sharded_refine(sb.positions, sb.lengths, le2,
                                    log_trans, sig2, window=5, mesh=mesh)
    B = batch.batch_size
    np.testing.assert_allclose(np.asarray(mu8)[:B], np.asarray(mu1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sg8)[:B], np.asarray(sg1),
                               rtol=1e-12, atol=1e-12)


def test_sharded_refine_per_peak_locerr():
    batch, _ = _batch_tables(4)
    rng = np.random.default_rng(0)
    mesh = pmesh.make_mesh()
    log_trans = jnp.log(jnp.asarray([[0.9, 0.1], [0.2, 0.8]]))
    sig2 = jnp.asarray([0.02 ** 2, 0.1 ** 2])
    le2 = jnp.asarray(rng.uniform(0.01, 0.04,
                                  batch.positions.shape) ** 2)
    mu1, sg1 = refine.refine_positions(batch.positions, batch.lengths, le2,
                                       log_trans, sig2, window=5)
    sb = pmesh.shard_batch(batch, mesh)
    n = sb.batch_size
    le2_p = jnp.pad(le2, ((0, n - le2.shape[0]), (0, 0), (0, 0)),
                    constant_values=1.0)
    le2_s = jax.device_put(
        le2_p, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(pmesh.DATA_AXIS)))
    mu8, sg8 = pmesh.sharded_refine(sb.positions, sb.lengths, le2_s,
                                    log_trans, sig2, window=5, mesh=mesh)
    B = batch.batch_size
    np.testing.assert_allclose(np.asarray(mu8)[:B], np.asarray(mu1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sg8)[:B], np.asarray(sg1),
                               rtol=1e-12, atol=1e-12)


def test_driver_sharded_flags_match_unsharded():
    """predict_batch / len_hist / position_refinement with sharded=True."""
    from extrack_tpu import predict, params as tparams
    rng = np.random.default_rng(9)
    tracks = {"5": np.cumsum(rng.normal(0, 0.05, (9, 5, 2)), axis=1),
              "7": np.cumsum(rng.normal(0, 0.05, (6, 7, 2)), axis=1)}
    p = tparams.generate_params(nb_states=2, D_max=1.0)
    batch = tdata.from_dict(tracks)
    logl1, preds1 = predict.predict_batch(batch, p, 0.02, 2, window=5)
    logl8, preds8 = predict.predict_batch(batch, p, 0.02, 2, window=5,
                                          sharded=True)
    np.testing.assert_allclose(np.asarray(logl8), np.asarray(logl1),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(preds8), np.asarray(preds1),
                               rtol=1e-12, atol=1e-12)

    h1 = histograms.len_hist(tracks, p, 0.02, nb_states=2, window=5)
    h8 = histograms.len_hist(tracks, p, 0.02, nb_states=2, window=5,
                             sharded=True)
    np.testing.assert_allclose(h8, h1, rtol=1e-12, atol=1e-12)

    ds = np.array([0.02, 0.1])
    tr = np.array([[0.9, 0.1], [0.2, 0.8]])
    mus1, sigs1 = refine.position_refinement(
        tracks, 0.02, ds, np.array([0.5, 0.5]), tr, frame_len=5)
    mus8, sigs8 = refine.position_refinement(
        tracks, 0.02, ds, np.array([0.5, 0.5]), tr, frame_len=5,
        sharded=True)
    for k in tracks:
        np.testing.assert_allclose(mus8[k], mus1[k], rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(sigs8[k], sigs1[k], rtol=1e-12,
                                   atol=1e-12)


def test_sharded_hist_batch_chunked_matches_unchunked():
    """The sharded XLA histogram path chunks per device (review fix):
    forcing a tiny chunk must not change the result."""
    batch, _ = _batch_tables(7, B=40)
    values = {"LocErr": 0.02, "D0": 0.0, "D1": 0.1, "F0": 0.4, "F1": 0.6,
              "p01": 0.1, "p10": 0.15, "pBL": 0.1}
    kw = dict(cell_dims=(0.8, None, None), nb_states=2, window=4,
              engine="xla")
    h_one = histograms.hist_batch(batch, values, 0.02, **kw)
    h_sh = histograms.hist_batch(batch, values, 0.02, sharded=True,
                                 chunk=2, **kw)
    np.testing.assert_allclose(np.asarray(h_sh), np.asarray(h_one),
                               rtol=1e-10, atol=1e-12)


def test_sharded_hist_topk_warns_and_runs():
    import warnings
    batch, _ = _batch_tables(8, B=12)
    values = {"LocErr": 0.02, "D0": 0.0, "D1": 0.1, "F0": 0.4, "F1": 0.6,
              "p01": 0.1, "p10": 0.15, "pBL": 0.1}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        h = histograms.hist_batch(batch, values, 0.02,
                                  cell_dims=(0.8, None, None), nb_states=2,
                                  engine="topk", sharded=True)
    assert any("sharded" in str(x.message) for x in w)
    assert np.isfinite(np.asarray(h)).all()


def test_sharded_predict_ineligible_shape_falls_back(monkeypatch):
    """sharded predict on a TPU-ineligible shape (cap 0) must fall back to
    the XLA engine, not crash (review fix)."""
    from extrack_tpu import predict
    # window=5 at T=260 exceeds the posterior kernel's VMEM budget
    # (predict_block_cap == 0), the smallest ineligible shape
    batch, _ = _batch_tables(9, B=8, T=260)
    values = {"LocErr": 0.02, "D0": 0.0, "D1": 0.1, "F0": 0.4, "F1": 0.6,
              "p01": 0.1, "p10": 0.15, "pBL": 0.1}
    kw = dict(cell_dims=(0.8,), window=5, min_len=3)
    logl_1, preds_1 = predict.predict_batch(batch, values, 0.02, 2, **kw)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    logl_8, preds_8 = predict.predict_batch(batch, values, 0.02, 2,
                                            sharded=True, **kw)
    np.testing.assert_allclose(np.asarray(logl_8), np.asarray(logl_1),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(preds_8), np.asarray(preds_1),
                               rtol=1e-10, atol=1e-12)


def test_sharded_hist_substeps_matches_single():
    """Regression: the sharded path used to build its tables WITHOUT
    nb_substeps (and run the engine without it), silently evaluating a
    substeps=1 model under the substep-expanded window."""
    batch, _ = _batch_tables(11, B=24, T=7)
    values = {"LocErr": 0.02, "D0": 0.0, "D1": 0.1, "F0": 0.4, "F1": 0.6,
              "p01": 0.1, "p10": 0.15, "pBL": 0.1}
    kw = dict(cell_dims=(0.8, None, None), nb_states=2, window=3,
              nb_substeps=2, engine="window")
    h_one = histograms.hist_batch(batch, values, 0.02, **kw)
    h_sh = histograms.hist_batch(batch, values, 0.02, sharded=True, **kw)
    np.testing.assert_allclose(np.asarray(h_sh), np.asarray(h_one),
                               rtol=1e-10, atol=1e-12)
