"""Top-K pruning kernel parity vs the XLA segment_histogram scan
(interpret mode): the two engines implement the same selection rule
(one-step-lookahead top-M, /root/reference/extrack/histograms.py:179-206)
so their histograms must agree to float tolerance whenever no exact
score ties cross the selection boundary (random data: measure zero)."""
import numpy as np
import pytest

import jax.numpy as jnp

from extrack_tpu import histograms
from extrack_tpu.ops import pallas_topk
from tests.test_pallas import _setup


def _run_pair(seed, S=2, n=1, M=16, T=7, n_tracks=24, block=128):
    xs, lengths, isbl, tb = _setup(seed, n_tracks=n_tracks, T=T, S=S, n=n)
    args = (jnp.asarray(xs), jnp.asarray(lengths),
            jnp.asarray(isbl, jnp.float32), tb)
    ref = histograms.segment_histogram(*args, max_nb_states=M, min_len=3,
                                       nb_substeps=n)
    got = pallas_topk.segment_topk_pallas(*args, max_nb_states=M,
                                          min_len=3, nb_substeps=n,
                                          block=block, interpret=True)
    return np.asarray(ref), np.asarray(got), np.asarray(lengths)


@pytest.mark.parametrize("S,n,M", [(2, 1, 16), (3, 1, 16), (2, 2, 16)])
def test_topk_kernel_matches_scan(S, n, M):
    ref, got, lengths = _run_pair(40 + 10 * S + n, S=S, n=n, M=M)
    assert got.shape == ref.shape
    # the top-M rule is DISCONTINUOUS at the selection boundary: f32
    # op-order differences can re-rank near-tied sequences at the prune
    # margin, moving one marginal sequence's (small) weight between bins
    # — the unpruned test below is the exactness check
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-2)
    # mass conservation: expected frames = sum_l l * count_l
    frames = float((got * np.arange(1, got.shape[0] + 1)[:, None]).sum())
    np.testing.assert_allclose(frames, float(lengths.sum()), rtol=2e-3)


def test_topk_kernel_unpruned_exact():
    """M >= all 3^4 = 81 sequences: selection cannot differ between the
    engines, so any mismatch beyond f32 arithmetic noise is a real bug."""
    ref, got, _ = _run_pair(63, S=3, n=1, M=88, T=5, n_tracks=20)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_topk_kernel_register_saturated():
    """M smaller than the live sequence count: pruning actually fires and
    both engines prune the SAME sequences."""
    ref, got, _ = _run_pair(77, S=2, n=1, M=8, T=8, n_tracks=40)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_topk_kernel_multiple_blocks():
    ref, got, _ = _run_pair(91, S=2, n=1, M=16, T=6, n_tracks=300,
                            block=128)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_topk_kernel_rejects_variable_dt():
    from extrack_tpu.core import tables as ttables
    xs, lengths, isbl, _ = _setup(50, n_tracks=8, T=5)
    dt = np.linspace(0.01, 0.05, xs.shape[1] - 1)
    tb = ttables.build_tables(
        jnp.asarray([0.0, 0.1]), jnp.asarray(0.02),
        jnp.asarray([0.4, 0.6]), jnp.asarray([[0.0, 0.1], [0.15, 0.0]]),
        jnp.asarray(0.1), jnp.asarray(dt), cell_dims=(0.8,))
    with pytest.raises(NotImplementedError):
        pallas_topk.segment_topk_pallas(
            jnp.asarray(xs), jnp.asarray(lengths),
            jnp.asarray(isbl, jnp.float32), tb, max_nb_states=16,
            interpret=True)


def test_bitonic_topm_network():
    """The compare-exchange network selects the exact top-M with
    payloads consistent under ties."""
    import jax
    from jax.experimental import pallas as pl

    N, M, BLK = 64, 24, 128
    rng = np.random.default_rng(0)
    key = rng.normal(size=(N, BLK)).astype(np.float32)
    key[5] = key[9]                                 # exercise ties
    pay = np.arange(N * BLK, dtype=np.float32).reshape(N, BLK)

    def kern(k_ref, p_ref, ko_ref, po_ref):
        k, (p,) = pallas_topk.bitonic_topm(k_ref[:], [p_ref[:]], M)
        ko_ref[:] = k
        po_ref[:] = p

    ks, ps = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((M, BLK), jnp.float32),
                   jax.ShapeDtypeStruct((M, BLK), jnp.float32)),
        interpret=True,
    )(jnp.asarray(key), jnp.asarray(pay))
    ks, ps = np.asarray(ks), np.asarray(ps)
    order = np.argsort(-key, axis=0)
    np.testing.assert_allclose(
        ks, np.take_along_axis(key, order, axis=0)[:M])
    for lane in range(BLK):
        got = sorted(zip(ks[:, lane], ps[:, lane]))
        want = sorted(zip(key[order[:M, lane], lane],
                          pay[order[:M, lane], lane]))
        assert got == want, f"payload mismatch in lane {lane}"
