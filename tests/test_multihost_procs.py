"""Multi-host input pipeline exercised with REAL multiple processes:
two jax.distributed-initialized CPU processes (4 virtual devices each)
assemble per-process track slices into one global 8-device batch and
compute the sharded log-likelihood.  Validates the slice/assembly logic
(process_slice, global_batch) beyond the single-process degenerate case.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys, json
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    import numpy as np
    from extrack_tpu import data as tdata, simulate
    from extrack_tpu.core import tables
    from extrack_tpu.parallel import mesh as pmesh, multihost

    tracks, _, _ = simulate.sim_fov(
        nb_tracks=64, max_track_len=9, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=17)
    # deterministic global item list; every process loads ONLY its slice
    items = [(k, i) for k in sorted(tracks, key=int)
             for i in range(len(tracks[k]))]
    mine = items[multihost.process_slice(len(items))]
    local = {}
    for k, i in mine:
        local.setdefault(k, []).append(tracks[k][i])
    local = {k: np.asarray(v) for k, v in local.items()}
    data_max = max(int(k) for k in tracks)
    batch = tdata.from_dict(local, max_len=data_max, data_max=data_max)
    gb = multihost.global_batch(batch)
    tb = tables.build_tables(
        np.array([0.0, 0.08]), 0.02, np.array([0.5, 0.5]),
        np.array([[0.0, 0.1], [0.1, 0.0]]), 0.05, 0.02, cell_dims=(0.5,))
    mesh = multihost.global_mesh()
    logl = float(pmesh.sharded_log_likelihood(gb, tb, window=4, min_len=3,
                                              mesh=mesh))
    print("RESULT " + json.dumps({"pid": pid, "n_local": len(mine),
                                  "n_devices": len(jax.devices()),
                                  "logl": logl}), flush=True)
""" % REPO)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_batch_matches_single():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=280) for p in procs]
    results = {}
    for (out, err), p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT in:\n{out}\n{err}"
        r = json.loads(line[0][len("RESULT "):])
        results[r["pid"]] = r

    assert results[0]["n_devices"] == 8          # 2 procs x 4 devices
    assert results[0]["n_local"] + results[1]["n_local"] > 0
    # both processes agree on the GLOBAL likelihood (psum across hosts)
    assert results[0]["logl"] == results[1]["logl"]

    # single-process reference over the full dataset
    from extrack_tpu import data as tdata, simulate
    from extrack_tpu.core import tables
    from extrack_tpu.parallel import mesh as pmesh
    tracks, _, _ = simulate.sim_fov(
        nb_tracks=64, max_track_len=9, min_track_len=3, LocErr=0.02,
        Ds=(0.0, 0.08), TrMat=np.array([[0.9, .1], [.1, .9]]), dt=0.02,
        pBL=0.05, cell_dims=(0.5, None, None), seed=17)
    n_items = sum(len(v) for v in tracks.values())
    assert results[0]["n_local"] + results[1]["n_local"] == n_items
    batch = tdata.from_dict(tracks)
    tb = tables.build_tables(
        np.array([0.0, 0.08]), 0.02, np.array([0.5, 0.5]),
        np.array([[0.0, 0.1], [0.1, 0.0]]), 0.05, 0.02, cell_dims=(0.5,))
    ref = float(pmesh.sharded_log_likelihood(batch, tb, window=4, min_len=3))
    np.testing.assert_allclose(results[0]["logl"], ref, rtol=1e-12)


WORKER_UNEVEN = textwrap.dedent("""
    import os, sys, json
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address="localhost:" + port,
                               num_processes=2, process_id=pid)
    import numpy as np
    from extrack_tpu import data as tdata
    from extrack_tpu.core import tables
    from extrack_tpu.parallel import mesh as pmesh, multihost

    # 9 items over 2x4 devices: proc0 loads 5, proc1 loads 4 — without a
    # globally agreed row count the inferred global shapes diverge (16 vs
    # 8) and the psum hangs/crashes
    rng = np.random.default_rng(3)
    pos = rng.normal(0, 0.1, (9, 5, 2)).cumsum(1)
    mine = pos[multihost.process_slice(9)]
    batch = tdata.from_dict({"5": mine})
    gb = multihost.global_batch(batch)
    lens = tdata.host_lengths(gb)            # np_lengths cache (global)
    tb = tables.build_tables(
        np.array([0.0, 0.08]), 0.02, np.array([0.5, 0.5]),
        np.array([[0.0, 0.1], [0.1, 0.0]]), 0.05, 0.02, cell_dims=(0.5,))
    logl = float(pmesh.sharded_log_likelihood(
        gb, tb, window=4, min_len=2, mesh=multihost.global_mesh()))
    print("RESULT " + json.dumps({
        "pid": pid, "rows": int(gb.batch_size),
        "n_valid": int((lens > 0).sum()), "logl": logl}), flush=True)
""" % REPO)


def test_two_process_uneven_split():
    """Uneven per-process loads agree on shapes via the allgathered row
    count (regression: independent padding diverged the SPMD program)."""
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER_UNEVEN, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=280) for p in procs]
    results = {}
    for (out, err), p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT in:\n{out}\n{err}"
        r = json.loads(line[0][len("RESULT "):])
        results[r["pid"]] = r
    assert results[0]["rows"] == results[1]["rows"] == 16   # 2 x ceil(5/4)*4
    assert results[0]["n_valid"] == 9                       # global lengths
    assert results[0]["logl"] == results[1]["logl"]

    # single-process reference over all 9 tracks
    import numpy as np
    from extrack_tpu import data as tdata
    from extrack_tpu.core import tables
    from extrack_tpu.parallel import mesh as pmesh
    rng = np.random.default_rng(3)
    pos = rng.normal(0, 0.1, (9, 5, 2)).cumsum(1)
    batch = tdata.from_dict({"5": pos})
    tb = tables.build_tables(
        np.array([0.0, 0.08]), 0.02, np.array([0.5, 0.5]),
        np.array([[0.0, 0.1], [0.1, 0.0]]), 0.05, 0.02, cell_dims=(0.5,))
    ref = float(pmesh.sharded_log_likelihood(batch, tb, window=4, min_len=2))
    np.testing.assert_allclose(results[0]["logl"], ref, rtol=1e-12)
