"""Checkpoint schema + elastic resume tests (SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp

from voronoirt_tpu import Config, synthetic_atmosphere
from voronoirt_tpu.physics import lyman_alpha_line
from voronoirt_tpu.engine import RegularEngine
from voronoirt_tpu.engine.checkpoint import CheckpointFile, recover


def _engine(cfg, atmos):
    line = lyman_alpha_line(cfg.nlam_bb, cfg.nlam_bf,
                            jnp.asarray(atmos.temperature))
    return RegularEngine(atmos, line, cfg)


def test_schema_and_resume(tmp_path):
    atmos = synthetic_atmosphere(nz=8, nx=5, ny=5, seed=2)
    cfg = Config(eps=1e-3, maxiter=4, nlam_bb=5, nlam_bf=3,
                 quadrature="n2")
    path = str(tmp_path / "out.h5")

    # full run with checkpointing
    eng = _engine(cfg, atmos)
    ckpt = CheckpointFile(path)
    ckpt.create_regular(eng.line, atmos, cfg.maxiter)
    from voronoirt_tpu.engine.lambda_iter import _run_iteration
    res_full = _run_iteration(eng, checkpoint=ckpt)

    # schema: reference dataset names exist with the right shapes
    import h5py
    with h5py.File(path) as f:
        assert f["source_function"].shape == (eng.line.n_lambda,) + atmos.shape
        assert f["populations"].shape == atmos.shape + (3,)
        assert f["convergence"].shape == (cfg.maxiter + 1,)
        assert int(f["n_bb"][0]) == 5
        assert np.isclose(f["line_center"][0], 121.568, rtol=1e-3)
        assert np.allclose(f["wavelength"][:], eng.line.lam * 1e9)

    # simulate a crash after iteration 1: truncate the file state
    path2 = str(tmp_path / "crash.h5")
    eng2 = _engine(cfg, atmos)
    ckpt2 = CheckpointFile(path2)
    ckpt2.create_regular(eng2.line, atmos, cfg.maxiter)

    class StopAfter:
        def __init__(self, inner, n):
            self.inner, self.n, self.count = inner, n, 0

        def write_convergence(self, i, d):
            self.inner.write_convergence(i, d)

        def write_state(self, p, s):
            self.inner.write_state(p, s)
            self.count += 1
            if self.count >= self.n:
                raise KeyboardInterrupt

    try:
        _run_iteration(eng2, checkpoint=StopAfter(ckpt2, 2))
    except KeyboardInterrupt:
        pass

    it = ckpt2.resume_iteration()
    assert it >= 1

    # resume and compare against the uninterrupted run
    eng3 = _engine(cfg, atmos)
    res_resumed = recover(eng3, path2)
    assert np.allclose(res_resumed.S, res_full.S, rtol=1e-8)
    assert np.allclose(res_resumed.populations, res_full.populations,
                       rtol=1e-8)


def test_orbax_backend_crash_resume(tmp_path):
    """Orbax backend: same crash/resume contract as the HDF5 store."""
    from voronoirt_tpu.engine.checkpoint_orbax import (OrbaxCheckpoint,
                                                       recover_orbax)
    from voronoirt_tpu.engine.lambda_iter import _run_iteration

    atmos = synthetic_atmosphere(nz=8, nx=5, ny=5, seed=2)
    cfg = Config(eps=1e-3, maxiter=4, nlam_bb=5, nlam_bf=3,
                 quadrature="n2")

    eng = _engine(cfg, atmos)
    res_full = _run_iteration(eng)   # ground truth, no checkpointing

    # checkpoint synchronously and crash after the 2nd write
    class StopAfter:
        def __init__(self, inner, n):
            self.inner, self.n, self.count = inner, n, 0

        def write_convergence(self, i, d):
            self.inner.write_convergence(i, d)

        def write_state(self, p, s):
            self.inner.write_state(p, s)
            self.count += 1
            if self.count >= self.n:
                raise KeyboardInterrupt

    path = str(tmp_path / "orbax_ckpt")
    ckpt = OrbaxCheckpoint(path, async_save=False)
    ckpt.create_regular(eng.line, atmos, cfg.maxiter)
    try:
        _run_iteration(_engine(cfg, atmos), checkpoint=StopAfter(ckpt, 2))
    except KeyboardInterrupt:
        pass
    ckpt.close()

    res_resumed = recover_orbax(_engine(cfg, atmos), path)
    assert np.allclose(res_resumed.S, res_full.S, rtol=1e-8)
    assert np.allclose(res_resumed.populations, res_full.populations,
                       rtol=1e-8)
    assert res_resumed.iterations == res_full.iterations
