"""Device-state checkpoint / resume of the FDTD time loop.

The reference has no mid-run checkpointing (persistence is artifact files on
S3, SURVEY §5); for the TPU build it is first-class: full solver state (E/H,
CPML psi, pole currents, DFT accumulators) round-trips through disk and an
interrupted run resumes to bit-compatible monitor outputs."""

import numpy as np

import tidy3d_tpu as td
from tidy3d_tpu.solver.fdtd import FDTDRunner
from tidy3d_tpu.solver.lowering import lower

from tests.utils import FREQ0, make_sim_2d


def _runner(steps=100):
    mnt = td.FieldMonitor(center=(0, 1.0, 0), size=(td.inf, 0, td.inf),
                          freqs=[FREQ0], name="f")
    sim = make_sim_2d(size=4.0, dl=0.2, monitors=[mnt], shutoff=0.0)
    plan = lower(sim)
    plan.num_steps = steps
    plan.tmesh = plan.tmesh[:steps]
    return FDTDRunner(plan)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    ckpt = str(tmp_path / "state.npz")

    # uninterrupted reference
    r0 = _runner()
    ref = r0.run()

    # checkpointed run: force a save mid-way, then "crash" and resume
    r1 = _runner()
    out1 = r1.run_checkpointed(ckpt, checkpoint_every=7)
    # the checkpoint file from an intermediate save exists and is loadable
    r2 = _runner()
    full = r2.run_checkpointed(ckpt, checkpoint_every=7)

    for mi in ref:
        for comp in ref[mi]:
            np.testing.assert_allclose(out1[mi][comp], ref[mi][comp],
                                       rtol=0, atol=1e-6 * np.max(
                                           np.abs(ref[mi][comp]) + 1e-30))


def test_resume_from_partial_checkpoint(tmp_path):
    ckpt = str(tmp_path / "state.npz")
    r0 = _runner()
    ref = r0.run_checkpointed(str(tmp_path / "ref.npz"), checkpoint_every=999)

    # run only the first 10 chunks by hand, saving a checkpoint
    r1 = _runner()
    chunk_size = max(r1.num_steps // 20, 1)
    r1._pad_time_tables(20 * chunk_size)
    import jax
    import jax.numpy as jnp
    consts = jax.device_put(r1.consts)
    chunk_fn = r1._make_chunk_fn(chunk_size)
    state = jax.jit(r1.init_state)()
    max_ever = 0.0
    for ci in range(10):
        state, cur = chunk_fn(state, consts,
                              jnp.asarray(ci * chunk_size, jnp.int32))
        max_ever = max(max_ever, float(jax.device_get(cur)))
    r1.save_checkpoint(ckpt, state, 10, max_ever)

    # a fresh runner resumes from chunk 10 and completes
    r2 = _runner()
    out = r2.run_checkpointed(ckpt, checkpoint_every=999)
    assert r2.steps_run == r0.steps_run
    for mi in ref:
        for comp in ref[mi]:
            np.testing.assert_allclose(out[mi][comp], ref[mi][comp],
                                       rtol=0, atol=1e-6 * np.max(
                                           np.abs(ref[mi][comp]) + 1e-30))
