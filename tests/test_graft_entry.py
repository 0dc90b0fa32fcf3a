"""The driver contract: entry() compiles single-device; dryrun_multichip
executes a data-parallel step over the 8-device CPU mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss, out = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert out.shape[-3:] == (48, 48, 3)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_phase_timers():
    from imitation_from_observation_tpu.core.profiling import PhaseTimers

    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert t.summary()["a"] >= 0
