"""Driver contract: entry() compiles single-chip, dryrun executes on a mesh."""
import jax
import numpy as np

import __graft_entry__ as ge


class TestGraftEntry:
    def test_entry_jits(self):
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (100, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_dryrun_two_devices(self):
        ge.dryrun_multichip(2)

    def test_dryrun_all_devices(self):
        ge.dryrun_multichip(len(jax.devices()))
