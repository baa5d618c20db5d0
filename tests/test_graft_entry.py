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

    def test_dryrun_reexec_bootstrap(self):
        """The driver calls dryrun_multichip from an un-prepared process (the
        axon plugin gives it 1 device); the entry must re-exec itself with a
        forced n-device CPU platform.  Exercise that child path directly."""
        ge._reexec_dryrun(2)
