"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4 item 4)."""
import jax
import numpy as np

from __graft_entry__ import dryrun_multichip, entry


class TestGraftEntry:
    def test_entry_compiles(self):
        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.T_CW.shape == (4, 4)

    def test_dryrun_multichip(self):
        assert len(jax.devices()) >= 8
        dryrun_multichip(8)
