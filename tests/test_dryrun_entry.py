"""Driver-artifact regression guard: __graft_entry__.dryrun_multichip must
complete on the 8-virtual-device CPU mesh inside the driver's budget
(MULTICHIP_r03 timed out at the b0-encoder compile; the tiny-encoder
flagship dryrun measured ~8x faster).  Running it here also pre-warms the
shared persistent compilation cache (conftest.py wires the same
JAX_COMPILATION_CACHE_DIR) for the driver's own run."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally; raises on any failure
    out = capsys.readouterr().out
    assert "dryrun_multichip(8) OK" in out


def test_entry_returns_jittable():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    # compile-check only on CPU would be minutes; eval_shape validates the
    # traced graph + shapes without running the compile
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 256, 256, 3)
