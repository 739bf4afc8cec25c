"""Model initialisation helper.

Flax's eager ``model.init`` dispatches one XLA op at a time.  On remote-relay
backends (the axon TPU tunnel) each dispatch costs an RTT, so initialising
the dual-branch flagship takes minutes; compiled as ONE program it is
seconds.  On CPU the trade inverts: eager per-op dispatch is cheap while a
whole-graph XLA compile of the flagship init is the expensive part (the
compile-heavy test lane).  So: jit the init everywhere except CPU.
"""

from __future__ import annotations

import jax

__all__ = ["init_variables"]


def init_variables(model, rngs, dummy, train: bool = False):
    """``model.init`` with backend-appropriate dispatch (see module doc).

    EUNET_JIT_INIT=1 forces the jitted path on CPU too — set by harnesses
    whose model is small enough that one init compile beats thousands of
    eager dispatches (the tiny-encoder multichip dryrun)."""
    import os

    init = lambda r, z: model.init(r, z, train=train)
    if (jax.default_backend() != "cpu"
            or os.environ.get("EUNET_JIT_INIT") == "1"):
        init = jax.jit(init)
    return init(rngs, dummy)
