"""Opt-in correctness guards (SURVEY.md §5 "race detection / sanitizers").

JAX is functional, so the reference's data-race surface doesn't exist here;
the equivalent hazards are NaN propagation, buffer-donation aliasing, and
nondeterminism. These guards are the framework's sanitizer mode.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import numpy as np


@contextlib.contextmanager
def debug_checks(nans: bool = True, infs: bool = True):
    """Enable jax_debug_nans/infs within a scope (slow; opt-in)."""
    import jax

    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def assert_deterministic(fn: Callable, *args, runs: int = 2, **kw) -> None:
    """Run ``fn`` twice and assert bitwise-identical outputs — catches
    donation/aliasing bugs and nondeterministic reductions."""
    import jax

    outs = [jax.tree.leaves(fn(*args, **kw)) for _ in range(runs)]
    for a, b in zip(outs[0], outs[-1]):
        a, b = np.asarray(a), np.asarray(b)
        if not np.array_equal(a, b, equal_nan=True):
            diff = np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))
            raise AssertionError(f"nondeterministic output (max |diff|={diff})")
