"""Backend detection for the Pallas kernels.

The fused kernels lower through Mosaic and require a TPU backend; on a pure
CPU backend (the virtual 8-device test mesh) they run in Pallas interpret
mode instead — same semantics, executed through XLA:CPU. This keeps one code
path: the tests exercise the real kernel logic, the TPU runs the compiled
kernels.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["pallas_interpret"]


@functools.lru_cache(maxsize=1)
def pallas_interpret() -> bool:
    """True when pallas_call must run in interpret mode (no TPU backend)."""
    return jax.default_backend() == "cpu"
