"""Backend selection shared by every pallas/xla dual-path op.

The Pallas kernels (ops/sgm_pallas.py, ops/dp_pallas.py) lower through
Mosaic and use TPU-only primitives (``pltpu.roll``, VMEM block specs), so
``backend="auto"`` must resolve to "pallas" only when the default JAX
backend is actually a TPU — on GPU or any other accelerator the kernels
would fail to lower, and the XLA scan formulations are the portable path.
"""

from __future__ import annotations

import jax

_VALID = ("pallas", "xla")


def resolve_backend(backend: str) -> str:
    """Resolve "auto" to "pallas" (TPU) or "xla" (anything else).

    Explicit "pallas"/"xla" pass through untouched; anything else raises.
    """
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend not in _VALID:
        raise ValueError(
            f"unknown backend {backend!r}; expected 'auto', 'pallas' or 'xla'")
    return backend
