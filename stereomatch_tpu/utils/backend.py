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


def warn_if_backend_init_stalls(seconds: float = 30.0):
    """Print a hint if no JAX backend has initialized after ``seconds``.

    Remote-relay PJRT plugins block indefinitely inside device discovery
    when the relay is unreachable, which turns every CLI's first device
    op into a silent hang.  The CLIs arm this one-shot daemon timer after
    argument parsing: if the backend table is still empty when it fires,
    the user learns what is stuck and that ``--device cpu`` runs on the
    host.  A no-op when initialization completed (the common case) —
    the timer sees a populated table and prints nothing.
    """
    import sys
    import threading

    # Host-backend runs can't stall in device discovery — don't arm a
    # timer whose late false-positive fire pollutes captured output
    # (CLI tests run mains in-process; their timers outlive the call).
    # Only the PRIMARY platform matters: "axon,cpu" still tries the
    # relay first and can hang there.
    platforms = str(jax.config.jax_platforms or "")
    if platforms.split(",")[0].strip() == "cpu":
        return None

    def check():
        import jax._src.xla_bridge as xb
        if not xb._backends:
            print(f"still initializing the accelerator runtime after "
                  f"{seconds:.0f}s — the device relay may be unreachable; "
                  f"pass --device cpu to run on the host backend",
                  file=sys.stderr, flush=True)

    timer = threading.Timer(seconds, check)
    timer.daemon = True
    timer.start()
    return timer


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
