"""Tracing / profiling hooks.

The reference has no built-in tracing — performance work happens through
pytest-benchmark alone (SURVEY.md §5).  Here the pipeline stages carry
``jax.profiler`` trace annotations so a single capture shows cost /
aggregation / reduce spans against the device timeline, and a context
manager wraps capture sessions for tools like XProf/TensorBoard.

Usage:
    from stereomatch_tpu.utils import profiling

    with profiling.trace("/tmp/stm-trace"):
        pipeline.estimate(left, right)

    # or annotate custom regions:
    with profiling.annotate("my-stage"):
        ...
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named span on the host timeline; nests under jit boundaries."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False
          ) -> Iterator[None]:
    """Capture a device+host profile into ``log_dir`` for the duration."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate_fn(name: Optional[str] = None):
    """Decorator form of :func:`annotate`."""
    def wrap(fn):
        label = name or getattr(fn, "__name__", "fn")

        def inner(*args, **kwargs):
            with annotate(label):
                return fn(*args, **kwargs)

        inner.__name__ = getattr(fn, "__name__", "fn")
        inner.__doc__ = fn.__doc__
        return inner
    return wrap
