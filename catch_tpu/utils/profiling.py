"""Profiling hooks (SURVEY.md §5: the reference has none; the TPU
build adds real jax.profiler tracing).

Set CATCH_TPU_PROFILE_DIR=/path to capture one trace per hot region
(cover scan, set-cover solve) into that directory on the region's
first execution; view with TensorBoard or xprof.  Unset (the default)
the hooks are free.

Round-2 profile summary of the flagship bench (ebola175, one v5e chip)
lives in PROFILE.md at the repo root.
"""

import contextlib
import logging
import os

logger = logging.getLogger(__name__)

_captured = set()


@contextlib.contextmanager
def maybe_trace(region):
    """Trace the wrapped block with jax.profiler on first execution.

    One capture per region name per process, so steady-state loops pay
    nothing and the trace directory stays small.
    """
    trace_dir = os.environ.get("CATCH_TPU_PROFILE_DIR")
    if not trace_dir or region in _captured:
        yield
        return
    _captured.add(region)
    import jax

    path = os.path.join(trace_dir, region)
    os.makedirs(path, exist_ok=True)
    logger.info("Capturing jax.profiler trace for region %r to %s",
                region, path)
    cm = None
    try:
        cm = jax.profiler.trace(path)
        cm.__enter__()
    except Exception:
        logger.exception("Could not start profiler trace for %r; "
                         "continuing without it", region)
        cm = None
    try:
        yield
    finally:
        if cm is not None:
            try:
                cm.__exit__(None, None, None)
            except Exception:
                logger.exception("Profiler trace for %r failed to "
                                 "finalize", region)
