"""Transient-failure retry for the axon TPU tunnel.

The tunnel's terminal-side compile endpoint (POST /remote_compile) drops
a response roughly once per 1-2 h of heavy compile traffic ("read body:
response body closed before all bytes were read") — measured twice in
round 5 killing a 19-block pass-1 at blocks 11 and 17 with NO concurrent
load (docs/NOTES_r5.md; the r4 fe24boot "tunnel drop" provenance note
was the same failure).  The request is stateless: a retry of the SAME
jitted call re-POSTs the compile and continues.  This wrapper retries
exactly that failure class and re-raises everything else.
"""

from __future__ import annotations

import time

__all__ = ["retry_transient", "is_transient"]

# transport drops only — an HTTP 500 from the compile endpoint means the
# compile RAN and failed (e.g. a genuine HBM OOM shows as "HTTP 500:
# tpu_compile_helper subprocess exit code 1" with the real error only in
# the terminal log); retrying those wastes attempts and hides the cause
_TRANSIENT_MARKERS = (
    "response body closed",
    "read body",
    "connection reset",
)


def is_transient(exc: BaseException) -> bool:
    msg = str(exc).lower()
    return any(m in msg for m in _TRANSIENT_MARKERS)


def retry_transient(fn, *args, attempts: int = 3, log_fn=None,
                    backoff_s: float = 10.0, **kwargs):
    """Call fn(*args, **kwargs), retrying tunnel-transient failures.

    The caller must pass a fn whose retry is idempotent (pure jitted
    dispatches are; host-mutating closures are not)."""
    for attempt in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # JaxRuntimeError lives in jax.errors
            if not is_transient(e) or attempt == attempts - 1:
                raise
            if log_fn:
                log_fn(f"  transient tunnel failure (attempt "
                       f"{attempt + 1}/{attempts}): "
                       f"{str(e).splitlines()[0][:120]} — retrying in "
                       f"{backoff_s:.0f}s")
            time.sleep(backoff_s)
