"""Hardware-assumption shims for the dispatch predicates.

Every fast-path dispatch decision (Pallas phase kernels, VMEM external
loop, windowed external loop, lane-alignment gates) depends on the
attached backend and device.  Normally those come straight from the live
JAX runtime — but the dispatch REPORT (core.dispatch) must also be able
to answer "what would a real TPU decide for this configuration?" from a
CPU-only host (the dryrun/CI environment), the way the reference's
startup geometry validation is pure arithmetic (parallel_mpi.f:45-74).

All predicate code reads the backend through :func:`backend` /
:func:`device_kind` / :func:`device_count`; :func:`assume` temporarily
overrides them.  KERNEL-BEHAVIOR decisions (interpret mode) must keep
using ``jax.default_backend()`` directly — an override must never make a
CPU host try to launch Mosaic.
"""

from __future__ import annotations

import contextlib
import threading

import jax

_tls = threading.local()


def _ov():
    return getattr(_tls, "override", None)


def backend() -> str:
    ov = _ov()
    if ov is not None and ov[0] is not None:
        return ov[0]
    return jax.default_backend()


def device_kind() -> str:
    ov = _ov()
    if ov is not None and ov[1] is not None:
        return ov[1]
    try:
        return jax.devices()[0].device_kind
    except Exception:          # pragma: no cover - backend init failure
        return "unknown"


def device_count() -> int:
    ov = _ov()
    if ov is not None and ov[2] is not None:
        return ov[2]
    return jax.device_count()


@contextlib.contextmanager
def assume(backend_name=None, kind=None, count=None):
    """Pretend the given backend/device for the enclosed dispatch
    arithmetic (reporting only — never trace kernels under this)."""
    prev = _ov()
    _tls.override = (backend_name, kind, count)
    try:
        yield
    finally:
        _tls.override = prev


def assume_tpu(count: int = 1, kind: str = "TPU v5 lite"):
    """Shorthand: report dispatch as a single v5e-class chip would."""
    return assume("tpu", kind, count)
