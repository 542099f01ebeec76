"""Make the ``JAX_PLATFORMS`` environment variable authoritative.

Some execution environments (e.g. a container whose sitecustomize registers
a remote TPU PJRT plugin) not only *register* their backend at interpreter
start but programmatically *select* it via ``jax.config`` — which silently
overrides a ``JAX_PLATFORMS=cpu`` the user set in the environment.  The
symptom is nasty: a "CPU" smoke run grabs the remote TPU and, if the relay
is wedged, hangs forever at the first array materialisation.

Call :func:`honor_jax_platforms_env` before the first device query (backend
selection in jax is lazy, so this is sufficient and cheap).  It is a no-op
when the env var is unset or already agrees with the config.
"""

from __future__ import annotations

import contextlib
import os

_kernel_platform_override = None


def kernel_platform() -> str:
    """Platform the compute kernels should lower for.

    Normally the ambient jax backend; :func:`force_kernel_platform` overrides
    it for cross-platform AOT export (``engine/export.py`` lowering the TPU
    Pallas kernels from a CPU host).  Trace-time only — reading it inside a
    jitted function pins the decision into that trace, exactly like the
    ``jax.default_backend()`` gates it generalises."""
    if _kernel_platform_override is not None:
        return _kernel_platform_override
    import jax

    return jax.default_backend()


@contextlib.contextmanager
def force_kernel_platform(platform: str):
    """Within the context, kernel dispatch gates (Pallas attention/PAR) see
    ``platform`` instead of the ambient backend."""
    global _kernel_platform_override
    prev = _kernel_platform_override
    _kernel_platform_override = platform
    try:
        yield
    finally:
        _kernel_platform_override = prev


def honor_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        current = jax.config.jax_platforms
    except AttributeError:  # pragma: no cover - very old jax
        current = None
    if current != plat:
        jax.config.update("jax_platforms", plat)
