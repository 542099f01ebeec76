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

import os


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
