"""Persistent XLA compilation cache + TPU environment sanitation.

Remote compilation through the TPU relay costs minutes for the big jitted
programs (full train step, bench pipeline); the persistent cache brings repeat
runs down to seconds.  Call :func:`enable_compilation_cache` before the first
jit execution (safe to call multiple times)."""

from __future__ import annotations

import os


def sanitize_tpu_env(env=None) -> None:
    """Drop a poisoned ``TPU_WORKER_HOSTNAMES`` from the environment.

    libtpu parses this variable as a hostname list; host tooling has been
    observed leaving a literal warning string ("WARNING: could not determine
    TPU worker hostnames ...") in it, which makes discovery fail instantly in
    every child process — the backend silently falls back to CPU.  Hostname
    lists never contain whitespace, so anything with spaces (or an empty
    value) is garbage; discovery works fine with the variable unset."""
    env = os.environ if env is None else env
    v = env.get("TPU_WORKER_HOSTNAMES")
    if v is not None and (not v.strip() or " " in v.strip()):
        env.pop("TPU_WORKER_HOSTNAMES", None)


def _machine_key() -> str:
    """Fingerprint of the host CPU's ISA features.

    XLA:CPU AOT artifacts are compiled for the build machine's feature set;
    reusing them on a host with different features emits "could lead to
    SIGILL" warnings (and can actually SIGILL).  Keying the cache directory
    on the flags line of /proc/cpuinfo keeps each machine's artifacts
    separate while still sharing across runs on the same machine."""
    import hashlib
    import platform

    feats = platform.machine()
    got_model = got_flags = False
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # model name too: XLA derives uarch tuning preferences
                # (prefer-no-scatter/-gather) from the CPU model, not just
                # its feature flags — two machines with identical flags can
                # still produce incompatible AOT artifacts
                if not got_model and line.startswith("model name"):
                    feats += " " + line.split(":", 1)[1].strip()
                    got_model = True
                elif not got_flags and line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    got_flags = True
                if got_model and got_flags:
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    sanitize_tpu_env()
    import jax

    path = path or os.environ.get(
        "DUPL_TPU_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    path = os.path.join(path, _machine_key())
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimisation, never a requirement
