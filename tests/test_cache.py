"""utils/cache.py: env sanitation gates and the per-machine cache key."""

import os

from dupl_tpu.utils.cache import _machine_key, sanitize_tpu_env


def test_sanitize_drops_poisoned_hostnames():
    env = {"TPU_WORKER_HOSTNAMES":
           "WARNING: could not determine TPU worker hostnames"}
    sanitize_tpu_env(env)
    assert "TPU_WORKER_HOSTNAMES" not in env

    env = {"TPU_WORKER_HOSTNAMES": "   "}
    sanitize_tpu_env(env)
    assert "TPU_WORKER_HOSTNAMES" not in env


def test_sanitize_keeps_valid_hostnames():
    env = {"TPU_WORKER_HOSTNAMES": "t1k-worker-0,t1k-worker-1"}
    sanitize_tpu_env(env)
    assert env["TPU_WORKER_HOSTNAMES"] == "t1k-worker-0,t1k-worker-1"
    sanitize_tpu_env(env={})  # empty env: no-op, no raise


def test_machine_key_stable_and_hexish():
    a, b = _machine_key(), _machine_key()
    assert a == b and len(a) == 12
    int(a, 16)  # sha1 prefix
