"""Persistent compilation cache (eilev_tpu/utils/compile_cache.py).

Guards: enabling the cache actually persists compiled executables to the
directory, the env-var path is honored, and the no-op path stays a no-op.
Config flags are process-global, so every test restores them.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from eilev_tpu.utils import enable_compilation_cache, maybe_enable_compilation_cache


@pytest.fixture()
def restore_cache_config():
    keys = (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_compile_time_secs",
        "jax_persistent_cache_min_entry_size_bytes",
    )
    saved = {k: jax.config._read(k) for k in keys}
    yield
    for k, v in saved.items():
        jax.config.update(k, v)


def test_cache_dir_gets_entries(tmp_path, restore_cache_config):
    d = enable_compilation_cache(str(tmp_path / "xla"), min_compile_time_secs=0.0)
    assert os.path.isdir(d)

    @jax.jit
    def unique_fn_compile_cache_test(x):
        return jnp.tanh(x) @ x.T + 3.25

    unique_fn_compile_cache_test(jnp.ones((32, 32))).block_until_ready()
    assert os.listdir(d), "no cache entries persisted"


def test_maybe_enable_env(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.delenv("EILEV_COMPILATION_CACHE", raising=False)
    assert maybe_enable_compilation_cache() is None

    monkeypatch.setenv("EILEV_COMPILATION_CACHE", str(tmp_path / "env_cache"))
    d = maybe_enable_compilation_cache()
    assert d is not None and os.path.isdir(d)
    # explicit path overrides the env
    d2 = maybe_enable_compilation_cache(str(tmp_path / "explicit"))
    assert d2 is not None and d2.endswith("explicit")
