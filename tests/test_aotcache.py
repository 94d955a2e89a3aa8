"""AOT executable disk-cache tests (utils/aotcache).

The axon remote-compile path bypasses JAX's persistent compilation
cache, so bench/production processes persist *serialized executables*
instead. These tests force the cache on (it is TPU-only by default) and
exercise the save -> fresh-load -> run path, the key normalization, and
the fail-open fallbacks — all on the CPU backend, whose executables also
serialize.
"""

import functools
import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from score_tpu.utils import aotcache


@pytest.fixture
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("SCORE_TPU_AOT_CACHE", str(tmp_path))
    aotcache._EXES.clear()
    yield str(tmp_path)
    aotcache._EXES.clear()


@functools.partial(jax.jit, static_argnames=("c",))
def _scaled_mm(x, y, c):
    return (x @ y) * c


def _files(cache):
    return [f for f in os.listdir(cache) if f.endswith(".pkl")]


class TestCallCached:
    def test_save_then_reload(self, cache, caplog):
        x = jnp.arange(64.0).reshape(8, 8)
        y = jnp.eye(8)
        r1 = aotcache.call_cached(
            _scaled_mm, lower_args=(x, y, 3.0), static_kwargs={},
            dynamic_args=(x, y), tag="t", static_sig="c=3.0",
        )
        assert len(_files(cache)) == 1
        # simulate a fresh process: drop the in-memory executable memo
        aotcache._EXES.clear()
        with caplog.at_level(logging.INFO, logger="score_tpu.utils.aotcache"):
            r2 = aotcache.call_cached(
                _scaled_mm, lower_args=(x, y, 3.0), static_kwargs={},
                dynamic_args=(x, y), tag="t", static_sig="c=3.0",
            )
        assert any("loaded" in m for m in caplog.messages)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    def test_static_sig_separates_entries(self, cache):
        x = jnp.ones((8, 8))
        y = jnp.eye(8)
        r3 = aotcache.call_cached(
            _scaled_mm, lower_args=(x, y, 3.0), static_kwargs={},
            dynamic_args=(x, y), tag="t", static_sig="c=3.0",
        )
        r5 = aotcache.call_cached(
            _scaled_mm, lower_args=(x, y, 5.0), static_kwargs={},
            dynamic_args=(x, y), tag="t", static_sig="c=5.0",
        )
        assert len(_files(cache)) == 2
        assert float(r3[0, 0]) == pytest.approx(3.0)
        assert float(r5[0, 0]) == pytest.approx(5.0)

    def test_fail_open_on_corrupt_cache_file(self, cache):
        x = jnp.ones((4, 4))
        y = jnp.eye(4)
        kw = dict(lower_args=(x, y, 2.0), static_kwargs={},
                  dynamic_args=(x, y), tag="t", static_sig="c=2.0")
        aotcache.call_cached(_scaled_mm, **kw)
        (fname,) = _files(cache)
        with open(os.path.join(cache, fname), "wb") as f:
            f.write(b"not a pickle")
        aotcache._EXES.clear()
        r = aotcache.call_cached(_scaled_mm, **kw)  # recompiles, no raise
        assert float(r[0, 0]) == pytest.approx(2.0)

    def test_disabled_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SCORE_TPU_AOT_CACHE", "0")
        assert not aotcache.enabled()
        x = jnp.ones((4, 4))
        r = aotcache.call_cached(
            _scaled_mm, lower_args=(x, x, 2.0), static_kwargs={},
            dynamic_args=(x, x), tag="t", static_sig="c=2.0",
        )
        assert float(r[0, 0]) == pytest.approx(8.0)


class TestTwoLevelKeying:
    """Blob entries key on the lowered StableHLO; aliases on the cheap
    source-digest signature (VERDICT r4 #4: edits that don't change the
    traced graph must not invalidate compiled executables)."""

    def _call(self, x, y):
        return aotcache.call_cached(
            _scaled_mm, lower_args=(x, y, 3.0), static_kwargs={},
            dynamic_args=(x, y), tag="t", static_sig="c=3.0",
        )

    def test_source_edit_adopts_existing_blob(self, cache, caplog,
                                              monkeypatch):
        x = jnp.ones((8, 8))
        y = jnp.eye(8)
        r1 = self._call(x, y)
        assert len(_files(cache)) == 1
        # simulate an edit to a graph-irrelevant file (e.g. utils/plot.py):
        # the package source digest changes, the lowered graph does not
        monkeypatch.setattr(aotcache, "_SOURCE_DIGEST", "edited-sources")
        aotcache._EXES.clear()
        with caplog.at_level(logging.INFO,
                             logger="score_tpu.utils.aotcache"):
            r2 = self._call(x, y)
        assert any("adopted" in m for m in caplog.messages)
        assert len(_files(cache)) == 1  # no recompile, no second blob
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        # the relinked alias serves the next fresh process without lowering
        aotcache._EXES.clear()
        caplog.clear()
        with caplog.at_level(logging.INFO,
                             logger="score_tpu.utils.aotcache"):
            self._call(x, y)
        assert any("loaded" in m for m in caplog.messages)
        assert not any("adopted" in m for m in caplog.messages)

    def test_graph_env_knob_changes_key(self, cache, monkeypatch):
        x = np.ones((8, 8), np.float32)
        k1 = aotcache._key("t", "s", (x,))
        monkeypatch.setenv("SCORE_TPU_CR_MIN_LANES", "1073741824")
        k2 = aotcache._key("t", "s", (x,))
        assert k1 != k2

    def test_eviction_bounds_cache_size(self, cache, monkeypatch):
        monkeypatch.setenv("SCORE_TPU_AOT_CACHE_MAX_BYTES", "1")
        x = jnp.ones((8, 8))
        y = jnp.eye(8)
        kw = dict(lower_args=(x, y, 3.0), static_kwargs={},
                  dynamic_args=(x, y), tag="t", static_sig="c=3.0")
        aotcache.call_cached(_scaled_mm, **kw)
        kw5 = dict(kw, lower_args=(x, y, 5.0), static_sig="c=5.0")
        aotcache.call_cached(_scaled_mm, **kw5)
        # the older blob was evicted to fit the (tiny) bound
        assert len(_files(cache)) == 1
        # the dangling alias of the evicted entry fails open: re-calling
        # the first signature recompiles without raising
        aotcache._EXES.clear()
        r = aotcache.call_cached(_scaled_mm, **kw)
        assert float(r[0, 0]) == pytest.approx(3.0)

    def test_cache_dir_is_private(self, cache):
        x = jnp.ones((4, 4))
        aotcache.call_cached(
            _scaled_mm, lower_args=(x, x, 2.0), static_kwargs={},
            dynamic_args=(x, x), tag="t", static_sig="c=2.0",
        )
        assert (os.stat(cache).st_mode & 0o777) == 0o700


class TestKeying:
    def test_numpy_and_device_leaves_key_identically(self, cache):
        # the memoized assembly cache hands the solver device-resident
        # arrays on repeat calls; the first call may hand numpy — both
        # must hit the same executable
        xn = np.ones((8, 8), np.float32)
        xd = jnp.ones((8, 8), jnp.float32)
        assert aotcache._key("t", "s", (xn,)) == aotcache._key("t", "s", (xd,))

    def test_shape_and_static_sig_change_key(self, cache):
        x = np.ones((8, 8), np.float32)
        y = np.ones((8, 16), np.float32)
        assert aotcache._key("t", "s", (x,)) != aotcache._key("t", "s", (y,))
        assert aotcache._key("t", "s1", (x,)) != aotcache._key("t", "s2", (x,))


class TestSolveScoreIntegration:
    def test_solve_score_reloads_from_disk(self, cache):
        from score_tpu.api import ScoreSolverParams, solve_score
        from tests.test_assembly import small_graph

        fg = small_graph(np.random.default_rng(7))
        params = ScoreSolverParams(max_iter=40)
        r1 = solve_score(fg, "SOCP", params)
        assert r1.solved
        assert any(f.startswith("solve_extract") for f in _files(cache))
        # fresh-process simulation: drop the executable memo (the
        # assembly cache may persist — it holds inputs, not executables)
        aotcache._EXES.clear()
        r2 = solve_score(fg, "SOCP", params)
        assert r2.solved
        assert float(r2.primal_objective) == pytest.approx(
            float(r1.primal_objective), rel=1e-9
        )
