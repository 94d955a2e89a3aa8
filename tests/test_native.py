"""Native C++ assembly kernel: exact parity with the Python emission loop
and build verification."""

import numpy as np
import pytest

from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
from tests.test_assembly import small_graph


def _have_native():
    try:
        from score_tpu.native import _fastbuild  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _have_native(), reason="native extension not built")
class TestNativeAssembly:
    def test_matches_python_builder(self, monkeypatch):
        rng = np.random.default_rng(21)
        fg = small_graph(rng)
        p_native, _ = build_conic_problem(fg, SOCP_RELAXATION)

        # force the Python fallback path
        import score_tpu.assembly.conic as conic_mod

        monkeypatch.setattr(conic_mod, "_native_pose_rows",
                            lambda *a, **k: None)
        p_python, _ = build_conic_problem(fg, SOCP_RELAXATION)

        np.testing.assert_array_equal(
            np.asarray(p_native.cost_cols), np.asarray(p_python.cost_cols)
        )
        np.testing.assert_allclose(
            np.asarray(p_native.cost_coefs), np.asarray(p_python.cost_coefs)
        )
        np.testing.assert_allclose(
            np.asarray(p_native.cost_b), np.asarray(p_python.cost_b)
        )
        np.testing.assert_allclose(
            np.asarray(p_native.cost_w), np.asarray(p_python.cost_w)
        )

    def test_build_script(self):
        from score_tpu.native.build import build

        path = build()
        assert path.endswith(".so")
