"""CLI entry point (``python -m score_tpu``): load -> solve -> export.

The reference has no CLI (its UX is examples/solve_goats_example_score.py);
the CLI realizes the same pipeline over the public API. These tests drive
``score_tpu.__main__.main`` in-process on a small graph.
"""

import json
import os

import numpy as np
import pytest

from score_tpu.fg.io import save_to_pickle_file
from tests.test_assembly import small_graph


@pytest.fixture()
def rng():
    return np.random.default_rng(3)


class TestCLI:
    def test_solve_pickle_with_exports(self, rng, tmp_path, capsys):
        from score_tpu.__main__ import main

        fg = small_graph(rng, loop=False)
        graph = str(tmp_path / "g.pickle")
        save_to_pickle_file(fg, graph)
        tum = str(tmp_path / "out.tum")
        res_file = str(tmp_path / "res.pkl")
        rc = main(
            [
                graph, "--relaxation", "SOCP", "--max-iter", "30",
                "--ate", "--tum", tum, "--save", res_file,
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        summary = json.loads(out)
        assert summary["solved"] is True
        assert summary["relgap"] <= 1e-6
        assert summary["iterations"] > 0
        assert "A" in summary["ate"]
        assert all(os.path.exists(p) for p in summary["tum_files"])
        assert os.path.exists(res_file)
        # TUM lines: timestamp x y z qx qy qz qw
        first = open(summary["tum_files"][0]).readline().split()
        assert len(first) == 8

    def test_g2o_roundtrip_input(self, rng, tmp_path, capsys):
        from score_tpu.__main__ import main
        from score_tpu.fg.io import save_to_g2o_file

        fg = small_graph(rng, loop=True, prior=False)
        g2o = str(tmp_path / "g.g2o")
        save_to_g2o_file(fg, g2o)
        rc = main([g2o, "--relaxation", "QCQP", "--max-iter", "30"])
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["solved"] is True

    def test_unsolved_exit_code(self, rng, tmp_path, capsys):
        from score_tpu.__main__ import main

        fg = small_graph(rng, loop=False)
        graph = str(tmp_path / "g.pickle")
        save_to_pickle_file(fg, graph)
        # one iteration cannot converge -> nonzero exit, solved=false
        rc = main([graph, "--relaxation", "SOCP", "--max-iter", "1"])
        assert rc == 1
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["solved"] is False
