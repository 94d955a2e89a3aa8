"""Batched (vmap) and sharded (shard_map/device_put) solve tests on the
virtual 8-device CPU mesh (SURVEY.md §4: multi-chip tests without a
cluster)."""

import numpy as np
import pytest

import jax

from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
from score_tpu.parallel.batch import (
    default_mesh,
    solve_conic_batch,
    solve_conic_sharded,
    stack_problems,
)
from score_tpu.sim.manhattan import (
    ManhattanWorldParams,
    resample_measurements,
    simulate_manhattan_world,
)
from score_tpu.solver.ipm import IPMParams, OPTIMAL, solve_conic


@pytest.fixture(scope="module")
def trial_problems():
    p = ManhattanWorldParams(
        num_robots=2,
        num_poses_per_robot=10,
        num_landmarks=2,
        grid_size=6,
        range_measure_prob=0.5,
        seed=11,
    )
    fg = simulate_manhattan_world(p)
    trials = [resample_measurements(fg, seed=s) for s in range(8)]
    return [build_conic_problem(t, SOCP_RELAXATION)[0] for t in trials]


class TestBatch:
    def test_vmap_matches_single_solves(self, trial_problems):
        params = IPMParams(max_iter=30)
        batch = stack_problems(trial_problems)
        res = solve_conic_batch(batch, params)
        assert np.all(np.isin(np.asarray(res.status), (1, 4)))
        # Note: tiny noisy relaxations are near-degenerate (the optimal set
        # is nearly a manifold), so different-but-equally-optimal x vectors
        # are expected between solver variants; objectives must agree.
        for i, pb in enumerate(trial_problems[:3]):
            single = solve_conic(pb, params)
            assert float(single.pobj) == pytest.approx(
                float(res.pobj[i]), rel=1e-6, abs=1e-8
            )

    def test_stack_rejects_mismatched_structure(self, trial_problems):
        p = ManhattanWorldParams(
            num_robots=1, num_poses_per_robot=5, num_landmarks=1,
            grid_size=4, seed=3,
        )
        other = build_conic_problem(
            simulate_manhattan_world(p), SOCP_RELAXATION
        )[0]
        with pytest.raises(ValueError):
            stack_problems([trial_problems[0], other])


class TestSharded:
    def test_eight_device_mesh_available(self):
        assert len(jax.devices()) == 8

    def test_sharded_matches_vmap(self, trial_problems):
        params = IPMParams(max_iter=30)
        batch = stack_problems(trial_problems)
        res_v = solve_conic_batch(batch, params)
        res_s = solve_conic_sharded(batch, default_mesh(), params)
        np.testing.assert_allclose(
            np.asarray(res_v.pobj), np.asarray(res_s.pobj), rtol=1e-6, atol=1e-7
        )
        assert np.all(np.isin(np.asarray(res_s.status), (1, 4)))

    def test_sharded_rejects_indivisible_batch(self, trial_problems):
        batch = stack_problems(trial_problems[:6])
        if len(jax.devices()) == 8:
            with pytest.raises(ValueError):
                solve_conic_sharded(batch, default_mesh(), IPMParams(max_iter=5))


class TestIntraProblemSharding:
    """One large multi-robot problem sharded across the mesh: per-robot
    chains distributed, the arrow Schur psum is the only cross-device
    reduction (SURVEY.md §2.4 'intra-problem sharding')."""

    def test_20robot_chain_sharded_matches_single_device(self):
        import jax
        from jax.sharding import Mesh

        from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
        from score_tpu.parallel.intra import solve_conic_chain_sharded
        from score_tpu.sim.manhattan import (
            ManhattanWorldParams,
            simulate_manhattan_world,
        )
        from score_tpu.solver.chain_arrow import (
            ChainArrowBackend,
            build_chain_arrow,
        )
        from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES, solve_conic

        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=20,
                num_poses_per_robot=12,
                num_landmarks=4,
                grid_size=10,
                range_measure_prob=0.35,
                inter_robot_measure_prob=0.1,
                inter_robot_sensing_radius=10.0,
                seed=3,
            )
        )
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        params = IPMParams(max_iter=40)

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        r_sharded = solve_conic_chain_sharded(problem, idx, mesh, params)
        r_single = solve_conic(
            problem, params,
            backend=ChainArrowBackend,
            backend_aux=build_chain_arrow(problem, idx),
        )
        assert int(r_sharded.status) in SOLVED_STATUSES
        assert float(r_sharded.pobj) == pytest.approx(
            float(r_single.pobj), rel=1e-6, abs=1e-8
        )

    def test_chain_sharded_exact_mm_matches_single(self, monkeypatch):
        """Intra-problem sharding with the exact split-f32 (ozaki) arrow
        contractions forced on: the r4 guard lift routes sharded
        multi-robot solves through ozaki.mm_f64 / onehot_pair_contract
        too (plain jnp — GSPMD partitions the slice einsums), and the
        sharded result must match the unsharded solve of the same
        problem with the same routing."""
        import jax
        from jax.sharding import Mesh

        from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
        from score_tpu.parallel.intra import solve_conic_chain_sharded
        from score_tpu.sim.manhattan import (
            ManhattanWorldParams,
            simulate_manhattan_world,
        )
        from score_tpu.solver.chain_arrow import (
            ChainArrowBackend,
            build_chain_arrow,
        )
        from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES, solve_conic

        monkeypatch.setenv("SCORE_TPU_EXACT_MM", "1")
        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=8,
                num_poses_per_robot=12,
                num_landmarks=4,
                grid_size=10,
                range_measure_prob=0.35,
                inter_robot_measure_prob=0.1,
                inter_robot_sensing_radius=10.0,
                seed=3,
            )
        )
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        params = IPMParams(max_iter=40)

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        r_sharded = solve_conic_chain_sharded(problem, idx, mesh, params)
        r_single = solve_conic(
            problem, params,
            backend=ChainArrowBackend,
            backend_aux=build_chain_arrow(problem, idx),
        )
        assert int(r_sharded.status) in SOLVED_STATUSES
        assert float(r_sharded.pobj) == pytest.approx(
            float(r_single.pobj), rel=1e-6, abs=1e-8
        )

    def test_shmap_pallas_band_parity(self, monkeypatch):
        """The shard_map-wrapped fused Pallas band (interpret mode on the
        CPU mesh) must reproduce the unsharded kernels EXACTLY: each
        device runs the same gridless kernels on its local chain slice
        and no arithmetic crosses chain boundaries. Compaction is pinned
        OFF: its depth follows the (local vs global) lane width, which
        legitimately changes the elimination order — the CR-active
        sharded path is covered at two-float grade by the segmented
        parity test below."""
        from types import SimpleNamespace

        from score_tpu.ops import pallas_pcr as pp

        monkeypatch.setattr(pp, "_CR_MIN_LANES", 1 << 30)

        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from score_tpu.ops import twofloat as tfm
        from score_tpu.ops.pallas_pcr import (
            ppcr_factor_pallas,
            ppcr_solve_pallas,
        )
        from score_tpu.solver.chain_arrow import (
            _shmap_ppcr_factor,
            _shmap_ppcr_solve,
        )

        C, T, D = 8, 8, 6
        rng = np.random.default_rng(0)
        Dg = rng.normal(size=(C, T, D, D))
        Dg = Dg @ Dg.transpose(0, 1, 3, 2) + 10.0 * np.eye(D)
        Ug = 0.3 * rng.normal(size=(C, T, D, D))
        Ug[:, -1] = 0.0
        B = rng.normal(size=(C, T, D, 3))
        Dj, Uj, Bj = jnp.asarray(Dg), jnp.asarray(Ug), jnp.asarray(B)

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        st = SimpleNamespace(shard_mesh=mesh, shard_axis="chains")

        @jax.jit
        def plain(Dj, Uj, Bj):
            f = ppcr_factor_pallas(tfm.from_f64(Dj), tfm.from_f64(Uj))
            return tfm.to_f64(ppcr_solve_pallas(f, tfm.from_f64(Bj)))

        @jax.jit
        def sharded(Dj, Uj, Bj):
            f = _shmap_ppcr_factor(st, tfm.from_f64(Dj), tfm.from_f64(Uj))
            return tfm.to_f64(_shmap_ppcr_solve(st, f, tfm.from_f64(Bj)))

        zp = np.asarray(plain(Dj, Uj, Bj))
        zs = np.asarray(sharded(Dj, Uj, Bj))
        np.testing.assert_array_equal(zp, zs)

    def test_shmap_segmented_band_parity(self):
        """The shard_map-wrapped SEGMENTED band (the 3D long-chain fast
        path) must reproduce the unsharded segmented kernels to
        two-float grade: the SPIKE substructuring is chain-local (each
        device factors its own interface chains with zero collectives),
        but the interior kernels' compaction depth follows the LOCAL
        lane width (here: 1 CR level unsharded, 0 per device), so the
        two runs are distinct 2^-47-grade eliminations, not bitwise
        copies."""
        from types import SimpleNamespace

        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from score_tpu.ops import twofloat as tfm
        from score_tpu.ops.pallas_pcr import (
            seg_factor_pallas,
            seg_solve_pallas,
        )
        from score_tpu.solver.chain_arrow import (
            _shmap_seg_factor,
            _shmap_seg_solve,
        )

        C, T, D, Ts = 8, 32, 3, 8
        rng = np.random.default_rng(5)
        Dg = rng.normal(size=(C, T, D, D))
        Dg = Dg @ Dg.transpose(0, 1, 3, 2) + 10.0 * np.eye(D)
        Ug = 0.3 * rng.normal(size=(C, T, D, D))
        Ug[:, -1] = 0.0
        B = rng.normal(size=(C, T, D, 2))
        Dj, Uj, Bj = jnp.asarray(Dg), jnp.asarray(Ug), jnp.asarray(B)

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        st = SimpleNamespace(shard_mesh=mesh, shard_axis="chains")

        @jax.jit
        def plain(Dj, Uj, Bj):
            f = seg_factor_pallas(tfm.from_f64(Dj), tfm.from_f64(Uj), Ts)
            return tfm.to_f64(seg_solve_pallas(f, tfm.from_f64(Bj)))

        @jax.jit
        def sharded(Dj, Uj, Bj):
            f = _shmap_seg_factor(st, tfm.from_f64(Dj), tfm.from_f64(Uj), Ts)
            return tfm.to_f64(_shmap_seg_solve(st, f, tfm.from_f64(Bj)))

        zp = np.asarray(plain(Dj, Uj, Bj))
        zs = np.asarray(sharded(Dj, Uj, Bj))
        # not bit-exact: compaction depth differs with local lane width
        # (see docstring) and the jnp interface work fuses differently at
        # (C, S) vs (C/n_dev, S) shapes under XLA:CPU FMA contraction
        # (measured: 6.2e-10 abs on O(0.1) solutions)
        np.testing.assert_allclose(zs, zp, rtol=0, atol=1e-8)

    def test_mixed_chain_sharded_matches_single(self):
        """Full sharded solve through MixedChainArrowBackend on the CPU
        mesh: the band takes the GSPMD-partitioned jnp two-float path
        (the shard_map'd Pallas kernels are exercised at parity level
        above — a full interpret-mode IPM is f32-degraded by XLA:CPU's
        FMA contraction and cannot hit f64-grade tolerances)."""
        import jax
        from jax.sharding import Mesh

        from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
        from score_tpu.parallel.intra import solve_conic_chain_sharded
        from score_tpu.sim.manhattan import (
            ManhattanWorldParams,
            simulate_manhattan_world,
        )
        from score_tpu.solver.chain_arrow import (
            MixedChainArrowBackend,
            build_chain_arrow,
        )
        from score_tpu.solver.ipm import IPMParams, SOLVED_STATUSES, solve_conic

        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=8,
                num_poses_per_robot=8,
                num_landmarks=3,
                grid_size=8,
                range_measure_prob=0.35,
                inter_robot_measure_prob=0.1,
                inter_robot_sensing_radius=10.0,
                seed=5,
            )
        )
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        params = IPMParams(max_iter=30)

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        r_sharded = solve_conic_chain_sharded(
            problem, idx, mesh, params, backend=MixedChainArrowBackend
        )
        r_single = solve_conic(
            problem, params,
            backend=MixedChainArrowBackend,
            backend_aux=build_chain_arrow(problem, idx),
        )
        assert int(r_sharded.status) in SOLVED_STATUSES
        assert float(r_sharded.pobj) == pytest.approx(
            float(r_single.pobj), rel=1e-6, abs=1e-8
        )

    def test_chain_padding_is_neutral(self):
        # padding the chain axis (inactive identity chains) must not
        # change the solution at all
        from score_tpu.assembly.conic import SOCP_RELAXATION, build_conic_problem
        from score_tpu.sim.manhattan import (
            ManhattanWorldParams,
            simulate_manhattan_world,
        )
        from score_tpu.solver.chain_arrow import (
            ChainArrowBackend,
            build_chain_arrow,
        )
        from score_tpu.solver.ipm import IPMParams, solve_conic

        fg = simulate_manhattan_world(
            ManhattanWorldParams(
                num_robots=3,
                num_poses_per_robot=8,
                num_landmarks=2,
                grid_size=6,
                range_measure_prob=0.5,
                seed=9,
            )
        )
        problem, idx = build_conic_problem(fg, SOCP_RELAXATION)
        params = IPMParams(max_iter=40)
        r0 = solve_conic(
            problem, params, backend=ChainArrowBackend,
            backend_aux=build_chain_arrow(problem, idx),
        )
        r8 = solve_conic(
            problem, params, backend=ChainArrowBackend,
            backend_aux=build_chain_arrow(problem, idx, num_chains_pad=8),
        )
        # padding changes einsum reduction order over the chain axis, so
        # iterates diverge at roundoff level; assert solver-tolerance parity
        # near-zero optimum on clean simulated data: absolute comparison
        assert float(r8.pobj) == pytest.approx(
            float(r0.pobj), rel=1e-6, abs=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(r8.x), np.asarray(r0.x), atol=1e-4
        )
