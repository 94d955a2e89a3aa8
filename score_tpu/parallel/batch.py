"""Batched and sharded solves.

The reference has no parallelism of any kind (SURVEY.md §2.4); these are
first-class new components of the TPU framework:

- :func:`stack_problems` — fuse same-structure problem instances (e.g.
  Monte-Carlo measurement resamples of one graph) into one batched pytree.
- :func:`solve_conic_batch` — vmap of the IPM over the batch: one compiled
  program, every trial advanced in lockstep on one chip.
- :func:`solve_conic_sharded` — the batch axis laid out over a device
  mesh with NamedShardings (device_put + jit; GSPMD partitions the vmapped
  program): trials are data-parallel across chips, and XLA emits the
  (trivially light) collectives over ICI.

Because every array in :class:`ConicProblem` and in the IPM state has a
static shape, a batch axis composes with `vmap`/`shard_map` with no special
casing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from score_tpu.assembly.conic import ConicProblem
from score_tpu.solver import ipm as _ipm
from score_tpu.solver.ipm import IPMParams, IPMResult, solve_conic_fixed

__all__ = [
    "stack_problems",
    "solve_conic_batch",
    "solve_conic_sharded",
    "default_mesh",
]

_DATA_FIELDS = (
    "cost_cols",
    "cost_coefs",
    "cost_b",
    "cost_w",
    "cone_cols",
    "cone_coefs",
    "cone_h",
    "pin_idx",
    "pin_val",
    "c0",
)


def stack_problems(problems: Sequence[ConicProblem]) -> ConicProblem:
    """Stack same-structure problems along a new leading batch axis."""
    first = problems[0]
    for pb in problems[1:]:
        if (pb.n, pb.k, pb.dim, pb.relaxation) != (
            first.n,
            first.k,
            first.dim,
            first.relaxation,
        ):
            raise ValueError("All problems in a batch must share static structure")
        for f in _DATA_FIELDS:
            if np.asarray(getattr(pb, f)).shape != np.asarray(getattr(first, f)).shape:
                raise ValueError(f"Array shape mismatch in field {f}")
    stacked = {
        f: jnp.stack([jnp.asarray(getattr(pb, f)) for pb in problems])
        for f in _DATA_FIELDS
    }
    return dataclasses.replace(first, **stacked)


@partial(jax.jit, static_argnames=("params", "backend"))
def _batch_solve(batched_problem, backend_aux, params, backend):
    """Module-level jitted batch body: one cache entry per (params,
    backend) — a per-call ``jax.jit(jax.vmap(lambda ...))`` would retrace
    and relower the (large, two-float) graph on EVERY call, which
    dominated wall-clock (measured: ~145 s of relowering per 'warm'
    100-trial batch on TPU before this was hoisted).

    The iteration loop lives OUTSIDE the vmap (a batch-level
    `lax.while_loop` over the vmapped step), which buys two things a
    plain ``vmap(solve_conic_fixed)`` cannot:

    - **early exit at the slowest lane**: the loop stops as soon as every
      lane is terminal instead of running the full ``max_iter`` budget;
    - **batch-level shared gates**: the endgame-only solves (direction
      refinement, centering recovery) are wrapped in `lax.cond`s whose
      predicates are computed ACROSS the batch between the bookkeeping
      and step halves of the iteration (``any lane near convergence``,
      ``any lane stalled``). An unbatched predicate keeps the cond a real
      cond under vmap, so the whole batch skips those solves during the
      (far-from-converged) early iterations; per-lane selects inside
      preserve exact per-lane semantics once the gate opens.
    """
    if batched_problem.num_cones == 0:
        return jax.vmap(
            lambda pb: solve_conic_fixed(
                pb, params, num_iters=params.max_iter,
                backend=backend, backend_aux=backend_aux,
            )
        )(batched_problem)

    def prep_one(pb):
        so = backend.prepare(pb, backend_aux)
        st0 = _ipm._make_initial_state(backend, pb, so, params)
        return so, st0

    # Backends declare which state leaves actually carry the batch
    # (ChainArrowBackend keeps its shared `structure` UNBATCHED — the
    # layout one-hots are trial-invariant, and broadcasting them to a
    # leading trial axis would fatten every structure-side einsum
    # operand by the trial count).
    so_axes = getattr(backend, "state_batch_axes", 0)
    so_b, st_b = jax.vmap(prep_one, out_axes=(so_axes, 0))(batched_problem)

    book = jax.vmap(
        lambda pb, so, s: _ipm._advance_book(backend, pb, so, params, s),
        in_axes=(0, so_axes, 0),
    )

    def apply_step(shared_refine, shared_center):
        return jax.vmap(
            lambda pb, so, s, t, rx, rz: _ipm._advance_apply(
                backend, pb, so, params, s, t, rx, rz,
                shared_refine=shared_refine, shared_center=shared_center,
            ),
            in_axes=(0, so_axes, 0, 0, 0, 0),
        )

    gate_refine = params.dir_refine_gate > 0.0 and params.dir_refine_steps > 0

    def body(carry):
        i, st = carry
        st, terminal, rx, rz = book(batched_problem, so_b, st)
        live = ~terminal
        near = jnp.any((st.best_metric < params.dir_refine_gate) & live)
        shared_refine = near if gate_refine else None
        shared_center = near | jnp.any((st.stall > 0) & live)
        st = apply_step(shared_refine, shared_center)(
            batched_problem, so_b, st, terminal, rx, rz
        )
        return i + 1, st

    def cond(carry):
        i, st = carry
        return (i < params.max_iter) & jnp.any(st.status == _ipm.RUNNING)

    _, st_b = jax.lax.while_loop(cond, body, (jnp.asarray(0), st_b))
    return jax.vmap(
        lambda pb, so, s: _ipm._finalize(backend, pb, so, params, s),
        in_axes=(0, so_axes, 0),
    )(batched_problem, so_b, st_b)


def _batch_dispatch(batched_problem, backend_aux, params, backend):
    """Dispatch the batch solve through the AOT executable disk cache
    (utils/aotcache): the 100-trial mixed-band graph costs ~18 min of
    remote compile per fresh process, but a serialized executable loads
    in seconds."""
    from score_tpu.utils import aotcache

    return aotcache.call_cached(
        _batch_solve,
        lower_args=(batched_problem, backend_aux, params, backend),
        static_kwargs={},
        dynamic_args=(batched_problem, backend_aux),
        tag="batch_solve",
        static_sig=repr((params, backend.__qualname__)),
    )


def solve_conic_batch(
    batched_problem: ConicProblem,
    params: IPMParams = IPMParams(),
    backend=None,
    backend_aux=None,
) -> IPMResult:
    """Solve a batch (leading axis on every data field) with one vmapped,
    jit-compiled IPM. All trials run the full iteration count of the slowest
    trial; converged trials freeze. ``backend``/``backend_aux`` select the
    KKT backend (e.g. ChainArrowBackend + its shared structure — one
    structure serves the whole batch)."""
    from score_tpu.solver.backend import DenseBackend

    backend = backend or DenseBackend
    # branchless: required for backends with custom_vmap'd Pallas calls
    # (MixedChainArrowBackend) and free under vmap for the rest
    params = dataclasses.replace(params, branchless=True)
    return _batch_dispatch(batched_problem, backend_aux, params, backend)


def default_mesh(axis_name: str = "trials", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def solve_conic_sharded(
    batched_problem: ConicProblem,
    mesh: Optional[Mesh] = None,
    params: IPMParams = IPMParams(),
    axis_name: str = "trials",
    backend=None,
    backend_aux=None,
) -> IPMResult:
    """Data-parallel batched solve over a device mesh.

    The batch axis is sharded across ``mesh``; each device runs the vmapped
    IPM on its shard. Batch size must be divisible by the mesh size.
    """
    mesh = mesh or default_mesh(axis_name)
    n_dev = mesh.devices.size
    batch = np.asarray(batched_problem.c0).shape[0]
    if batch % n_dev != 0:
        raise ValueError(
            f"Batch size {batch} not divisible by mesh size {n_dev}; pad the "
            "batch (duplicate trials) to a multiple of the device count"
        )

    sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding)

    batched_problem = dataclasses.replace(
        batched_problem,
        **{f: put(getattr(batched_problem, f)) for f in _DATA_FIELDS},
    )

    from score_tpu.solver.backend import DenseBackend

    backend = backend or DenseBackend
    params = dataclasses.replace(params, branchless=True)
    return _batch_dispatch(batched_problem, backend_aux, params, backend)
