"""Intra-problem sharding: ONE large multi-robot problem across a mesh.

The chain+arrow KKT structure is embarrassingly parallel over robots:
per-robot chains (the block-tridiagonal band, its cyclic-reduction
factorization, and the panel/band solves) are independent, coupled only
through the dense arrow block (landmarks + inter-robot range covers).
Sharding the chain axis of the backend's static structure across a
``jax.sharding.Mesh`` therefore distributes all the per-chain work, and
XLA's GSPMD partitioner inserts exactly two collectives per KKT solve —
the ``psum`` reductions of the arrow Schur complement
(``Sg -= sum_c B_c' Z_c``) and of the arrow right-hand side
(``ra -= sum_c B_c' w_c``) — which ride ICI within a slice. The arrow
solve itself (A x A Cholesky, A = landmarks + covers) is replicated:
it is the sequential bottleneck and is tiny next to the chains.

This is a first-class new component relative to the reference (which has
no parallelism of any kind, SURVEY.md §2.4): its analogue of this
workload is the 20-robot animation (README.md:10) solved by a single
Gurobi process.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from score_tpu.assembly.conic import ConicProblem, VariableIndex
from score_tpu.solver.chain_arrow import (
    ChainArrowBackend,
    ChainArrowStructure,
    build_chain_arrow,
)
from score_tpu.solver.ipm import IPMParams, IPMResult, solve_conic

__all__ = ["shard_chain_structure", "solve_conic_chain_sharded"]

# structure fields with a leading chain axis (C, ...)
_CHAIN_FIELDS = (
    "cm",
    "av",
    "arrow_col",
    "x_to_chain",
    "odom_row_base",
    "odom_valid",
)


def shard_chain_structure(
    aux: ChainArrowStructure, mesh: Mesh, axis_name: str = "chains"
) -> ChainArrowStructure:
    """Commit the structure's chain-axis arrays to a chain-sharded layout
    and everything else replicated; GSPMD propagates the partitioning
    through the vmapped cyclic-reduction factor/solve."""
    chain_sharding = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())
    updates = {}
    for f in dataclasses.fields(aux):
        v = getattr(aux, f.name)
        if not isinstance(v, (jnp.ndarray, jax.Array)):
            continue
        sh = chain_sharding if f.name in _CHAIN_FIELDS else replicated
        updates[f.name] = jax.device_put(v, sh)
    return dataclasses.replace(aux, **updates)


def solve_conic_chain_sharded(
    problem: ConicProblem,
    idx: VariableIndex,
    mesh: Optional[Mesh] = None,
    params: IPMParams = IPMParams(),
    axis_name: str = "chains",
    backend=ChainArrowBackend,
) -> IPMResult:
    """Solve one conic problem with the chain+arrow backend sharded over
    ``mesh``: the chain axis is padded up to a multiple of the mesh size
    (inactive identity chains) and partitioned across devices.

    ``backend`` may be :class:`MixedChainArrowBackend` — the structure
    carries (mesh, axis) as static fields, and the backend wraps its
    fused Pallas band factor/solve in ``jax.shard_map`` over the chain
    axis (GSPMD cannot partition a gridless pallas_call): each device
    runs the same kernels on its local chain slice, factors stay
    lane-sharded, and the only collectives remain the two arrow-Schur
    psums GSPMD already inserts. Long-chain 3D problems route through
    the shard_map-wrapped SEGMENTED band (SPIKE substructuring is
    chain-local, so it shards the same way); only shapes with no
    supported segmentation fall back to the GSPMD-partitioned jnp
    two-float band.
    """
    mesh = mesh or Mesh(np.array(jax.devices()), (axis_name,))
    n_dev = int(np.prod(mesh.devices.shape))
    C = len(idx.chain_lengths)
    pad = int(math.ceil(max(C, 1) / n_dev)) * n_dev
    aux = build_chain_arrow(problem, idx, num_chains_pad=pad)
    aux = dataclasses.replace(aux, shard_mesh=mesh, shard_axis=axis_name)
    aux = shard_chain_structure(aux, mesh, axis_name)
    replicated = NamedSharding(mesh, P())
    problem = dataclasses.replace(
        problem,
        **{
            f.name: jax.device_put(
                jnp.asarray(getattr(problem, f.name)), replicated
            )
            for f in dataclasses.fields(problem)
            if isinstance(
                getattr(problem, f.name), (np.ndarray, jnp.ndarray, jax.Array)
            )
        },
    )
    return solve_conic(problem, params, backend=backend, backend_aux=aux)
