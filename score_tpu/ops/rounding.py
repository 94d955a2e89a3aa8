"""Device-side batched solution recovery: projection of relaxed rotation
blocks onto SO(d).

Semantics parity with the reference's rounding bridge
(/root/reference/score/utils/gurobi_utils.py:114-136 ->
matrix_utils.py:59-79): per pose, SVD-project the d x d rotation block
(U @ Vh, with the last singular direction flipped when det < 0), keep the
translation, and re-homogenize. Here it is one batched `jnp.linalg.svd` over
all poses instead of a Python loop.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["round_rotations_batched", "extract_pose_matrices", "homogenize_batched"]


def round_rotations_batched(R: jnp.ndarray) -> jnp.ndarray:
    """Project a batch (..., d, d) of matrices onto SO(d)."""
    U, _, Vh = jnp.linalg.svd(R, full_matrices=False)
    det = jnp.linalg.det(U @ Vh)
    d = R.shape[-1]
    flip = jnp.ones((d,), dtype=R.dtype)
    # Scale the last column of U by sign(det) to force det = +1.
    signs = jnp.where(det < 0, -1.0, 1.0)[..., None]
    U_fixed = U.at[..., :, -1].multiply(signs)
    del flip
    return U_fixed @ Vh


def extract_pose_matrices(x: jnp.ndarray, num_poses: int, dim: int) -> jnp.ndarray:
    """Gather per-pose [R | t] blocks (column-major pose layout of
    assembly.conic.VariableIndex) from the flat solution vector.

    Returns (num_poses, d, d+1).
    """
    D = dim * (dim + 1)
    blocks = x[: num_poses * D].reshape(num_poses, dim + 1, dim)
    # column-major: block[c, r] = entry (r, c) -> transpose to (d, d+1)
    return jnp.swapaxes(blocks, -1, -2)


def homogenize_batched(Rt: jnp.ndarray) -> jnp.ndarray:
    """(N, d, d+1) [R|t] -> (N, d+1, d+1) homogeneous transforms with the
    rotation block rounded to SO(d)."""
    N, d, _ = Rt.shape
    R = round_rotations_batched(Rt[:, :, :d])
    T = jnp.zeros((N, d + 1, d + 1), dtype=Rt.dtype)
    T = T.at[:, :d, :d].set(R)
    T = T.at[:, :d, d].set(Rt[:, :, d])
    T = T.at[:, d, d].set(1.0)
    return T
