"""Multi-chip sharded bundle adjustment.

The reference has no distributed backend (SURVEY.md §2.3) — its analogue
is the background full-graph thread (P4: ViSlamBackend.cpp:1726-1757).
On TPU we scale that full-graph/final-BA solve across a device mesh:

- **landmarks and their observations are sharded** over the mesh's
  "data" axis (observations grouped with their landmark's shard, so the
  landmark Schur blocks never cross devices);
- **states are replicated** (a few hundred 15-dof states is small);
- each GN iteration needs exactly ONE collective: a psum of the
  [D,D]+[D] Schur-reduced normal equations over the mesh (rides ICI);
  the dense reduced solve is computed replicated on every chip and the
  landmark back-substitution stays fully local.

This is the natural mapping of DENSE_SCHUR to SPMD: compute-heavy
Jacobian/Schur work scales linearly with devices, communication is a
fixed small all-reduce.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from okvis2_tpu.imu.preintegration import ImuParameters
from okvis2_tpu.solver.gauss_newton import (
    _apply_deltas,
    _linearize,
    _schur_solve,
    problem_cost,
)
from okvis2_tpu.solver.window_problem import SolverConfig, WindowProblem


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_problem_by_landmark(
    problem: WindowProblem, n_shards: int
) -> WindowProblem:
    """Re-pack so landmarks are in contiguous per-shard blocks and each
    observation lands in its landmark's shard (host-side, numpy).

    The returned problem has L and O padded to multiples of n_shards, with
    observations sorted so shard k's O/n block only references landmark
    block k, using GLOBAL landmark indices (shard-local offsetting happens
    inside the sharded program).
    """
    L, O = problem.L, problem.O
    Lp = ((L + n_shards - 1) // n_shards) * n_shards
    lm_per = Lp // n_shards

    obs_lm = np.array(problem.obs_lm)
    obs_mask = np.array(problem.obs_mask)
    shard_of_obs = np.where(obs_mask, obs_lm // lm_per, -1)

    # per-shard observation lists, padded to a common length
    per_shard = [np.nonzero(shard_of_obs == k)[0] for k in range(n_shards)]
    o_per = max(max((len(p) for p in per_shard), default=1), 1)
    o_per = ((o_per + 7) // 8) * 8  # pad for tiling
    Op = o_per * n_shards

    def gather_obs(field, fill=0):
        src = np.array(field)
        out = np.full((Op,) + src.shape[1:], fill, dtype=src.dtype)
        for k, idx in enumerate(per_shard):
            out[k * o_per : k * o_per + len(idx)] = src[idx]
        return out

    new = dataclasses.replace(
        problem,
        landmarks=jnp.asarray(_pad_rows(np.array(problem.landmarks), Lp)),
        lm_mask=jnp.asarray(_pad_rows(np.array(problem.lm_mask), Lp)),
        lm_prior=jnp.asarray(_pad_rows(np.array(problem.lm_prior), Lp)),
        lm_prior_sqrt=jnp.asarray(
            _pad_rows(np.array(problem.lm_prior_sqrt), Lp)
        ),
        lm_prior_mask=jnp.asarray(
            _pad_rows(np.array(problem.lm_prior_mask), Lp)
        ),
        obs_state=jnp.asarray(gather_obs(problem.obs_state)),
        obs_cam=jnp.asarray(gather_obs(problem.obs_cam)),
        obs_lm=jnp.asarray(gather_obs(problem.obs_lm)),
        obs_uv=jnp.asarray(gather_obs(problem.obs_uv)),
        obs_sqrt_info=jnp.asarray(gather_obs(problem.obs_sqrt_info, fill=1)),
        obs_mask=jnp.asarray(gather_obs(problem.obs_mask, fill=False)),
    )
    return new


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], dtype=a.dtype)
    if a.dtype == np.float64 and a.ndim == 2 and a.shape[1] == 4:
        pad[:, 3] = 1.0  # homogeneous points stay valid
    return np.concatenate([a, pad])


def solve_full_graph_sharded(
    problem: WindowProblem,
    cameras,
    imu_params: ImuParameters,
    mesh: Mesh,
    config: SolverConfig = SolverConfig(),
    n_iterations: int = 15,
):
    """Sharded Gauss-Newton for the full graph (reference
    optimiseFullGraph runs 15 fixed iterations, config/euroc.yaml:85).

    `problem` must already be resharded with shard_problem_by_landmark.
    Returns the solved problem (fully replicated host-side view).
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    lm_per = problem.L // n
    o_per = problem.O // n

    # sharding specs: landmark-dim and obs-dim sharded, everything else
    # replicated
    def specs(p: WindowProblem):
        reps = jax.tree_util.tree_map(lambda _: P(), p)
        return dataclasses.replace(
            reps,
            landmarks=P(axis), lm_mask=P(axis),
            lm_prior=P(axis), lm_prior_sqrt=P(axis), lm_prior_mask=P(axis),
            obs_state=P(axis), obs_cam=P(axis), obs_lm=P(axis),
            obs_uv=P(axis), obs_sqrt_info=P(axis), obs_mask=P(axis),
        )

    in_specs = specs(problem)

    lm_config = dataclasses.replace(config, max_iterations=n_iterations)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_specs,),
        out_specs=in_specs, check_vma=False,
    )
    def run(p_local: WindowProblem) -> WindowProblem:
        from okvis2_tpu.solver.gauss_newton import solve_window_impl

        # convert global landmark ids to shard-local
        shard = jax.lax.axis_index(axis)
        local_lm = p_local.obs_lm - shard * lm_per
        p_local = dataclasses.replace(p_local, obs_lm=local_lm)
        # full LM loop (accept/reject + damping), collective-aware: the
        # observation terms psum inside _linearize/_schur_solve/cost
        out, _ = solve_window_impl(
            p_local, cameras, imu_params, lm_config, axis_name=axis
        )
        # restore GLOBAL landmark indices before reassembly
        return dataclasses.replace(out, obs_lm=out.obs_lm + shard * lm_per)

    # place inputs with the right shardings
    arr_specs = specs(problem)
    placed = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        problem, arr_specs,
    )
    return run(placed)
