"""Fixed-shape sliding-window least-squares problem.

This is the TPU-native replacement for the reference's dynamic
ceres::Problem graph (okvis_ceres/include/okvis/ViGraph.hpp:83-618): instead
of heap-allocated parameter blocks and residual blocks added/removed one by
one, the whole window lives in fixed-capacity arrays with validity masks, so
one XLA program (see gauss_newton.py) optimises any window without
recompilation. Capacities mirror the reference's own bounds (window of
5 keyframes + 3 IMU frames + 3 loop-closure frames, config/euroc.yaml:75-77).

Slot conventions
- state slot s in [0, S): a pose [7] + speed/bias [9]; consecutive *active*
  slots are chained by IMU links (slot s links s -> s+1).
- landmark slot l in [0, L): homogeneous world point [4].
- observation slot o in [0, O): (state, camera, landmark, uv, whitening).
- frozen masks reproduce ceres SetParameterBlockConstant
  (ViGraphEstimator::freezePosesUntil, ViGraphEstimator.cpp:201-318).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from okvis2_tpu.imu.preintegration import ImuParameters, Preintegrated


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static solver settings (hashable; part of the jit cache key).

    Mirrors the reference's solver options: max_iterations ~
    realtime_max_iterations / full_graph_iterations (config/euroc.yaml:81-86),
    cauchy_scale ~ the CauchyLoss(1) used on reprojection factors.
    """

    max_iterations: int = 10
    initial_lambda: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.5
    min_cost_decrease: float = 1e-9
    cauchy_scale: float = 1.0
    landmark_damping: float = 1e-6
    # parameter-change tolerance (Ceres parameter_tolerance role): an
    # ACCEPTED step whose largest state-delta component is below this
    # terminates the LM loop immediately — warm-started realtime windows
    # converge in ~3 iterations and the remaining budget moves poses by
    # micrometres while costing ~0.5 ms/iteration on device. 0 = off
    # (full-graph / final-BA solves keep the cost-decrease criterion).
    step_tolerance: float = 0.0


def _z(shape, dtype):
    return jnp.zeros(shape, dtype=dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class WindowProblem:
    # --- states -----------------------------------------------------------
    pose: jnp.ndarray  # [S,7] (r, q_xyzw)
    speed_bias: jnp.ndarray  # [S,9]
    extrinsics: jnp.ndarray  # [NC,7] T_SC per camera
    landmarks: jnp.ndarray  # [L,4] homogeneous world points
    # --- masks ------------------------------------------------------------
    state_mask: jnp.ndarray  # [S] bool: slot active
    pose_frozen: jnp.ndarray  # [S] bool
    sb_frozen: jnp.ndarray  # [S] bool
    ext_frozen: jnp.ndarray  # [NC] bool (True unless online calibration)
    lm_mask: jnp.ndarray  # [L] bool
    # --- reprojection observations ---------------------------------------
    obs_state: jnp.ndarray  # [O] int32
    obs_cam: jnp.ndarray  # [O] int32
    obs_lm: jnp.ndarray  # [O] int32
    obs_uv: jnp.ndarray  # [O,2]
    obs_sqrt_info: jnp.ndarray  # [O] scalar whitening (8/keypoint_size)
    obs_mask: jnp.ndarray  # [O] bool
    # --- IMU links (link k connects state imu_i[k] -> imu_j[k]) -----------
    # Explicit endpoint indices (rather than consecutive slots) keep state
    # slots STABLE across frames: the device-resident window can reuse a
    # departed state's slot for a new state without renumbering any other
    # row — no re-upload of the whole problem per frame.
    imu_pre: Preintegrated  # batched [S-1, ...]
    imu_i: jnp.ndarray  # [S-1] int32 source state slot
    imu_j: jnp.ndarray  # [S-1] int32 target state slot
    imu_mask: jnp.ndarray  # [S-1] bool
    # --- priors -----------------------------------------------------------
    pose_prior: jnp.ndarray  # [S,7]
    pose_prior_sqrt: jnp.ndarray  # [S,6,6]
    pose_prior_mask: jnp.ndarray  # [S] bool
    sb_prior: jnp.ndarray  # [S,9]
    sb_prior_sqrt: jnp.ndarray  # [S,9] diagonal whitening
    sb_prior_mask: jnp.ndarray  # [S] bool
    # --- relative-pose factors (loop closure / pose graph edges) ----------
    rel_i: jnp.ndarray  # [R] int32
    rel_j: jnp.ndarray  # [R] int32
    rel_T: jnp.ndarray  # [R,7] measured T_ij
    rel_sqrt: jnp.ndarray  # [R,6,6]
    rel_mask: jnp.ndarray  # [R] bool
    # --- landmark priors (HomogeneousPointError role: multi-session /
    # loaded-map anchoring, okvis_ceres/src/HomogeneousPointError.cpp) ---
    lm_prior: jnp.ndarray  # [L,4] prior homogeneous point
    lm_prior_sqrt: jnp.ndarray  # [L] isotropic whitening (1/sigma)
    lm_prior_mask: jnp.ndarray  # [L] bool
    # --- extrinsics priors (online calibration: PoseError on T_SC with
    # sigma_r/sigma_alpha, okvis_common Parameters.hpp:57-100) ----------
    ext_prior: jnp.ndarray  # [NC,7]
    ext_prior_sqrt: jnp.ndarray  # [NC,6,6]
    ext_prior_mask: jnp.ndarray  # [NC] bool

    _FIELDS = (
        "pose", "speed_bias", "extrinsics", "landmarks",
        "state_mask", "pose_frozen", "sb_frozen", "ext_frozen", "lm_mask",
        "obs_state", "obs_cam", "obs_lm", "obs_uv", "obs_sqrt_info",
        "obs_mask", "imu_pre", "imu_i", "imu_j", "imu_mask",
        "pose_prior", "pose_prior_sqrt", "pose_prior_mask",
        "sb_prior", "sb_prior_sqrt", "sb_prior_mask",
        "rel_i", "rel_j", "rel_T", "rel_sqrt", "rel_mask",
        "lm_prior", "lm_prior_sqrt", "lm_prior_mask",
        "ext_prior", "ext_prior_sqrt", "ext_prior_mask",
    )

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(cls._FIELDS, children)))

    # --- shape properties (static) ---------------------------------------
    @property
    def S(self) -> int:
        return self.pose.shape[0]

    @property
    def L(self) -> int:
        return self.landmarks.shape[0]

    @property
    def O(self) -> int:
        return self.obs_uv.shape[0]

    @property
    def NC(self) -> int:
        return self.extrinsics.shape[0]

    @classmethod
    def empty(
        cls,
        num_states: int,
        num_landmarks: int,
        num_obs: int,
        num_cameras: int,
        imu_capacity: int,
        num_rel: int = 4,
        dtype=None,
    ) -> "WindowProblem":
        """Allocate an all-masked-out problem of the given capacities."""
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        S, L, O, NC, R = num_states, num_landmarks, num_obs, num_cameras, num_rel
        qid = jnp.tile(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=dtype), (S, 1)
        )
        pose = jnp.concatenate([_z((S, 3), dtype), qid], axis=-1)
        ident7 = pose
        N = imu_capacity
        pre = Preintegrated(
            delta_q=jnp.tile(jnp.asarray([0.0, 0, 0, 1.0], dtype), (S - 1, 1)),
            c_int=_z((S - 1, 3, 3), dtype),
            c_dint=_z((S - 1, 3, 3), dtype),
            acc_int=_z((S - 1, 3), dtype),
            acc_dint=_z((S - 1, 3), dtype),
            d_alpha_dbg=_z((S - 1, 3, 3), dtype),
            d_v_dbg=_z((S - 1, 3, 3), dtype),
            d_p_dbg=_z((S - 1, 3, 3), dtype),
            covariance=jnp.tile(jnp.eye(15, dtype=dtype), (S - 1, 1, 1)),
            sqrt_info=jnp.tile(jnp.eye(15, dtype=dtype), (S - 1, 1, 1)),
            dt_total=_z((S - 1,), dtype),
            bg_lin=_z((S - 1, 3), dtype),
            ba_lin=_z((S - 1, 3), dtype),
        )
        del N
        lm = jnp.concatenate(
            [_z((L, 3), dtype), jnp.ones((L, 1), dtype)], axis=-1
        )
        return cls(
            pose=pose,
            speed_bias=_z((S, 9), dtype),
            extrinsics=jnp.concatenate(
                [_z((NC, 3), dtype),
                 jnp.tile(jnp.asarray([0.0, 0, 0, 1.0], dtype), (NC, 1))],
                axis=-1,
            ),
            landmarks=lm,
            state_mask=jnp.zeros((S,), bool),
            pose_frozen=jnp.zeros((S,), bool),
            sb_frozen=jnp.zeros((S,), bool),
            ext_frozen=jnp.ones((NC,), bool),
            lm_mask=jnp.zeros((L,), bool),
            obs_state=jnp.zeros((O,), jnp.int32),
            obs_cam=jnp.zeros((O,), jnp.int32),
            obs_lm=jnp.zeros((O,), jnp.int32),
            obs_uv=_z((O, 2), dtype),
            obs_sqrt_info=jnp.ones((O,), dtype),
            obs_mask=jnp.zeros((O,), bool),
            imu_pre=pre,
            imu_i=jnp.arange(S - 1, dtype=jnp.int32),
            imu_j=jnp.arange(1, S, dtype=jnp.int32),
            imu_mask=jnp.zeros((S - 1,), bool),
            pose_prior=ident7,
            pose_prior_sqrt=_z((S, 6, 6), dtype),
            pose_prior_mask=jnp.zeros((S,), bool),
            sb_prior=_z((S, 9), dtype),
            sb_prior_sqrt=_z((S, 9), dtype),
            sb_prior_mask=jnp.zeros((S,), bool),
            rel_i=jnp.zeros((R,), jnp.int32),
            rel_j=jnp.zeros((R,), jnp.int32),
            rel_T=jnp.tile(
                jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], dtype), (R, 1)
            ),
            rel_sqrt=_z((R, 6, 6), dtype),
            rel_mask=jnp.zeros((R,), bool),
            lm_prior=lm,
            lm_prior_sqrt=jnp.ones((L,), dtype),
            lm_prior_mask=jnp.zeros((L,), bool),
            ext_prior=jnp.concatenate(
                [_z((NC, 3), dtype),
                 jnp.tile(jnp.asarray([0.0, 0, 0, 1.0], dtype), (NC, 1))],
                axis=-1,
            ),
            ext_prior_sqrt=_z((NC, 6, 6), dtype),
            ext_prior_mask=jnp.zeros((NC,), bool),
        )
