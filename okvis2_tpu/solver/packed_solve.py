"""Flat-packed window solve: 2 host->device transfers per frame.

Round-1 profiling on the axon-tunnelled TPU showed `Estimator.optimise`
dominated by per-field transfers and dispatches: `pack()` uploaded ~30
separate arrays every frame and `unpack()` fetched several more, each
paying the tunnel's per-transfer latency. Here the host packs the ENTIRE
WindowProblem into two preallocated flat buffers (one float, one int32)
and a single jitted program slices/reshapes them back (free in XLA),
runs the LM solve, and returns only the small solved outputs
(pose/speed_bias/landmarks/extrinsics + stats).

The layout is derived mechanically from the problem pytree, so any
future WindowProblem field is handled automatically.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from okvis2_tpu.solver.gauss_newton import solve_window_impl
from okvis2_tpu.solver.window_problem import SolverConfig, WindowProblem


class PackedLayout:
    """Flat-buffer layout for a fixed-capacity WindowProblem.

    Floats (any float dtype) go into one buffer, ints+bools into an int32
    buffer, in pytree-flatten order. Hashable by capacity signature so it
    can be a static jit argument.
    """

    def __init__(self, S, L, O, NC, R, imu_capacity, dtype=None,
                 aux_f: int = 0, aux_i: int = 0):
        self.key = (S, L, O, NC, R, imu_capacity, aux_f, aux_i)
        template = jax.eval_shape(
            lambda: WindowProblem.empty(S, L, O, NC, imu_capacity,
                                        num_rel=R, dtype=dtype)
        )
        leaves, self.treedef = jax.tree_util.tree_flatten(template)
        self.specs = []  # (kind, offset, size, shape, dtype)
        off_f = 0
        off_i = 0
        for leaf in leaves:
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                self.specs.append(("f", off_f, n, leaf.shape, leaf.dtype))
                off_f += n
            else:
                self.specs.append(("i", off_i, n, leaf.shape, leaf.dtype))
                off_i += n
        # trailing aux regions: Phase-B side-channel values (landmark
        # slot map, weight scales, current slot, obs base) ride THE SAME
        # upload as the problem — each extra host->device transfer is a
        # serialised RPC over the tunnel
        self.aux_f_off = off_f
        self.aux_i_off = off_i
        self.n_float = off_f + aux_f
        self.n_int = off_i + aux_i
        self.float_dtype = np.float64 if jax.config.jax_enable_x64 \
            else np.float32

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return isinstance(other, PackedLayout) and self.key == other.key

    # ---------------- host side ----------------
    def make_buffers(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One combined float-dtype carrier so the whole problem crosses
        the tunnel as a SINGLE upload RPC. The int section is stored as
        floats (every packed int is a slot/keypoint index or mask,
        |v| < 2^24, exact in float32) and truncated back on device.
        buf_f / buf_i are in-place views of the carrier."""
        combined = np.zeros(self.n_float + self.n_int, self.float_dtype)
        return (
            combined[: self.n_float],
            combined[self.n_float:],
            combined,
        )

    def fill(self, buf_f: np.ndarray, buf_i: np.ndarray, problem_np):
        """Copy a WindowProblem whose leaves are numpy arrays into the
        flat buffers (in place)."""
        leaves = jax.tree_util.tree_leaves(problem_np)
        for (kind, off, n, shape, _), leaf in zip(self.specs, leaves):
            a = np.asarray(leaf)
            if kind == "f":
                buf_f[off:off + n] = a.ravel()
            else:
                buf_i[off:off + n] = a.ravel().astype(np.int32)

    # ---------------- device side (traced) ----------------
    def unflatten(self, flat_all: jnp.ndarray) -> WindowProblem:
        """Rebuild the WindowProblem from the single combined upload:
        [float section | int-as-float section]. Int leaves truncate back
        exactly (all packed ints are < 2^24 in magnitude)."""
        flat_f = flat_all[: self.n_float]
        flat_i = flat_all[self.n_float:]
        leaves = []
        for kind, off, n, shape, dtype in self.specs:
            src = flat_f if kind == "f" else flat_i
            x = jax.lax.dynamic_slice_in_dim(src, off, n)
            if kind == "i" and not jnp.issubdtype(dtype, jnp.floating):
                # float->int truncation is exact for the packed values;
                # round first so a future low-precision carrier can't
                # flip a mask bit via 0.9999...
                x = jnp.round(x)
            x = x.reshape(shape).astype(dtype)
            leaves.append(x)
        return jax.tree_util.tree_unflatten(self.treedef, leaves)


# no donation: the flat input arrives as host numpy (donating a host
# array is a no-op and just triggers warnings); it is tiny anyway
@functools.partial(jax.jit, static_argnames=("layout", "config"))
def solve_packed(
    flat_all: jnp.ndarray,
    cameras,
    imu_params,
    layout: PackedLayout,
    config: SolverConfig,
):
    """One dispatch: unflatten -> LM solve -> ONE flat output array
    (pose | speed_bias | landmarks | extrinsics | 4 stats scalars), so
    the caller pays a single upload and a single readback over the
    tunnel."""
    problem = layout.unflatten(flat_all)
    solved, stats = solve_window_impl(problem, cameras, imu_params, config)
    dtype = solved.pose.dtype
    out = jnp.concatenate([
        solved.pose.ravel(),
        solved.speed_bias.ravel(),
        solved.landmarks.ravel(),
        solved.extrinsics.ravel(),
        jnp.stack([
            stats["initial_cost"].astype(dtype),
            stats["final_cost"].astype(dtype),
            stats["iterations"].astype(dtype),
            stats["lambda"].astype(dtype),
            # obs rows used (no device appends on this path): keeps the
            # output layout identical to the fused-carrier solve
            jnp.sum(problem.obs_mask).astype(dtype),
        ]),
    ])
    return out


def _append_matches_all(
    problem: WindowProblem,
    match_sets,  # K tuples (idx [NC,cap], keep [NC,cap], xy, size)
    maps: jnp.ndarray,  # [K,cap] table slot -> solver lm slot (-1: none)
    w_scale: jnp.ndarray,  # [cap] per-landmark sqrt(info_scale)
    cur_slots: jnp.ndarray,  # [K] window slot of each set's state
    n_obs_base: jnp.ndarray,  # [] next free obs row
):
    """Append EVERY in-flight frame's match rows to the packed
    observation arrays ON DEVICE (Phase B of the tunnel plan): the host
    never sees these matches before the solve — they flow straight from
    the fused frontend programs into the window problem, and the
    diagnostics ride a later frame's readback.

    All K sets land in ONE row scatter of a combined [K*NC*cap, 8]
    payload (every obs field packed as the carrier float dtype — all
    values are indices/masks < 2^24, exact): the former per-set,
    per-field formulation issued 6*K small scatters, and TPU scatters
    pay a per-row cost that made them the dominant fixed overhead of
    the fused solve. Chaining across sets is a single cumsum over the
    concatenated valid flags; overflow rows drop via mode="drop" (the
    host warns when the returned row count exceeds capacity)."""
    O = problem.obs_mask.shape[0]
    fdt = problem.obs_uv.dtype
    payloads, valids = [], []
    for k, (idx, keep, xy, size) in enumerate(match_sets):
        NC, cap = idx.shape
        valid = (keep & (maps[k] >= 0)[None, :]).reshape(-1)
        kp = idx.reshape(-1)
        ci = jnp.repeat(jnp.arange(NC, dtype=jnp.int32), cap)
        uv = xy[ci, kp].astype(fdt)
        sz = size[ci, kp]
        w = (8.0 / jnp.maximum(sz, 1e-6)).astype(fdt) * jnp.tile(
            w_scale.astype(fdt), NC
        )
        lm_slot = jnp.tile(jnp.maximum(maps[k], 0), NC)
        cur = jnp.broadcast_to(cur_slots[k], ci.shape)
        payloads.append(jnp.stack([
            cur.astype(fdt), ci.astype(fdt), lm_slot.astype(fdt),
            uv[:, 0], uv[:, 1], w,
            jnp.ones_like(w),  # mask
            jnp.zeros_like(w),  # pad to 8 lanes
        ], axis=1))
        valids.append(valid)
    vflat = jnp.concatenate(valids)  # [K*NC*cap]
    payload = jnp.concatenate(payloads)  # [K*NC*cap, 8]
    pos = n_obs_base + jnp.cumsum(vflat.astype(jnp.int32)) - 1
    tgt = jnp.where(vflat, pos, O)  # invalid / overflow -> dropped
    base = jnp.stack([
        problem.obs_state.astype(fdt), problem.obs_cam.astype(fdt),
        problem.obs_lm.astype(fdt),
        problem.obs_uv[:, 0], problem.obs_uv[:, 1],
        problem.obs_sqrt_info.astype(fdt),
        problem.obs_mask.astype(fdt),
        jnp.zeros((O,), fdt),
    ], axis=1)  # [O,8]
    m = base.at[tgt].set(payload, mode="drop")
    problem = dataclasses.replace(
        problem,
        obs_state=jnp.round(m[:, 0]).astype(problem.obs_state.dtype),
        obs_cam=jnp.round(m[:, 1]).astype(problem.obs_cam.dtype),
        obs_lm=jnp.round(m[:, 2]).astype(problem.obs_lm.dtype),
        obs_uv=m[:, 3:5].astype(problem.obs_uv.dtype),
        obs_sqrt_info=m[:, 5].astype(problem.obs_sqrt_info.dtype),
        obs_mask=m[:, 6] > 0.5,
    )
    return problem, n_obs_base + jnp.sum(vflat.astype(jnp.int32))


# How many not-yet-finished frames' match rows a fused solve can
# append on device (the adaptive pipelined loop keeps up to
# MAX_APPEND_SETS-1 frames in flight plus the current one; each set's
# landmark slot map and window slot ride the carrier's aux regions).
MAX_APPEND_SETS = 3


@functools.partial(
    jax.jit, static_argnames=("off_bytes", "layout", "config")
)
def solve_packed_fused_carrier(
    carrier: jnp.ndarray,
    match_sets,  # tuple of MAX_APPEND_SETS (idx, keep, xy, size) tuples
    diag: jnp.ndarray,
    cameras,
    imu_params,
    off_bytes: int,
    layout: PackedLayout,
    config: SolverConfig,
):
    """Phase-B fused solve, carrier entry: the packed problem rides the
    pipelined frame's SINGLE uint8 upload (images | frontend aux |
    packed problem) — bitcast its byte section back to the carrier
    float dtype (exact), append every in-flight frame's device-resident
    match rows (oldest first: frames whose [solve|diag] output the host
    has not consumed yet contribute their observations HERE, since the
    host pack cannot contain them), solve, and return ONE flat array
    [solve_out | frontend diag]. Per-set landmark slot maps / window
    slots and the shared weight scales ride the trailing aux regions of
    the carrier (see PackedLayout / Estimator.prepare_fused_solve)."""
    nb = np.dtype(layout.float_dtype).itemsize
    n = layout.n_float + layout.n_int
    flat_all = jax.lax.bitcast_convert_type(
        carrier[off_bytes:off_bytes + nb * n].reshape(-1, nb),
        layout.float_dtype,
    )
    K = MAX_APPEND_SETS
    cap = match_sets[0][0].shape[1]
    flat_f = flat_all[: layout.n_float]
    flat_i = flat_all[layout.n_float:]
    w_scale = flat_f[layout.aux_f_off:layout.aux_f_off + cap]
    oi = layout.aux_i_off
    maps = jnp.round(flat_i[oi:oi + K * cap]).astype(
        jnp.int32).reshape(K, cap)
    cur_slots = jnp.round(flat_i[oi + K * cap:oi + K * cap + K]).astype(
        jnp.int32)
    n_obs = jnp.round(flat_i[oi + K * cap + K]).astype(jnp.int32)
    problem = layout.unflatten(flat_all)
    problem, n_obs = _append_matches_all(
        problem, match_sets, maps, w_scale, cur_slots, n_obs
    )
    solved, stats = solve_window_impl(problem, cameras, imu_params, config)
    dtype = solved.pose.dtype
    out = jnp.concatenate([
        solved.pose.ravel(),
        solved.speed_bias.ravel(),
        solved.landmarks.ravel(),
        solved.extrinsics.ravel(),
        jnp.stack([
            stats["initial_cost"].astype(dtype),
            stats["final_cost"].astype(dtype),
            stats["iterations"].astype(dtype),
            stats["lambda"].astype(dtype),
            # FINAL obs row count incl. device appends: > obs capacity
            # means rows were silently dropped by the scatter's
            # mode="drop" — the host warns on it (apply_solved_flat)
            n_obs.astype(dtype),
        ]),
        diag.astype(dtype).ravel(),
    ])
    return out


def decode_solved(out, S: int, L: int, NC: int):
    """Host-side decode of solve_packed's flat output."""
    import numpy as np

    out = np.asarray(out)
    o = 0
    pose = out[o:o + S * 7].reshape(S, 7); o += S * 7
    sb = out[o:o + S * 9].reshape(S, 9); o += S * 9
    lms = out[o:o + L * 4].reshape(L, 4); o += L * 4
    ext = out[o:o + NC * 7].reshape(NC, 7); o += NC * 7
    stats = {
        "initial_cost": out[o], "final_cost": out[o + 1],
        "iterations": out[o + 2], "lambda": out[o + 3],
        "n_obs": out[o + 4],
    }
    return pose, sb, lms, ext, stats
