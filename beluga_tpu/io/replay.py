"""Sensor-stream replay and simulation harness.

The reference's system tests replay a recorded rosbag
(``beluga_system_tests/test/test_system.cpp:119-272``) through the filter
and gate per-update pose error.  The bag payload is not shipped with the
reference snapshot (only metadata), so this module provides:

  * :class:`ScanSimulator` — laser scans ray-cast against an occupancy grid
    (same beam geometry as the turtlebot3 LDS-01 used by the
    ``perfect_odometry`` bag: 360 beams over 2π, 3.5 m range);
  * :func:`drive_trajectory` — a collision-checked waypoint trajectory
    through map free space with perfect odometry (odom == ground truth,
    matching the bag's name and intent);
  * :func:`replay` — runs a filter update per scan and collects estimates.

These produce the accuracy-parity harness: per-update error gates of 0.9 m
and 30° (test_system.cpp:133-134) are asserted in tests/test_system.py.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OccupancyGrid
from beluga_tpu.ops.raycast import cast_rays

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ScanSpec:
    """Laser geometry; defaults match the turtlebot3 LDS-01 of the
    perfect_odometry bag (360 beams, 0.12-3.5 m)."""

    num_beams: int = 360
    min_range: float = 0.12
    max_range: float = 3.5
    max_beams: int = 60  # decimation, beluga_ros::LaserScan max_beams


class ScanSimulator:
    """Ray-cast scan generation + take_evenly beam decimation."""

    def __init__(self, grid: OccupancyGrid, spec: ScanSpec = ScanSpec()):
        self.grid = grid
        self.spec = spec
        self._res = grid.resolution_hint
        self._angles = jnp.asarray(
            np.linspace(-np.pi, np.pi, spec.num_beams, endpoint=False), jnp.float32
        )
        self._cast = jax.jit(self._cast_impl)

    def _cast_impl(self, pose: SE2):
        local = self.grid.origin.inverse() @ pose
        n = self.spec.num_beams
        src = jnp.broadcast_to(local.xy, (n, 2))
        world_angles = local.theta + self._angles
        dirs = jnp.stack([jnp.cos(world_angles), jnp.sin(world_angles)], -1)
        dist, hit = cast_rays(
            self.grid, src, dirs, self.spec.max_range, resolution_hint=self._res
        )
        return dist, hit

    def ranges(self, pose: SE2, key: Array | None = None,
               noise_sigma: float = 0.0) -> np.ndarray:
        """Raw undecimated range array with NaN for no-return beams — the
        ``sensor_msgs/LaserScan.ranges`` wire format, for recording
        synthetic bags (tests/test_system_bag.py)."""
        dist, hit = self._cast(pose)
        dist = np.asarray(dist)
        hit = np.asarray(hit)
        if noise_sigma > 0.0 and key is not None:
            dist = dist + np.asarray(
                jax.random.normal(key, dist.shape, jnp.float32) * noise_sigma
            )
        return np.where(hit, dist, np.nan).astype(np.float32)

    def scan(self, pose: SE2, key: Array | None = None, noise_sigma: float = 0.0):
        """Simulate one scan from a world-frame pose.

        Returns decimated ``(points f32[max_beams, 2], mask bool[max_beams])``
        with points in the robot/base frame (what beluga_ros::Amcl::update
        consumes after the sensor transform, beluga_ros/src/amcl.cpp:54-63).
        """
        dist, hit = self._cast(pose)
        dist = np.asarray(dist)
        hit = np.asarray(hit)
        if noise_sigma > 0.0 and key is not None:
            dist = dist + np.asarray(
                jax.random.normal(key, dist.shape, jnp.float32) * noise_sigma
            )
        valid = hit & (dist >= self.spec.min_range) & (dist <= self.spec.max_range)

        # take_evenly decimation to max_beams (views/take_evenly.hpp, applied
        # by the LaserScan adapter before range filtering)
        from beluga_tpu.io.native import take_evenly_indices

        idx = take_evenly_indices(self.spec.num_beams, self.spec.max_beams)
        angles = np.asarray(self._angles)[idx]
        r = dist[idx]
        m = valid[idx]
        pts = np.stack([r * np.cos(angles), r * np.sin(angles)], -1).astype(np.float32)
        pts[~m] = 0.0
        return jnp.asarray(pts), jnp.asarray(m)


def drive_trajectory(
    grid: OccupancyGrid,
    start_xy: tuple[float, float],
    num_steps: int,
    step_length: float = 0.06,
    robot_radius: float = 0.15,
    seed: int = 0,
) -> np.ndarray:
    """Generate a smooth collision-free trajectory through free space.

    A simple wander controller: keep heading, steer away when the lookahead
    footprint would leave free space.  Returns ``f64[num_steps, 3]``
    (x, y, yaw) ground-truth poses in the world frame.
    """
    rng = np.random.default_rng(seed)
    data = np.asarray(grid.data)
    res = grid.resolution_hint
    ox, oy, origin_th = grid.origin_hint
    origin_xy = np.array([ox, oy])
    c, s = np.cos(origin_th), np.sin(origin_th)
    rot_inv = np.array([[c, s], [-s, c]])

    def is_free(p_world):
        local = rot_inv @ (np.asarray(p_world) - origin_xy)
        # check a small footprint disc
        for dx in (-robot_radius, 0.0, robot_radius):
            for dy in (-robot_radius, 0.0, robot_radius):
                ci = np.floor((local + [dx, dy]) / res).astype(int)
                if not (0 <= ci[0] < data.shape[1] and 0 <= ci[1] < data.shape[0]):
                    return False
                if data[ci[1], ci[0]] != 0:
                    return False
        return True

    pose = np.array([start_xy[0], start_xy[1], 0.0])
    assert is_free(pose[:2]), "start pose is not in free space"
    out = np.zeros((num_steps, 3))
    for i in range(num_steps):
        # steer: try straight, else rotate until a free lookahead is found
        for attempt in range(36):
            delta = 0.0 if attempt == 0 else rng.uniform(-np.pi / 4, np.pi / 4) * (
                1 + attempt / 6
            )
            yaw = pose[2] + delta
            lookahead = pose[:2] + 4 * step_length * np.array([np.cos(yaw), np.sin(yaw)])
            if is_free(lookahead):
                break
        pose[2] = yaw + rng.normal(0.0, 0.02)
        pose[:2] += step_length * np.array([np.cos(pose[2]), np.sin(pose[2])])
        out[i] = pose
    return out


def replay_on_device(params, models, ctx, state, odoms_xyt, points, masks):
    """Replay a whole recorded stream as ONE device program.

    ``lax.scan`` drives ``filters.amcl.update`` over preloaded per-step
    arrays, so the host pays a single dispatch for the full trajectory
    instead of one roundtrip per scan — on tunneled/remote backends that
    removes the ~ms dispatch floor from every step (the reference's bag
    replay is host-driven by necessity; an XLA filter loop is not).

    Args:
      odoms_xyt: ``f32[T, 3]`` odometry (x, y, yaw) per scan.
      points: ``f32[T, B, 2]`` scan points in the base frame.
      masks: ``bool[T, B]`` valid-beam masks.
    Returns:
      ``(final_state, estimates)`` with every Estimate leaf stacked to
      ``[T, ...]`` (``valid`` marks the steps that produced an update).
    """
    import functools

    from beluga_tpu.filters.amcl import update

    step = functools.partial(update, params, models, ctx)

    def body(st, inp):
        xyt, pts, mask = inp
        st, est = step(st, SE2.from_xytheta(xyt[0], xyt[1], xyt[2]), pts, mask)
        return st, est

    odoms_xyt = jnp.asarray(odoms_xyt, jnp.float32)
    return jax.lax.scan(
        body, state, (odoms_xyt, jnp.asarray(points), jnp.asarray(masks))
    )


def replay(
    update_fn: Callable,
    state,
    trajectory: np.ndarray,
    simulator: ScanSimulator,
    noise_sigma: float = 0.01,
    seed: int = 1,
):
    """Replay a trajectory through a filter.

    ``update_fn(state, odom_pose, points, mask) -> (state, Estimate)``.
    Perfect odometry: the control equals the ground-truth pose (as in the
    perfect_odometry bag).  Returns the list of (ground_truth, Estimate).
    """
    key = jax.random.PRNGKey(seed)
    results = []
    for i, (x, y, yaw) in enumerate(trajectory):
        pose = SE2.from_xytheta(float(x), float(y), float(yaw))
        key, k = jax.random.split(key)
        pts, mask = simulator.scan(pose, k, noise_sigma)
        state, est = update_fn(state, pose, pts, mask)
        results.append(((x, y, yaw), est))
    return state, results
