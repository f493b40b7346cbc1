"""Stream-driven localization node (the beluga_amcl AmclNode equivalent).

The reference wraps the filter in a ROS 2 lifecycle node
(beluga_amcl/src/amcl_node.cpp): map subscription with hot-swap, laser-scan
callbacks through TF, initial-pose handling, a global relocalization
service and a forced no-motion update service, and map→odom correction
broadcasting.  This module provides the same behavior as a plain Python
object driven by explicit calls — no middleware, suitable for embedding in
any stream/replay/serving pipeline:

  * ``set_map`` — (re)build the sensor model; keeps the last estimate
    across map swaps (amcl_node.cpp:435-497)
  * ``set_initial_pose`` — Gaussian (re)initialization (amcl_node.cpp:682-706)
  * ``global_localization`` — uniform over free space (amcl_node.cpp:662-667)
  * ``request_nomotion_update`` — force an update (amcl_node.cpp:669-680)
  * ``handle_scan`` — one filter update from (odom pose, scan points);
    returns the pose estimate and the map→odom correction transform
    (amcl_node.cpp:581-647)

Lifecycle: the node derives from :class:`beluga_tpu.lifecycle
.BaseLifecycleNode` (the BaseAMCLNode contract, ros2_common.hpp:59-145):
``configure/activate/deactivate/cleanup/shutdown`` transitions with
``do_*`` extension points, ``autostart`` (default True, so plain
construct-and-call use keeps working), a 200 ms periodic viz timer
(fired cooperatively via ``tick()``), and estimate retention across
cleanup → reconfigure cycles (amcl_node KeepCurrentEstimateAfterCleanup,
test_amcl_node.cpp:387-485).  Scans arriving while not ACTIVE are
dropped (subscriptions exist only when active in the reference).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.core.random import sample_normal_se2, sample_uniform_free_cells
from beluga_tpu.filters import amcl as amcl_filter
from beluga_tpu.filters.builders import make_likelihood_field_filter
from beluga_tpu.io.config import AmclNodeConfig
from beluga_tpu.lie import SE2, SO2
from beluga_tpu.maps.occupancy import OccupancyGrid

# -- packed per-scan IO protocol (SE2 nodes) --------------------------------
#
# The per-scan inputs travel as ONE f32 vector ``[odom x,y,yaw | pts flat |
# mask]`` and the estimate returns as one f32[13]; each separate host array
# is its own blocking tunnel roundtrip on synchronous remote runtimes
# (2.7-31 ms measured — NOTES.md r5 session 2), so the node pays exactly
# one h2d and one d2h per scan.  Layout constants are shared by the packer
# (pack_scan_input), the jitted step (make_packed_step_se2), and the
# unpacker (_finalize / NdtAmclNode.handle_point_cloud).
EST2_POSE = slice(0, 3)  # x, y, yaw
EST2_COV = slice(3, 12)  # 3x3 row-major
EST2_VALID = 12
EST2_LEN = 13


def pack_scan_input(odom_pose_xytheta, points, point_mask=None) -> np.ndarray:
    """Host-side build of the packed step input; validates that the mask
    length matches the point count (a mismatch would otherwise silently
    re-partition the vector into garbage points/mask)."""
    pts = np.asarray(points, np.float32)
    mask = (
        np.ones(pts.shape[0], np.float32)
        if point_mask is None
        else np.asarray(point_mask, np.float32)
    )
    if mask.shape[0] != pts.shape[0]:
        raise ValueError(
            f"point_mask length {mask.shape[0]} != point count {pts.shape[0]}"
        )
    return np.concatenate(
        [np.asarray(odom_pose_xytheta, np.float32).reshape(3), pts.ravel(),
         mask]
    )


def make_packed_step_se2(params, models):
    """The jitted packed-IO update for SE2 nodes (AmclNode + 2D NDT)."""

    def packed_step(ctx, state, packed):
        beams = (packed.shape[0] - 3) // 3
        yaw_o = packed[2]
        odom = SE2(
            packed[0:2],
            SO2(jnp.stack([jnp.cos(yaw_o), jnp.sin(yaw_o)])),
        )
        pts = packed[3 : 3 + 2 * beams].reshape(beams, 2)
        mask = packed[3 + 2 * beams :] > 0.5
        state, est = amcl_filter.update(
            params, models, ctx, state, odom, pts, mask
        )
        yaw = jnp.arctan2(est.pose.rot.z[1], est.pose.rot.z[0])
        out = jnp.concatenate([
            jnp.stack([est.pose.x, est.pose.y, yaw]),
            est.covariance.reshape(-1),
            est.valid.astype(jnp.float32)[None],
        ])
        return state, out

    return packed_step


@dataclasses.dataclass
class ScanResult:
    valid: bool
    pose: np.ndarray | None  # (x, y, yaw) map-frame estimate
    covariance: np.ndarray | None  # 3x3
    map_to_odom: np.ndarray | None  # (x, y, yaw) correction transform
    latency_s: float


from beluga_tpu.lifecycle import BaseLifecycleNode


class AmclNode(BaseLifecycleNode):
    """2D AMCL node over occupancy-grid maps (managed lifecycle)."""

    def __init__(self, config: AmclNodeConfig | None = None, seed: int = 0,
                 verbose: bool = False, autostart: bool = True,
                 pipelined: bool = False):
        """``pipelined=True`` defers the per-scan estimate readback by one
        scan: ``handle_scan`` enqueues scan t's update (device-side state
        chaining — no host sync) and harvests scan t-1's estimate, which
        the accelerator finished during the inter-scan gap.  The ~3-4 ms
        per-dispatch round-trip of remote/accelerator runtimes then
        overlaps the next scan's host work instead of serializing with it
        (VERDICT r4 #7); the published estimate lags by one scan (the
        ScanResult carries its own scan's odometry for the TF
        correction).  The reference node publishes synchronously
        (amcl_node.cpp:581-647); synchronous remains the default."""
        self.config = config or AmclNodeConfig()
        self.verbose = verbose
        self.pipelined = pipelined
        self._seed = seed
        self.latest_viz: tuple[np.ndarray, np.ndarray] | None = None
        self.dropped_scans = 0
        self.last_known_estimate: tuple[np.ndarray, np.ndarray] | None = None
        self._reset_runtime()
        super().__init__(autostart=autostart)

    def _reset_runtime(self) -> None:
        self.params = self.config.amcl_params()
        self._key = jax.random.PRNGKey(self._seed)
        self._models = None
        self._ctx = None
        self._state = None
        self._grid: OccupancyGrid | None = None
        self._step = None
        self._first_map_set = False
        self._pending = None  # (est_device, odom_xytheta) of the in-flight scan

    # -- lifecycle hooks (ros2_common.hpp do_* virtuals) --------------------

    def do_configure(self) -> None:
        # parameters are (re)read at configure time; runtime structures are
        # built lazily by the first map (amcl_node.cpp get_initial_estimate
        # + map subscription on configure)
        self.params = self.config.amcl_params()

    def do_cleanup(self) -> None:
        # drop the filter and map but RETAIN last_known_estimate: a later
        # configure + map re-initializes from it
        # (test_amcl_node.cpp KeepCurrentEstimateAfterCleanup)
        self._reset_runtime()

    def do_shutdown(self) -> None:
        self._reset_runtime()
        self.last_known_estimate = None

    def do_periodic_timer_callback(self) -> None:
        # the 200 ms viz timer: snapshot the particle cloud (the
        # particle_cloud/particle_markers publisher analog)
        if self._state is not None:
            self.latest_viz = self.particle_cloud()

    # -- map handling (amcl_node.cpp:435-497) -------------------------------

    def set_map(self, grid: OccupancyGrid) -> None:
        if self._first_map_set and self.config.first_map_only:
            return
        rebuild = self._models is None
        cfg = self.config
        if cfg.laser_model_type == "beam":
            from beluga_tpu.filters.builders import make_beam_filter

            # cluster estimate matches the reference node path, which uses
            # cluster_based_estimation for every sensor model
            # (beluga_ros/include/beluga_ros/amcl.hpp estimate())
            self._models, self._ctx = make_beam_filter(
                grid,
                cfg.beam_params(),
                motion_params=cfg.motion_params(),
                use_range_lut={"lut": True, "windowed": "windowed"}.get(
                    cfg.beam_fast_path, False
                ),
                use_sphere_trace=cfg.beam_fast_path == "sphere_trace",
                use_cluster_estimate=True,
            )
        else:
            self._models, self._ctx = make_likelihood_field_filter(
                grid,
                cfg.likelihood_field_params(),
                motion_params=cfg.motion_params(),
                prob_model=cfg.laser_model_type == "likelihood_field_prob",
                use_cluster_estimate=True,
            )
        self._grid = grid
        self._first_map_set = True
        if rebuild or self._step is None:
            self._step = jax.jit(
                make_packed_step_se2(self.params, self._models)
            )

        # initialize / re-initialize particles (amcl_node.cpp:484-497):
        # a retained estimate takes precedence over the configured initial
        # pose unless always_reset_initial_pose — KeepCurrentEstimate
        # [AfterCleanup] semantics (test_amcl_node.cpp:387-485); cleanup
        # clears the filter but keeps last_known_estimate, so the old
        # "state is None -> config pose" ordering would kidnap the filter
        # back to the configured pose on every reconfigure
        if self.config.set_initial_pose and self.config.always_reset_initial_pose:
            self.set_initial_pose(
                self.config.initial_pose_x,
                self.config.initial_pose_y,
                self.config.initial_pose_yaw,
                self.config.initial_pose_covariance(),
            )
        elif self.last_known_estimate is not None:
            pose, cov = self.last_known_estimate
            self.set_initial_pose(pose[0], pose[1], pose[2], cov)
        elif self.config.set_initial_pose and self._state is None:
            self.set_initial_pose(
                self.config.initial_pose_x,
                self.config.initial_pose_y,
                self.config.initial_pose_yaw,
                self.config.initial_pose_covariance(),
            )
        elif self._state is None:
            self.global_localization()

    # -- initialization (amcl_node.cpp:662-706) -----------------------------

    def set_initial_pose(self, x, y, yaw, covariance=None) -> None:
        if covariance is None:
            covariance = self.config.initial_pose_covariance()
        self._key, k = jax.random.split(self._key)
        states = sample_normal_se2(
            k,
            self.params.max_particles,
            SE2.from_xytheta(float(x), float(y), float(yaw)),
            jnp.asarray(np.asarray(covariance, np.float32)),
        )
        self._replace_particles(states)

    def global_localization(self) -> None:
        """Reinitialize uniformly over the map's free space."""
        assert self._grid is not None, "set_map first"
        self._key, k = jax.random.split(self._key)
        states = sample_uniform_free_cells(
            k, self.params.max_particles, self._grid.free_xy, self._grid.num_free
        )
        self._replace_particles(states)

    def _replace_particles(self, states) -> None:
        if self._state is None:
            self._key, k = jax.random.split(self._key)
            self._state = amcl_filter.init_state(k, states, self.params)
        else:
            self._state = amcl_filter.reinit_particles(self._state, states)

    def request_nomotion_update(self) -> None:
        """Force the next update even without motion (amcl_node.cpp:669-680)."""
        if self._state is not None:
            self._state = self._state._replace(force_update=jnp.asarray(True))

    # -- scan handling (amcl_node.cpp:581-647) ------------------------------

    def handle_scan(self, odom_pose_xytheta, points, point_mask=None) -> ScanResult:
        """Process one scan.

        Args:
          odom_pose_xytheta: base pose in the odom frame, (x, y, yaw).
          points: ``f32[B, 2]`` scan points in the base frame (static beam
            capacity; pad + mask).
          point_mask: ``bool[B]`` valid-beam mask (default all valid).
        """
        if not self.is_active:
            # scans are only subscribed while ACTIVE in the reference; check
            # before the state assertion so a scan arriving after
            # deactivate()+cleanup() (state None) is dropped, not an error
            self.dropped_scans += 1
            return ScanResult(False, None, None, None, 0.0)
        assert self._state is not None, "node not initialized (set_map first)"
        t0 = time.perf_counter()
        packed = pack_scan_input(odom_pose_xytheta, points, point_mask)
        mask = packed[3 + 2 * ((packed.shape[0] - 3) // 3) :]
        self._state, est = self._step(self._ctx, self._state, packed)
        if self.pipelined:
            # enqueue-only: harvest the PREVIOUS scan's estimate (computed
            # during the inter-scan gap) and leave this one in flight
            prev, self._pending = self._pending, (est, odom_pose_xytheta)
            if prev is None:
                return ScanResult(
                    False, None, None, None, time.perf_counter() - t0
                )
            est_prev, odom_prev = prev
            return self._finalize(
                np.asarray(jax.device_get(est_prev)), odom_prev, t0, mask
            )
        est = np.asarray(jax.device_get(est))
        return self._finalize(est, odom_pose_xytheta, t0, mask)

    def flush(self) -> ScanResult | None:
        """Harvest the in-flight scan's estimate (pipelined mode)."""
        if self._pending is None:
            return None
        t0 = time.perf_counter()
        (est, odom_prev), self._pending = self._pending, None
        return self._finalize(
            np.asarray(jax.device_get(est)), odom_prev, t0, None
        )

    def _finalize(self, est_vec, odom_pose_xytheta, t0, mask) -> ScanResult:
        # est_vec: packed f32[EST2_LEN] (layout constants at module top)
        latency = time.perf_counter() - t0
        if not est_vec[EST2_VALID] > 0.5:
            return ScanResult(False, None, None, None, latency)

        pose = np.asarray(est_vec[EST2_POSE], np.float64)
        cov = np.asarray(est_vec[EST2_COV], np.float64).reshape(3, 3)
        self.last_known_estimate = (pose, cov)
        if self.verbose and mask is not None:
            # per-update log line, like amcl_node.cpp:612-615
            n = int(jax.device_get(self._state.particles.active))
            b = int(np.asarray(jax.device_get(mask)).sum())
            print(f"[amcl] {n} particles {b} points - {latency*1e3:.3f}ms")

        # map->odom correction: T_map_odom = T_map_base * T_odom_base^-1
        # (amcl_node.cpp:624-636)
        c, s = np.cos(pose[2]), np.sin(pose[2])
        oc, os_ = np.cos(odom_pose_xytheta[2]), np.sin(odom_pose_xytheta[2])
        # invert odom pose
        inv_t = -np.array([[oc, os_], [-os_, oc]]) @ np.asarray(odom_pose_xytheta[:2])
        inv_yaw = -odom_pose_xytheta[2]
        mx = pose[0] + (c * inv_t[0] - s * inv_t[1])
        my = pose[1] + (s * inv_t[0] + c * inv_t[1])
        myaw = np.arctan2(np.sin(pose[2] + inv_yaw), np.cos(pose[2] + inv_yaw))
        return ScanResult(True, pose, cov, np.array([mx, my, myaw]), latency)

    def handle_point_cloud(
        self,
        odom_pose_xytheta,
        points_xyz,
        sensor_pose_xyzrpy=(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        point_mask=None,
    ) -> ScanResult:
        """Process a 3D point cloud through the 2D filter.

        Transforms points by the sensor pose and projects onto the base
        z=0 plane, like beluga_ros::Amcl's SparsePointCloud3 overload
        (beluga_ros/src/amcl.cpp:66-80), then runs the filter update.
        """
        pts = np.asarray(points_xyz, np.float64)
        x, y, z, roll, pitch, yaw = (float(v) for v in sensor_pose_xyzrpy)
        cr, sr = np.cos(roll), np.sin(roll)
        cp, sp = np.cos(pitch), np.sin(pitch)
        cy, sy = np.cos(yaw), np.sin(yaw)
        rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        transformed = pts @ (rz @ ry @ rx).T + np.array([x, y, z])
        flat = transformed[:, :2].astype(np.float32)
        return self.handle_scan(odom_pose_xytheta, flat, point_mask)

    def handle_laser_scan(
        self,
        odom_pose_xytheta,
        ranges,
        angle_min: float,
        angle_increment: float,
        range_min: float | None = None,
        range_max: float | None = None,
        sensor_pose=(0.0, 0.0, 0.0),
    ) -> ScanResult:
        """Process a raw laser scan (the sensor_msgs/LaserScan path).

        Performs the native adapter work — polar→cartesian, sensor-frame
        transform, range filtering, ``max_beams`` take-evenly decimation
        (beluga_ros/laser_scan.hpp + amcl_node.cpp:537-551) — then runs the
        filter update.  Beam capacity is fixed at ``config.max_beams``.
        """
        pts, mask = self.prepare_scan(
            ranges, angle_min, angle_increment, range_min, range_max,
            sensor_pose,
        )
        return self.handle_scan(odom_pose_xytheta, pts, mask)

    def handle_point_cloud(
        self,
        odom_pose_xytheta,
        points_xyz,
        sensor_pose=(0.0, 0.0, 0.0),
        max_beams: int | None = None,
    ) -> ScanResult:
        """Process a 3D point cloud through the 2D filter.

        The reference node accepts ``sensor_msgs/PointCloud2`` as a
        mutually-exclusive alternative to laser scans
        (beluga_amcl/src/amcl_node.cpp:236-239); its update overload
        flattens the cloud to (x, y) pairs in the base frame
        (beluga_ros/src/amcl.cpp:64-80).  ``points_xyz`` is ``[P, 3]`` (or
        ``[P, 2]``) in the sensor frame, e.g. from
        ``io.native.decode_pointcloud2_cdr``.

        **Capacity cap**: non-finite points are masked and the cloud is
        take-evenly decimated to ``config.max_beams`` slots — a dense cloud
        wider than that loses points relative to the reference adapters,
        which feed *every* cloud point to the sensor model (the compiled
        update needs a static beam capacity).  ``max_beams`` overrides the
        capacity per call (e.g. sized to the bag's widest cloud, which
        ``io.rosbag.read_bag_cloud_stream`` reports); a new capacity
        recompiles the update program once.
        """
        pts, mask = self.prepare_point_cloud(
            points_xyz, sensor_pose, max_beams=max_beams
        )
        return self.handle_scan(odom_pose_xytheta, pts, mask)

    def prepare_point_cloud(
        self, points_xyz, sensor_pose=(0.0, 0.0, 0.0), max_beams: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """The point-cloud adapter work alone: planar projection,
        sensor-frame transform, finiteness mask, ``max_beams`` decimation,
        padding to the static beam capacity."""
        from beluga_tpu.io import native as _native

        cfg = self.config
        cap = cfg.max_beams if max_beams is None else int(max_beams)
        p = np.asarray(points_xyz, np.float32)
        ok = np.isfinite(p[:, :2]).all(axis=-1)
        sx, sy, syaw = (float(v) for v in sensor_pose)
        c, s = np.cos(syaw), np.sin(syaw)
        bx = c * p[:, 0] - s * p[:, 1] + sx
        by = s * p[:, 0] + c * p[:, 1] + sy
        full = np.where(ok[:, None], np.stack([bx, by], -1), 0.0).astype(
            np.float32
        )
        idx = _native.take_evenly_indices(len(p), cap)
        pts = np.zeros((cap, 2), np.float32)
        mask = np.zeros(cap, bool)
        pts[: len(idx)] = full[idx]
        mask[: len(idx)] = ok[idx]
        return pts, mask

    def prepare_scan(
        self,
        ranges,
        angle_min: float,
        angle_increment: float,
        range_min: float | None = None,
        range_max: float | None = None,
        sensor_pose=(0.0, 0.0, 0.0),
    ) -> tuple[np.ndarray, np.ndarray]:
        """The scan adapter work alone: polar→cartesian, sensor-frame
        transform, range filtering, ``max_beams`` take-evenly decimation,
        padding to the static beam capacity.  Shared by the per-scan path
        above and the offline scan-driven replay (tools/localize.py)."""
        from beluga_tpu.io import native as _native

        cfg = self.config
        range_min = cfg.laser_min_range if range_min is None else range_min
        range_max = (
            min(cfg.laser_max_range, 1e9) if range_max is None else range_max
        )
        ranges = np.asarray(ranges, np.float32)
        pts_full, mask_full = _native.scan_to_points(
            ranges, angle_min, angle_increment, range_min, range_max, sensor_pose
        )
        idx = _native.take_evenly_indices(len(ranges), cfg.max_beams)
        # static beam capacity: pad when the scan has fewer beams than
        # max_beams so the compiled update shape never changes
        pts = np.zeros((cfg.max_beams, 2), np.float32)
        mask = np.zeros(cfg.max_beams, bool)
        pts[: len(idx)] = pts_full[idx]
        mask[: len(idx)] = mask_full[idx]
        return pts, mask

    # -- introspection (particle_cloud publishers analog) -------------------

    def particle_cloud(self) -> tuple[np.ndarray, np.ndarray]:
        """Returns (poses [n, 3], weights [n]) of the alive particles."""
        assert self._state is not None
        p = self._state.particles
        n = int(p.active)
        xyt = np.asarray(
            jax.device_get(
                jnp.concatenate([p.state.xy, p.state.theta[:, None]], axis=-1)
            )
        )[:n]
        w = np.asarray(jax.device_get(p.weight))[:n]
        return xyt, w
