"""Stream-driven NDT AMCL nodes (NdtAmclNode / NdtAmclNode3D equivalents).

Middleware-free counterparts of beluga_amcl/src/ndt_amcl_node.cpp and
ndt_amcl_node_3d.cpp: HDF5 map loading, pose initialization, per-scan
updates over 2D laser or 3D point-cloud measurements, estimate retention.
Uses the core filter loop with plain (non-cluster) estimation and the
estimate-based Gaussian recovery generator, like the reference NDT nodes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.core.random import sample_normal_se2, sample_normal_se3
from beluga_tpu.filters import amcl as amcl_filter
from beluga_tpu.filters.ndt_builders import make_ndt_filter_2d, make_ndt_filter_3d
from beluga_tpu.io.config import AmclNodeConfig
from beluga_tpu.lie import SE2, SE3, SO3
from beluga_tpu.maps.ndt import load_ndt_hdf5
from beluga_tpu.models.sensor.ndt import NdtModelParams
from beluga_tpu.node import ScanResult


from beluga_tpu.lifecycle import BaseLifecycleNode


class NdtAmclNode(BaseLifecycleNode):
    """2D NDT AMCL over SE2 states; measurements are 2D point clouds.

    Managed lifecycle (BaseAMCLNode contract, ros2_common.hpp:59-145) —
    see beluga_tpu/lifecycle.py; autostart default keeps the plain
    construct-and-call surface working."""

    dim = 2

    def __init__(
        self,
        config: AmclNodeConfig | None = None,
        ndt_params: NdtModelParams = NdtModelParams(minimum_likelihood=1e-6),
        seed: int = 0,
        autostart: bool = True,
    ):
        self.config = config or AmclNodeConfig()
        self.ndt_params = ndt_params
        self._seed = seed
        self.last_known_estimate = None
        self._reset_runtime()
        super().__init__(autostart=autostart)

    def _reset_runtime(self):
        self.params = self.config.amcl_params()
        self._key = jax.random.PRNGKey(self._seed)
        self._models = None
        self._ctx = None
        self._state = None
        self._step = None

    def do_configure(self):
        self.params = self.config.amcl_params()

    def do_cleanup(self):
        # retain last_known_estimate across cleanup -> reconfigure
        self._reset_runtime()

    def do_shutdown(self):
        self._reset_runtime()
        self.last_known_estimate = None

    def set_map_path(self, hdf5_path: str) -> None:
        self.set_map(load_ndt_hdf5(hdf5_path))

    def set_map(self, ndt_map) -> None:
        assert ndt_map.dim == self.dim, f"expected a {self.dim}D NDT map"
        self._models, self._ctx = self._build(ndt_map)
        self._step = jax.jit(self._make_packed_step())
        if self._state is None:
            if self.last_known_estimate is not None:
                # estimate retention across cleanup -> reconfigure
                self._initialize_from_estimate(*self.last_known_estimate)
            else:
                self.set_initial_pose()

    def _build(self, ndt_map):
        return make_ndt_filter_2d(
            ndt_map, self.ndt_params, self.config.motion_params()
        )

    # -- initialization ------------------------------------------------------

    def set_initial_pose(self, x=None, y=None, yaw=None, covariance=None):
        cfg = self.config
        x = cfg.initial_pose_x if x is None else x
        y = cfg.initial_pose_y if y is None else y
        yaw = cfg.initial_pose_yaw if yaw is None else yaw
        if covariance is None:
            covariance = cfg.initial_pose_covariance()
        self._key, k = jax.random.split(self._key)
        states = sample_normal_se2(
            k, self.params.max_particles,
            SE2.from_xytheta(float(x), float(y), float(yaw)),
            jnp.asarray(np.asarray(covariance, np.float32)),
        )
        self._replace(states, SE2.identity())

    def _replace(self, states, odom_identity):
        if self._state is None:
            self._key, k = jax.random.split(self._key)
            self._state = amcl_filter.init_state(
                k, states, self.params, odom_identity=odom_identity
            )
        else:
            self._state = amcl_filter.reinit_particles(self._state, states)

    def _initialize_from_estimate(self, pose, covariance) -> None:
        # pose is the stored last_known_estimate vector: (x, y, yaw) for
        # the 2D node; the 3D override consumes its 6-vector form
        self.set_initial_pose(pose[0], pose[1], pose[2], covariance)

    def request_nomotion_update(self) -> None:
        if self._state is not None:
            self._state = self._state._replace(force_update=jnp.asarray(True))

    # -- updates -------------------------------------------------------------

    def _make_packed_step(self):
        """Packed-IO update — the shared SE2 protocol from node.py (one
        h2d vector in, one f32[EST2_LEN] estimate out)."""
        from beluga_tpu.node import make_packed_step_se2

        return make_packed_step_se2(self.params, self._models)

    def handle_point_cloud(self, odom_pose_xytheta, points, point_mask=None) -> ScanResult:
        """One update from ``(odom pose (x, y, yaw), 2D points [P, 2])``."""
        from beluga_tpu.node import (
            EST2_COV,
            EST2_POSE,
            EST2_VALID,
            pack_scan_input,
        )

        if not self.is_active:
            # drop before the state assertion (lifecycle contract: clouds
            # arriving after deactivate/cleanup are dropped, not errors)
            return ScanResult(False, None, None, None, 0.0)
        assert self._state is not None, "set_map first"
        t0 = time.perf_counter()
        packed = pack_scan_input(odom_pose_xytheta, points, point_mask)
        self._state, est = self._step(self._ctx, self._state, packed)
        est = np.asarray(jax.device_get(est))
        latency = time.perf_counter() - t0
        if not est[EST2_VALID] > 0.5:
            return ScanResult(False, None, None, None, latency)
        pose = np.asarray(est[EST2_POSE], np.float64)
        cov = np.asarray(est[EST2_COV], np.float64).reshape(3, 3)
        self.last_known_estimate = (pose, cov)
        return ScanResult(True, pose, cov, None, latency)


# SE3 packed-estimate layout (producer: NdtAmclNode3D._make_packed_step;
# consumer: its handle_point_cloud)
_EST3_POSE = slice(0, 6)  # x, y, z, roll, pitch, yaw
_EST3_COV = slice(6, 42)  # 6x6 row-major
_EST3_VALID = 42
_EST3_LEN = 43


class NdtAmclNode3D(NdtAmclNode):
    """3D NDT AMCL over SE3 states (ndt_amcl_node_3d.cpp equivalent)."""

    dim = 3

    def _build(self, ndt_map):
        return make_ndt_filter_3d(
            ndt_map, self.ndt_params, self.config.motion_params()
        )

    def set_initial_pose(self, xyz=(0.0, 0.0, 0.0), rpy=(0.0, 0.0, 0.0), covariance=None):
        if covariance is None:
            c = np.eye(6, dtype=np.float32) * 0.25
            c[3, 3] = c[4, 4] = c[5, 5] = 0.0685
            covariance = c
        roll, pitch, yaw = (jnp.asarray(v, jnp.float32) for v in rpy)
        mean = SE3(
            jnp.asarray(np.asarray(xyz, np.float32)),
            SO3.from_rpy(roll, pitch, yaw),
        )
        self._key, k = jax.random.split(self._key)
        states = sample_normal_se3(
            k, self.params.max_particles, mean,
            jnp.asarray(np.asarray(covariance, np.float32)),
        )
        self._replace(states, SE3.identity())

    def _initialize_from_estimate(self, pose, covariance) -> None:
        # stored 3D estimate vector is (x, y, z, roll, pitch, yaw)
        self.set_initial_pose(pose[:3], pose[3:6], covariance)

    def _make_packed_step(self):
        """SE3 packed-IO update: in = [x,y,z,roll,pitch,yaw | pts flat |
        mask]; out = f32[_EST3_LEN] (layout constants below)."""
        params, models = self.params, self._models

        def packed_step(ctx, state, packed):
            pts_n = (packed.shape[0] - 6) // 4
            odom = SE3(
                packed[0:3],
                SO3.from_rpy(packed[3], packed[4], packed[5]),
            )
            pts = packed[6 : 6 + 3 * pts_n].reshape(pts_n, 3)
            mask = packed[6 + 3 * pts_n :] > 0.5
            state, est = amcl_filter.update(
                params, models, ctx, state, odom, pts, mask
            )
            r, p, yw = est.pose.rot.rpy()
            out = jnp.concatenate([
                est.pose.xyz,
                jnp.stack([r, p, yw]),
                est.covariance.reshape(-1),
                est.valid.astype(jnp.float32)[None],
            ])
            return state, out

        return packed_step

    def handle_point_cloud(self, odom_pose, points, point_mask=None) -> ScanResult:
        """One update; ``odom_pose`` is (x, y, z, roll, pitch, yaw)."""
        if not self.is_active:
            # drop before the state assertion (lifecycle contract: clouds
            # arriving after deactivate/cleanup are dropped, not errors)
            return ScanResult(False, None, None, None, 0.0)
        assert self._state is not None, "set_map first"
        t0 = time.perf_counter()
        pts = np.asarray(points, np.float32)
        mask = (
            np.ones(pts.shape[0], np.float32)
            if point_mask is None else np.asarray(point_mask, np.float32)
        )
        if mask.shape[0] != pts.shape[0]:
            raise ValueError(
                f"point_mask length {mask.shape[0]} != point count "
                f"{pts.shape[0]}"
            )
        packed = np.concatenate(
            [np.asarray(odom_pose, np.float32).reshape(6), pts.ravel(), mask]
        )
        self._state, est = self._step(self._ctx, self._state, packed)
        est = np.asarray(jax.device_get(est))
        latency = time.perf_counter() - t0
        if not est[_EST3_VALID] > 0.5:
            return ScanResult(False, None, None, None, latency)
        pose = np.asarray(est[_EST3_POSE], np.float64)
        cov = np.asarray(est[_EST3_COV], np.float64).reshape(6, 6)
        self.last_known_estimate = (pose, cov)
        return ScanResult(True, pose, cov, None, latency)
