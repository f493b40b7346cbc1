"""NDT node wrappers (2D and 3D) — tier-3 analog for the NDT nodes."""

import numpy as np
import pytest

from beluga_tpu.io.config import AmclNodeConfig
from beluga_tpu.io.viz import ndt_ellipsoids
from beluga_tpu.maps.ndt import load_ndt_hdf5
from beluga_tpu.ndt_node import NdtAmclNode, NdtAmclNode3D

TURTLEBOT_NDT = "/root/reference/beluga/test/beluga/test_data/turtlebot3_world.hdf5"
SAMPLE_3D_NDT = "/root/reference/beluga/test/beluga/test_data/sample_3d_ndt_map.hdf5"


def map_scan(ndt_map, n=60, seed=0, dim=2):
    rng = np.random.default_rng(seed)
    k = min(8, int(ndt_map.num_cells))
    sel = rng.choice(int(ndt_map.num_cells), size=k, replace=False)
    means = np.asarray(ndt_map.means)[sel]
    return (means[rng.integers(0, k, n)] + rng.normal(0, 0.05, (n, dim))).astype(np.float32)


class TestNdtNode2d:
    def test_full_cycle(self):
        cfg = AmclNodeConfig(max_particles=200, min_particles=50)
        node = NdtAmclNode(cfg)
        node.set_map_path(TURTLEBOT_NDT)
        ndt_map = node._ctx["ndt_map"]
        pts = map_scan(ndt_map)
        res = node.handle_point_cloud((0.0, 0.0, 0.0), pts)
        assert res.valid
        assert np.isfinite(res.pose).all()
        # gating then forced update
        res2 = node.handle_point_cloud((0.01, 0.0, 0.0), pts)
        assert not res2.valid
        node.request_nomotion_update()
        res3 = node.handle_point_cloud((0.01, 0.0, 0.0), pts)
        assert res3.valid


class TestNdtNode3d:
    def test_full_cycle(self):
        cfg = AmclNodeConfig(max_particles=150, min_particles=40)
        node = NdtAmclNode3D(cfg)
        node.set_map_path(SAMPLE_3D_NDT)
        ndt_map = node._ctx["ndt_map"]
        pts = map_scan(ndt_map, dim=3)
        res = node.handle_point_cloud((0, 0, 0, 0, 0, 0), pts)
        assert res.valid
        assert res.pose.shape == (6,)
        assert res.covariance.shape == (6, 6)

    def test_lifecycle_retention_and_scan_gating(self):
        """3D node: cleanup retains the 6-vector estimate (the retention
        path must dispatch through the SE3 set_initial_pose signature —
        regression for the 4-positional-arg crash), and scans are dropped
        while INACTIVE."""
        cfg = AmclNodeConfig(max_particles=150, min_particles=40)
        node = NdtAmclNode3D(cfg)
        node.set_map_path(SAMPLE_3D_NDT)
        ndt_map = node._ctx["ndt_map"]
        pts = map_scan(ndt_map, dim=3)
        res = node.handle_point_cloud((0, 0, 0, 0, 0, 0), pts)
        assert res.valid

        node.deactivate()
        dropped = node.handle_point_cloud((0, 0, 0, 0, 0, 0), pts)
        assert not dropped.valid  # lifecycle contract: INACTIVE drops scans

        est_before = node.last_known_estimate[0].copy()
        node.cleanup()
        assert node._state is None
        node.configure()
        node.activate()
        node.set_map_path(SAMPLE_3D_NDT)  # re-init from retained estimate
        xyz = np.asarray(node._state.particles.state.xyz)
        assert np.isfinite(xyz).all()
        assert abs(np.mean(xyz[:, 0]) - est_before[0]) < 1.0
        assert abs(np.mean(xyz[:, 1]) - est_before[1]) < 1.0


class TestNdtEllipsoids:
    def test_ellipsoids_from_map(self):
        m = load_ndt_hdf5(TURTLEBOT_NDT)
        centers, radii, rots, valid = ndt_ellipsoids(m)
        assert valid.any()
        i = int(np.argmax(valid))
        # rotation is orthonormal, radii positive
        np.testing.assert_allclose(rots[i] @ rots[i].T, np.eye(2), atol=1e-8)
        assert (radii[i] > 0).all()
        # reconstruction: R diag(r^2) R^T == covariance
        cov = rots[i] @ np.diag(radii[i] ** 2) @ rots[i].T
        np.testing.assert_allclose(cov, np.asarray(m.covs)[i], rtol=1e-4, atol=1e-7)
