"""Configuration system and stream-node tests (tier-3 analog).

The reference covers node behavior with rclcpp-driven tests
(beluga_amcl/test/test_amcl_node.cpp, ~45 cases); without ROS the same
behaviors are driven through the AmclNode object API: parameter
validation, initial pose handling, global relocalization, no-motion
updates, map hot-swap with estimate retention.
"""

import numpy as np
import pytest

from beluga_tpu.io.config import AmclNodeConfig, load_config
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.node import AmclNode

DEFAULT_YAML = "/root/reference/beluga_example/params/default.ros2.yaml"


def small_world():
    data = np.zeros((80, 80), np.int8)
    data[0, :] = data[-1, :] = OCCUPIED_VALUE
    data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[30:40, 30:40] = OCCUPIED_VALUE
    return make_grid(data, 0.1)


def scan_toward_wall(n=30):
    """Fake scan: points roughly at the pillar seen from (2, 2)."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.5, 2.0, (n, 2)).astype(np.float32)
    return pts


class TestConfig:
    def test_defaults_valid(self):
        cfg = AmclNodeConfig()
        assert cfg.amcl_params().max_particles == 2000

    def test_load_reference_yaml(self):
        cfg = load_config(DEFAULT_YAML)
        # values straight from beluga_example/params/default.ros2.yaml
        assert cfg.max_particles == 2000
        assert cfg.min_particles == 500
        assert cfg.pf_err == 0.05
        assert cfg.pf_z == 3.0
        assert cfg.alpha1 == 0.1
        assert cfg.alpha2 == 0.05
        assert cfg.laser_model_type == "likelihood_field"
        assert cfg.robot_model_type == "nav2_amcl::DifferentialMotionModel"
        assert cfg.update_min_d == 0.25

    @pytest.mark.parametrize(
        "field,value",
        [
            ("min_particles", -1),
            ("max_particles", 0),
            ("pf_err", -0.1),
            ("resample_interval", 0),
            ("sigma_hit", 0.0),
            ("robot_model_type", "not_a_model"),
            ("laser_model_type", "sonar"),
            ("execution_policy", "gpu"),
        ],
    )
    def test_invalid_values_rejected(self, field, value):
        # parity with TestParameterValue/InvalidValue (test_amcl_node.cpp:750-797)
        with pytest.raises(ValueError):
            AmclNodeConfig(**{field: value})

    def test_min_greater_than_max_rejected(self):
        with pytest.raises(ValueError):
            AmclNodeConfig(min_particles=3000, max_particles=2000)

    def test_motion_param_mapping(self):
        cfg = AmclNodeConfig(robot_model_type="nav2_amcl::OmniMotionModel", alpha5=0.7)
        mp = cfg.motion_params()
        assert mp.strafe_noise_from_translation == 0.7


class TestNode:
    def make_node(self, **kw):
        cfg = AmclNodeConfig(
            max_particles=300, min_particles=50,
            set_initial_pose=True, initial_pose_x=2.0, initial_pose_y=2.0,
            **kw,
        )
        node = AmclNode(cfg)
        node.set_map(small_world())
        return node

    def test_initializes_from_config_pose(self):
        node = self.make_node()
        xyt, w = node.particle_cloud()
        assert len(xyt) == 300
        assert abs(np.mean(xyt[:, 0]) - 2.0) < 0.3

    def test_scan_produces_estimate_and_tf(self):
        node = self.make_node()
        res = node.handle_scan((0.0, 0.0, 0.0), scan_toward_wall())
        assert res.valid
        assert res.pose is not None and np.isfinite(res.pose).all()
        assert res.map_to_odom is not None
        # map->odom composed with odom pose reproduces the estimate
        mx, my, myaw = res.map_to_odom
        ox, oy, oyaw = 0.0, 0.0, 0.0
        x = mx + np.cos(myaw) * ox - np.sin(myaw) * oy
        np.testing.assert_allclose(x, res.pose[0], atol=1e-5)

    def test_motion_gating_in_node(self):
        node = self.make_node()
        r1 = node.handle_scan((0.0, 0.0, 0.0), scan_toward_wall())
        assert r1.valid
        r2 = node.handle_scan((0.01, 0.0, 0.0), scan_toward_wall())
        assert not r2.valid  # below update_min_d
        node.request_nomotion_update()
        r3 = node.handle_scan((0.01, 0.0, 0.0), scan_toward_wall())
        assert r3.valid

    def test_global_localization_spreads_particles(self):
        node = self.make_node()
        node.global_localization()
        xyt, _ = node.particle_cloud()
        # spread across the whole 8x8 m world, not the 0.25 m initial blob
        assert xyt[:, 0].std() > 1.0

    def test_map_hot_swap_keeps_estimate(self):
        # KeepCurrentEstimate analog (test_amcl_node.cpp:387-485)
        node = self.make_node()
        res = node.handle_scan((0.0, 0.0, 0.0), scan_toward_wall())
        assert res.valid
        est_before = node.last_known_estimate[0].copy()
        node.set_map(small_world())  # swap in a new (identical) map
        xyt, _ = node.particle_cloud()
        assert abs(np.mean(xyt[:, 0]) - est_before[0]) < 0.5

    def test_beam_model_node(self):
        node = self.make_node(laser_model_type="beam", laser_max_range=8.0)
        res = node.handle_scan((0.0, 0.0, 0.0), scan_toward_wall())
        assert res.valid

    @pytest.mark.parametrize("fast_path", ["lut", "windowed", "sphere_trace"])
    def test_beam_fast_path_node(self, fast_path):
        """The beam_fast_path knob wires each accelerated beam evaluation
        through the node (off-TPU "windowed" falls back to the gather LUT)."""
        node = self.make_node(laser_model_type="beam", laser_max_range=8.0,
                              beam_fast_path=fast_path)
        if fast_path == "windowed":
            assert "range_lut_bf16" in node._ctx
        res = node.handle_scan((0.0, 0.0, 0.0), scan_toward_wall())
        assert res.valid and np.isfinite(res.pose).all()

    def test_invalid_beam_fast_path_rejected(self):
        with pytest.raises(ValueError):
            AmclNodeConfig(beam_fast_path="warp")

    def test_latency_reported(self):
        node = self.make_node()
        res = node.handle_scan((0.0, 0.0, 0.0), scan_toward_wall())
        assert res.latency_s > 0


class TestLaserScanPath:
    def test_handle_laser_scan(self):
        cfg = AmclNodeConfig(
            max_particles=200, min_particles=50, max_beams=30,
            set_initial_pose=True, initial_pose_x=2.0, initial_pose_y=2.0,
        )
        node = AmclNode(cfg)
        node.set_map(small_world())
        rng = np.random.default_rng(0)
        ranges = rng.uniform(0.3, 3.0, 360).astype(np.float32)
        ranges[::10] = np.nan
        res = node.handle_laser_scan(
            (0.0, 0.0, 0.0), ranges, angle_min=-np.pi,
            angle_increment=2 * np.pi / 360, range_min=0.12, range_max=3.5,
        )
        assert res.valid
        assert np.isfinite(res.pose).all()


class TestPointCloudPath:
    def test_handle_point_cloud_projects_to_plane(self):
        cfg = AmclNodeConfig(
            max_particles=200, min_particles=50,
            set_initial_pose=True, initial_pose_x=2.0, initial_pose_y=2.0,
        )
        node = AmclNode(cfg)
        node.set_map(small_world())
        rng = np.random.default_rng(1)
        pts3 = rng.uniform(0.3, 2.0, (40, 3)).astype(np.float32)
        res = node.handle_point_cloud((0.0, 0.0, 0.0), pts3)
        assert res.valid
        assert np.isfinite(res.pose).all()


def test_public_api_importable():
    import beluga_tpu as bt

    for name in bt.__all__:
        assert hasattr(bt, name), name


class TestLifecycle:
    """BaseAMCLNode lifecycle contract (ros2_common.hpp:59-145,
    test_amcl_node.cpp:387-485 analog) — VERDICT r2 #8."""

    def _map(self):
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid

        data = np.zeros((40, 40), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[18:22, 25:29] = OCCUPIED_VALUE
        return make_grid(data, 0.1)

    def _scan(self):
        rng = np.random.default_rng(0)
        a = np.linspace(-np.pi, np.pi, 30, endpoint=False)
        r = rng.uniform(0.4, 1.6, 30)
        return np.stack([r * np.cos(a), r * np.sin(a)], -1).astype(np.float32)

    def test_transition_ordering(self):
        from beluga_tpu.lifecycle import LifecycleError, LifecycleState
        from beluga_tpu.node import AmclNode

        node = AmclNode(AmclNodeConfig(max_particles=128, min_particles=32),
                        autostart=False)
        assert node.lifecycle_state is LifecycleState.UNCONFIGURED
        with pytest.raises(LifecycleError):
            node.activate()  # must configure first
        node.configure()
        assert node.lifecycle_state is LifecycleState.INACTIVE
        with pytest.raises(LifecycleError):
            node.configure()  # already configured
        node.activate()
        assert node.is_active
        node.deactivate()
        node.cleanup()
        assert node.lifecycle_state is LifecycleState.UNCONFIGURED
        node.configure()
        node.shutdown()
        assert node.lifecycle_state is LifecycleState.FINALIZED
        assert node.transition_log == [
            "configure", "activate", "deactivate", "cleanup", "configure",
            "shutdown",
        ]

    def test_autostart_reaches_active(self):
        from beluga_tpu.lifecycle import LifecycleState
        from beluga_tpu.node import AmclNode

        node = AmclNode(AmclNodeConfig(max_particles=128, min_particles=32))
        assert node.lifecycle_state is LifecycleState.ACTIVE

    def test_inactive_drops_scans(self):
        from beluga_tpu.node import AmclNode

        cfg = AmclNodeConfig(
            max_particles=128, min_particles=32,
            set_initial_pose=True, initial_pose_x=2.0, initial_pose_y=2.0,
        )
        node = AmclNode(cfg)
        node.set_map(self._map())
        node.deactivate()
        res = node.handle_scan((2.0, 2.0, 0.0), self._scan())
        assert not res.valid and node.dropped_scans == 1
        node.activate()
        res = node.handle_scan((2.0, 2.0, 0.0), self._scan())
        assert res.valid

    def test_cleanup_retains_estimate(self):
        from beluga_tpu.node import AmclNode

        cfg = AmclNodeConfig(
            max_particles=256, min_particles=64,
            set_initial_pose=True, initial_pose_x=2.0, initial_pose_y=2.0,
        )
        node = AmclNode(cfg)
        node.set_map(self._map())
        res = node.handle_scan((2.0, 2.0, 0.0), self._scan())
        assert res.valid
        # force a retained estimate FAR from the configured initial pose so
        # the test cannot pass vacuously (the estimate, not the config
        # pose, must win after cleanup -> reconfigure)
        est_far = np.array([3.2, 1.1, 0.4])
        node.last_known_estimate = (est_far, np.eye(3, dtype=np.float32) * 0.01)

        node.deactivate()
        node.cleanup()
        assert node._state is None  # filter dropped
        assert node.last_known_estimate is not None  # estimate retained
        node.configure()
        node.activate()
        node.set_map(self._map())
        # re-initialized around the retained estimate, NOT the config pose
        xyt, _ = node.particle_cloud()
        assert abs(np.mean(xyt[:, 0]) - est_far[0]) < 0.3
        assert abs(np.mean(xyt[:, 1]) - est_far[1]) < 0.3

    def test_periodic_viz_timer(self):
        from beluga_tpu.node import AmclNode

        cfg = AmclNodeConfig(
            max_particles=128, min_particles=32,
            set_initial_pose=True, initial_pose_x=2.0, initial_pose_y=2.0,
        )
        node = AmclNode(cfg)
        node.set_map(self._map())
        assert node.latest_viz is None
        # the timer base pins lazily to the first tick's clock (drivers
        # may use sim time); the second tick past one period fires
        assert node.tick(now=10.0) == 0
        fired = node.tick(now=10.3)
        assert fired == 1
        assert node.latest_viz is not None
        poses, weights = node.latest_viz
        assert len(poses) == len(weights) > 0
        # timer removed on deactivate
        node.deactivate()
        assert node.tick(now=11.0) == 0

    def test_ndt_node_lifecycle(self):
        from beluga_tpu.lifecycle import LifecycleState
        from beluga_tpu.ndt_node import NdtAmclNode

        node = NdtAmclNode(AmclNodeConfig(max_particles=128, min_particles=32),
                           autostart=False)
        assert node.lifecycle_state is LifecycleState.UNCONFIGURED
        node.configure()
        node.activate()
        node.deactivate()
        node.cleanup()
        assert node.lifecycle_state is LifecycleState.UNCONFIGURED


class TestPipelinedNode:
    def test_pipelined_lags_one_scan_and_tracks(self):
        """pipelined=True: handle_scan enqueues scan t and returns scan
        t-1's result (first call invalid); flush() harvests the tail.
        Estimates match the synchronous node's to f32 tolerance (same
        device programs, same keys)."""
        from beluga_tpu.io.config import AmclNodeConfig
        from beluga_tpu.node import AmclNode

        cfg = AmclNodeConfig(
            max_particles=300, min_particles=50,
            set_initial_pose=True, initial_pose_x=2.0, initial_pose_y=2.0,
        )
        sync_node = AmclNode(cfg)
        sync_node.set_map(small_world())
        pipe_node = AmclNode(cfg, pipelined=True)
        pipe_node.set_map(small_world())

        odoms = [(0.0, 0.0, 0.0), (0.3, 0.0, 0.05), (0.65, 0.02, 0.1),
                 (1.0, 0.05, 0.12)]
        sync_res = [
            sync_node.handle_scan(o, scan_toward_wall()) for o in odoms
        ]
        pipe_res = [
            pipe_node.handle_scan(o, scan_toward_wall()) for o in odoms
        ]
        assert not pipe_res[0].valid  # nothing in flight yet
        tail = pipe_node.flush()
        chain = pipe_res[1:] + [tail]
        for s, p in zip(sync_res, chain):
            assert s.valid == p.valid
            if s.valid:
                np.testing.assert_allclose(s.pose, p.pose, atol=1e-5)
                np.testing.assert_allclose(
                    s.map_to_odom, p.map_to_odom, atol=1e-5
                )
        assert pipe_node.flush() is None
