"""BundleAdjuster facade tests mirroring reference test_bundle.py behaviors.

Each test reproduces a reference pybundle test's setup and assertions
(/root/reference/opensfm/test/test_bundle.py): pair/scale-sharing (:181,
:319), four-cams single/double reconstruction (:376, :436), one fixed
(:530), linear motion position/rotation (:620, :648), heatmap priors
(:763), plus common-position and relative-rotation behaviors.
"""

import numpy as np
import pytest

from opensfm_tpu.ba.adjuster import BundleAdjuster, RelativeMotion, RelativeRotation
from opensfm_tpu.geometry.cameras import Camera
from opensfm_tpu.geometry.pose import Pose


@pytest.fixture
def ba() -> BundleAdjuster:
    sa = BundleAdjuster()
    camera = Camera.create_perspective(1.0, 0.0, 0.0)
    sa.add_camera("cam1", camera, camera, True)
    sa.add_rig_camera("rig_cam1", Pose(), Pose(), True)
    return sa


def create_shots(sa: BundleAdjuster, num_shots: int) -> None:
    for i in range(num_shots):
        iid = str(i + 1)
        sa.add_rig_instance(
            iid, Pose(np.zeros(3), np.zeros(3)), {iid: "cam1"}, {iid: "rig_cam1"},
            False,
        )


def test_singleton(ba) -> None:
    """Position prior moves the single shot origin (test_bundle.py:46)."""
    sa = ba
    sa.add_rig_instance(
        "1", Pose(np.array([0.5, 0, 0]), np.zeros(3)), {"1": "cam1"},
        {"1": "rig_cam1"}, False,
    )
    sa.add_rig_instance_position_prior("1", np.array([1.0, 0, 0]), np.ones(3), "")
    sa.add_absolute_up_vector("1", np.array([0, -1, 0]), 1)
    sa.run()
    s1 = sa.get_rig_instance_pose("1")
    assert np.allclose(s1.get_origin(), [1, 0, 0], atol=1e-6)


def test_pair(ba) -> None:
    """Two rigs, shared scale (test_bundle.py:181)."""
    sa = ba
    create_shots(sa, 2)
    sa.add_reconstruction("12", False)
    sa.add_reconstruction_instance("12", 4, "1")
    sa.add_reconstruction_instance("12", 4, "2")
    sa.set_scale_sharing("12", True)
    sa.add_relative_motion(
        RelativeMotion("1", "2", np.zeros(3), np.array([-1.0, 0, 0]), 1, 1, False)
    )
    sa.add_rig_instance_position_prior("1", np.zeros(3), np.ones(3), "")
    sa.add_rig_instance_position_prior("2", np.array([2.0, 0, 0]), np.ones(3), "")
    sa.run()
    s1 = sa.get_rig_instance_pose("1")
    s2 = sa.get_rig_instance_pose("2")
    r12 = sa.get_reconstruction("12")
    assert np.allclose(s1.translation, [0, 0, 0], atol=1e-6)
    assert np.allclose(s2.translation, [-2, 0, 0], atol=1e-6)
    assert np.allclose(r12.get_scale("1"), 0.5)
    assert np.allclose(r12.get_scale("2"), 0.5)


def test_pair_non_rigid(ba) -> None:
    """Two rigs, per-instance scales (test_bundle.py:319)."""
    sa = ba
    create_shots(sa, 2)
    sa.add_reconstruction("12", False)
    sa.add_reconstruction_instance("12", 4, "1")
    sa.add_reconstruction_instance("12", 4, "2")
    sa.set_scale_sharing("12", False)
    sa.add_relative_motion(
        RelativeMotion("1", "2", np.zeros(3), np.array([-1.0, 0, 0]), 1, 1, False)
    )
    sa.add_rig_instance_position_prior("1", np.zeros(3), np.ones(3), "")
    sa.add_rig_instance_position_prior("2", np.array([2.0, 0, 0]), np.ones(3), "")
    sa.run()
    s1 = sa.get_rig_instance_pose("1")
    s2 = sa.get_rig_instance_pose("2")
    r12 = sa.get_reconstruction("12")
    assert np.allclose(s1.translation, [0, 0, 0], atol=1e-6)
    assert np.allclose(s2.translation, [-2, 0, 0], atol=1e-6)
    assert np.allclose(r12.get_scale("1"), 4.0)
    assert np.allclose(r12.get_scale("2"), 0.5)


def test_four_cams_single_reconstruction(ba) -> None:
    """Four rigs, one shared-scale reconstruction (test_bundle.py:376)."""
    sa = ba
    create_shots(sa, 4)
    sa.add_reconstruction("1234", False)
    for iid in "1234":
        sa.add_reconstruction_instance("1234", 1, iid)
    sa.set_scale_sharing("1234", True)
    sa.add_relative_motion(
        RelativeMotion("1", "2", np.zeros(3), np.array([-1.0, 0, 0]), 1, 1, False)
    )
    sa.add_relative_motion(
        RelativeMotion("1", "3", np.zeros(3), np.array([0, -1.0, 0]), 1, 1, False)
    )
    sa.add_relative_motion(
        RelativeMotion("1", "4", np.zeros(3), np.array([0, 0, -1.0]), 1, 1, False)
    )
    sa.add_rig_instance_position_prior("1", np.zeros(3), np.ones(3), "")
    sa.add_rig_instance_position_prior("2", np.array([2.0, 0, 0]), np.ones(3), "")
    sa.add_rig_instance_position_prior("3", np.array([0, 2.0, 0]), np.ones(3), "")
    sa.run()
    assert np.allclose(sa.get_rig_instance_pose("1").translation, [0, 0, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("2").translation, [-2, 0, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("3").translation, [0, -2, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("4").translation, [0, 0, -2], atol=1e-6)


def test_four_cams_one_fixed(ba) -> None:
    """Four rigs, first fixed, GPS pulls a conflicting prior on shot 1
    (test_bundle.py:530-618)."""
    sa = ba
    for i in range(4):
        iid = str(i + 1)
        sa.add_rig_instance(
            iid, Pose(np.zeros(3), np.zeros(3)), {iid: "cam1"}, {iid: "rig_cam1"},
            i == 0,
        )
    sa.add_reconstruction("1234", False)
    for iid in "1234":
        sa.add_reconstruction_instance("1234", 1, iid)
    sa.set_scale_sharing("1234", True)
    sa.add_relative_motion(
        RelativeMotion("1", "2", np.zeros(3), np.array([-1.0, 0, 0]), 1, 1, False)
    )
    sa.add_relative_motion(
        RelativeMotion("1", "3", np.zeros(3), np.array([0, -1.0, 0]), 1, 1, False)
    )
    sa.add_relative_motion(
        RelativeMotion("1", "4", np.zeros(3), np.array([0, 0, -1.0]), 1, 1, False)
    )
    sa.add_rig_instance_position_prior("1", np.array([100.0, 0, 0]), np.ones(3), "")
    sa.add_rig_instance_position_prior("2", np.array([2.0, 0, 0]), np.ones(3), "")
    sa.add_rig_instance_position_prior("3", np.array([0, 2.0, 0]), np.ones(3), "")
    sa.run()
    assert np.allclose(sa.get_rig_instance_pose("1").translation, [0, 0, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("2").translation, [-2, 0, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("3").translation, [0, -2, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("4").translation, [0, 0, -2], atol=1e-6)


def test_four_cams_double_reconstruction(ba) -> None:
    """Two reconstructions sharing relative motions with observed scales
    (test_bundle.py:436)."""
    sa = ba
    create_shots(sa, 4)
    sa.add_reconstruction("12", False)
    sa.add_reconstruction_instance("12", 1, "1")
    sa.add_reconstruction_instance("12", 1, "2")
    sa.set_scale_sharing("12", False)
    sa.add_reconstruction("34", False)
    sa.add_reconstruction_instance("34", 1, "3")
    sa.add_reconstruction_instance("34", 1, "4")
    sa.set_scale_sharing("34", False)
    sa.add_relative_motion(
        RelativeMotion("1", "2", np.zeros(3), np.array([-0.5, -0.5, -0.5]), 1, 1, True)
    )
    sa.add_relative_motion(
        RelativeMotion("3", "2", np.zeros(3), np.array([0.5, 0.5, 0.5]), 1, 1, False)
    )
    sa.add_relative_motion(
        RelativeMotion("3", "4", np.zeros(3), np.array([-2.0, -2, -2]), 1, 1, True)
    )
    sa.add_relative_motion(
        RelativeMotion("2", "3", np.zeros(3), np.array([-2.0, -2, -2]), 1, 1, False)
    )
    sa.add_rig_instance_position_prior("1", np.zeros(3), np.ones(3), "")
    sa.add_rig_instance_position_prior("4", np.array([3.0, 3, 3]), np.ones(3), "")
    sa.run()
    assert np.allclose(sa.get_rig_instance_pose("1").get_origin(), [0, 0, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("2").get_origin(), [1, 1, 1], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("3").get_origin(), [2, 2, 2], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("4").get_origin(), [3, 3, 3], atol=1e-6)
    r12 = sa.get_reconstruction("12")
    assert np.allclose(r12.get_scale("1"), 0.5)
    assert np.allclose(r12.get_scale("2"), 0.5)
    r34 = sa.get_reconstruction("34")
    assert np.allclose(r34.get_scale("3"), 2.0)
    assert np.allclose(r34.get_scale("4"), 2.0)


def test_linear_motion_prior_position(ba) -> None:
    """Middle shot interpolated by the linear motion prior
    (test_bundle.py:620)."""
    sa = ba
    create_shots(sa, 3)
    sa.add_reconstruction("123", False)
    for iid in "123":
        sa.add_reconstruction_instance("123", 1, iid)
    sa.set_scale_sharing("123", True)
    sa.add_rig_instance_position_prior("1", np.zeros(3), np.ones(3), "")
    sa.add_rig_instance_position_prior("3", np.array([2.0, 0, 0]), np.ones(3), "")
    sa.add_linear_motion("1", "2", "3", 0.5, 0.1, 0.1)
    sa.run()
    assert np.allclose(sa.get_rig_instance_pose("1").translation, [0, 0, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("2").translation, [-1, 0, 0], atol=1e-6)
    assert np.allclose(sa.get_rig_instance_pose("3").translation, [-2, 0, 0], atol=1e-6)


def test_linear_motion_prior_rotation(ba) -> None:
    """Middle shot rotation interpolated (test_bundle.py:648)."""
    sa = ba
    sa.add_rig_instance(
        "1", Pose(np.zeros(3), np.zeros(3)), {"1": "cam1"}, {"1": "rig_cam1"}, True
    )
    sa.add_rig_instance(
        "2", Pose(np.zeros(3), np.zeros(3)), {"2": "cam1"}, {"2": "rig_cam1"}, False
    )
    sa.add_rig_instance(
        "3", Pose(np.array([0, 1.0, 0]), np.zeros(3)), {"3": "cam1"},
        {"3": "rig_cam1"}, True,
    )
    sa.add_reconstruction("123", False)
    for iid in "123":
        sa.add_reconstruction_instance("123", 1, iid)
    sa.set_scale_sharing("123", True)
    sa.add_linear_motion("1", "2", "3", 0.3, 0.1, 0.1)
    sa.run()
    s2 = sa.get_rig_instance_pose("2")
    assert np.allclose(s2.rotation, [0, 0.3, 0], atol=1e-6)


def test_heatmaps_position(ba) -> None:
    """Same heatmap, three offsets (test_bundle.py:763)."""
    sa = ba
    for i in range(3):
        iid = str(i + 1)
        sa.add_rig_instance(
            iid, Pose(np.zeros(3), np.zeros(3)), {iid: "cam1"}, {iid: "rig_cam1"},
            False,
        )
    sa.add_reconstruction("123", True)
    for iid in "123":
        sa.add_reconstruction_instance("123", 1, iid)
    sa.set_scale_sharing("123", True)

    def bell_heatmap(size, r, mu_x, mu_y):
        sigma = r * 0.5
        x = np.linspace(-r, r, size)
        y = np.linspace(r, -r, size)
        x, y = np.meshgrid(x, y)
        z = np.exp(-(((x - mu_x) ** 2 + (y - mu_y) ** 2) / (2 * sigma**2)))
        z /= z.max()
        return 1 - z

    hmap_x, hmap_y = 1, -1
    hmap_size, hmap_r = 101, 10
    res = 2 * hmap_r / (hmap_size - 1)
    hmap = bell_heatmap(hmap_size, hmap_r, hmap_x, hmap_y)
    sa.add_heatmap("hmap1", hmap.flatten().tolist(), hmap_size, res)
    offsets = [(2, 0), (0, 2), (-2, 0)]
    for iid, (ox, oy) in zip("123", offsets):
        sa.add_absolute_position_heatmap(iid, "hmap1", ox, oy, 1.0)
    sa.run()
    # The reference asserts on -translation, which equals the origin there
    # because its cam-to-world storage leaves rotation untouched by the
    # position-only cost; our world-to-cam storage can move rotation along
    # the cost's gauge direction, so the invariant quantity is the origin.
    for iid, (ox, oy) in zip("123", offsets):
        o = sa.get_rig_instance_pose(iid).get_origin()
        assert np.allclose(o, [ox + hmap_x, oy + hmap_y, 0], atol=res)


def test_common_position(ba) -> None:
    """Common-position constraint pulls two shots together in z while the
    xy margin tolerates offsets (CommonPositionError semantics)."""
    sa = ba
    create_shots(sa, 2)
    sa.add_rig_instance_position_prior("1", np.array([0.0, 0, 1.0]), np.ones(3), "")
    sa.add_rig_instance_position_prior("2", np.array([0.2, 0, -1.0]), np.ones(3), "")
    sa.add_common_position("1", "2", 0.5, 0.01)
    sa.run()
    o1 = sa.get_rig_instance_pose("1").get_origin()
    o2 = sa.get_rig_instance_pose("2").get_origin()
    # z is pulled together hard; xy difference is inside the margin.
    assert abs(o1[2] - o2[2]) < 1e-2
    assert abs(o1[0] - o2[0]) <= 0.5 + 1e-6


def test_relative_rotation(ba) -> None:
    """Relative rotation constraint orients shot 2 (RelativeRotationError)."""
    sa = ba
    create_shots(sa, 2)
    sa._instances["1"]["fixed"] = True
    rr = RelativeRotation("1", "2", np.array([0.0, 0, 0.4]))
    sa.add_relative_rotation(rr)
    sa.add_rig_instance_position_prior("1", np.zeros(3), np.ones(3), "")
    sa.add_rig_instance_position_prior("2", np.ones(3), np.ones(3), "")
    sa.run()
    s2 = sa.get_rig_instance_pose("2")
    # Zero residual: R(Rij) R1_c2w^T R2_c2w = I with R1 = I gives
    # R2_c2w = R(-Rij), i.e. world-to-cam .rotation == +Rij (matching the
    # reference's returned Pose convention).
    assert np.allclose(s2.rotation, [0, 0, 0.4], atol=1e-5)


def test_gauge_fix(ba) -> None:
    """Gauge fix keeps the origin distance of two shots (TranslationPrior)."""
    sa = ba
    create_shots(sa, 2)
    sa._instances["2"]["pose"][3:] = [-1.0, 0, 0]  # origin at (1,0,0)
    sa.add_relative_motion(
        RelativeMotion("1", "2", np.zeros(3), np.array([-2.0, 0, 0]), 1, 1, False)
    )
    sa.add_reconstruction("12", False)
    sa.add_reconstruction_instance("12", 1, "1")
    sa.add_reconstruction_instance("12", 1, "2")
    sa.set_scale_sharing("12", True)
    sa.set_gauge_fix_shots("1", "2")
    sa.run()
    o1 = sa.get_rig_instance_pose("1").get_origin()
    o2 = sa.get_rig_instance_pose("2").get_origin()
    assert abs(np.linalg.norm(o1 - o2) - 1.0) < 1e-4
