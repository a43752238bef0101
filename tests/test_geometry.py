"""Golden-value tests for the geometry core.

Oracles are independent numpy/scipy implementations mirroring the reference
semantics (cited per test), not the jnp code under test.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation
from scipy.spatial import ConvexHull

from boxfusion_tpu.geometry import (
    euler_angles_to_matrix,
    rotation_3d_in_axis,
    box_corners,
    boxes_to_world,
    yaw_box_corners,
    project_corners_to_image,
    project_boxes_to_2d,
    unproject_depth,
    iou_2d,
    obb_grid_iou,
    obb_intersect_mask,
    pairwise_obb_iou,
)
from boxfusion_tpu.geometry.orientation import (
    ImageOrientation,
    get_orientation,
    rotate_K,
    rotate_pose,
    get_camera_to_gravity_transform,
)

RNG = np.random.default_rng(0)


def random_rotations(n):
    return Rotation.random(n, random_state=42).as_matrix().astype(np.float32)


class TestRotation:
    def test_euler_matches_scipy_intrinsic(self):
        # PyTorch3D-style euler (reference transforms.py:34-60) composes
        # R = R(c0, a0) @ R(c1, a1) @ R(c2, a2) == scipy intrinsic convention.
        angles = RNG.uniform(-np.pi, np.pi, size=(16, 3)).astype(np.float32)
        for conv in ["YXZ", "XYZ", "ZYX"]:
            got = np.asarray(euler_angles_to_matrix(jnp.asarray(angles), conv))
            want = Rotation.from_euler(conv, angles).as_matrix()
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_axis_rotation_z(self):
        # p' rows rotated about z by angle (reference boxes.py:20-112 axis=2).
        pts = RNG.normal(size=(4, 5, 3)).astype(np.float32)
        ang = RNG.uniform(-np.pi, np.pi, size=(4,)).astype(np.float32)
        got = np.asarray(rotation_3d_in_axis(jnp.asarray(pts), jnp.asarray(ang), axis=2))
        for i in range(4):
            Rz = Rotation.from_euler("z", ang[i]).as_matrix()
            want = pts[i] @ Rz.T
            np.testing.assert_allclose(got[i], want, atol=1e-5)


class TestCorners:
    def test_template_layout(self):
        # Axis-aligned box: l on X, h on Y, w on Z (reference boxes.py:736-778).
        xyzlhw = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0]])
        R = jnp.eye(3)[None]
        c = np.asarray(box_corners(xyzlhw, R))[0]
        np.testing.assert_allclose(c[0], [0.0, 0.0, 0.0], atol=1e-6)  # -l/2,-h/2,-w/2
        np.testing.assert_allclose(c[6], [2.0, 4.0, 6.0], atol=1e-6)  # +l/2,+h/2,+w/2
        np.testing.assert_allclose(c.mean(axis=0), [1.0, 2.0, 3.0], atol=1e-6)

    def test_rotated_corners_against_oracle(self):
        n = 8
        xyzlhw = np.concatenate(
            [RNG.normal(size=(n, 3)), RNG.uniform(0.2, 2.0, size=(n, 3))], axis=1
        ).astype(np.float32)
        R = random_rotations(n)
        got = np.asarray(box_corners(jnp.asarray(xyzlhw), jnp.asarray(R)))

        # Oracle: reference's verts tensor construction (boxes.py:754-778).
        signs = np.array(
            [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
             [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], dtype=np.float32)
        for i in range(n):
            local = signs * (xyzlhw[i, 3:] / 2)
            want = (R[i] @ local.T).T + xyzlhw[i, :3]
            np.testing.assert_allclose(got[i], want, atol=1e-5)

    def test_to_world(self):
        # center' = Rp c + t, R' = Rp R (reference boxes.py:825-833).
        xyzlhw = np.array([[1.0, 0.0, 0.0, 1.0, 1.0, 1.0]], np.float32)
        R = np.eye(3, dtype=np.float32)[None]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_euler("z", np.pi / 2).as_matrix()
        pose[:3, 3] = [0, 0, 5]
        nx, nr = boxes_to_world(jnp.asarray(xyzlhw), jnp.asarray(R), jnp.asarray(pose)[None])
        np.testing.assert_allclose(np.asarray(nx)[0, :3], [0, 1, 5], atol=1e-5)
        np.testing.assert_allclose(np.asarray(nr)[0], pose[:3, :3], atol=1e-6)

    def test_yaw_box_corners_matches_unit_cube(self):
        # DepthInstance3DBoxes corner order for the unit box used by the
        # gravity transform (capture_stream.py:68-69).
        b = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
        c = np.asarray(yaw_box_corners(b))[0]
        want = np.array(
            [[-0.5, -0.5, 0.0], [-0.5, -0.5, 1.0], [-0.5, 0.5, 1.0], [-0.5, 0.5, 0.0],
             [0.5, -0.5, 0.0], [0.5, -0.5, 1.0], [0.5, 0.5, 1.0], [0.5, 0.5, 0.0]])
        np.testing.assert_allclose(c, want, atol=1e-6)


class TestProjection:
    def _setup(self):
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_euler("y", 0.3).as_matrix()
        pose[:3, 3] = [0.2, -0.1, 0.5]
        return K, pose

    def test_project_corners(self):
        K, pose = self._setup()
        corners = RNG.normal(size=(3, 8, 3)).astype(np.float32) + np.array([0, 0, 3.0], np.float32)
        got = np.asarray(project_corners_to_image(
            jnp.asarray(corners), jnp.asarray(pose)[None], jnp.asarray(K), H=480, W=640))
        # Oracle mirrors instances.py:333-369.
        pinv = np.linalg.inv(pose)
        for i in range(3):
            ch = np.concatenate([corners[i], np.ones((8, 1), np.float32)], axis=1)
            cam = (pinv @ ch.T).T
            u = np.clip(K[0, 0] * cam[:, 0] / cam[:, 2] + K[0, 2], 0, 640)
            v = np.clip(K[1, 1] * cam[:, 1] / cam[:, 2] + K[1, 2], 0, 480)
            np.testing.assert_allclose(got[i], np.stack([u, v], axis=-1), atol=1e-2)

    def test_project_boxes_to_2d_behind_camera(self):
        K, _ = self._setup()
        pose = np.eye(4, dtype=np.float32)
        front = np.array([0.0, 0.0, 3.0], np.float32) + 0.3 * RNG.normal(size=(8, 3)).astype(np.float32)
        behind = front - np.array([0, 0, 10.0], np.float32)
        got = np.asarray(project_boxes_to_2d(
            jnp.asarray(np.stack([front, behind])), jnp.asarray(K), jnp.asarray(pose), H=480, W=640))
        assert got[0].max() > 0
        np.testing.assert_allclose(got[1], 0.0)  # no valid corner -> zero box

    def test_unproject_roundtrip(self):
        K, pose = self._setup()
        depth = np.full((24, 32), 2.0, np.float32)
        xyz, valid = unproject_depth(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(pose))
        xyz = np.asarray(xyz)
        assert np.asarray(valid).all()
        # Reproject: world -> cam -> pixels should equal the original grid.
        pinv = np.linalg.inv(pose)
        pt = xyz[10, 20]
        cam = pinv[:3, :3] @ pt + pinv[:3, 3]
        u = K[0, 0] * cam[0] / cam[2] + K[0, 2]
        v = K[1, 1] * cam[1] / cam[2] + K[1, 2]
        np.testing.assert_allclose([u, v], [20 * 2.0 / 2.0, 10.0], atol=1e-3)


def _oracle_obb_iou(c1, c2):
    """Numpy oracle mirroring instances.py:514-613 with scipy ConvexHull."""
    edges = [[0, 1], [0, 4], [1, 5], [4, 5], [2, 3], [2, 6], [6, 7], [3, 7],
             [0, 3], [4, 7], [1, 2], [5, 6]]

    def augment(c):
        mids = [(c[a] + c[b]) / 2 for a, b in edges]
        return np.vstack([c, mids])

    h1, h2 = ConvexHull(c1), ConvexHull(c2)
    a1, a2 = augment(c1), augment(c2)
    m1 = np.all(a1 @ h2.equations[:, :3].T + h2.equations[:, 3] <= 1e-6, axis=1)
    m2 = np.all(a2 @ h1.equations[:, :3].T + h1.equations[:, 3] <= 1e-6, axis=1)
    if m1.sum() + m2.sum() == 0:
        return 0.0
    allc = np.vstack([c1, c2])
    lo, hi = allc.min(0), allc.max(0)
    xs, ys, zs = (np.linspace(lo[k], hi[k], 25) for k in range(3))
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    in1 = np.all(pts @ h1.equations[:, :3].T + h1.equations[:, 3] <= 1e-6, axis=1)
    in2 = np.all(pts @ h2.equations[:, :3].T + h2.equations[:, 3] <= 1e-6, axis=1)
    common = (in1 & in2).sum()
    return common / (in1.sum() + in2.sum() - common + 1e-6)


def _make_box(center, lhw, R):
    signs = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], dtype=np.float64)
    return (R @ (signs * (np.asarray(lhw) / 2)).T).T + np.asarray(center)


class TestIoU:
    def test_iou_2d(self):
        a = jnp.asarray([0.0, 0.0, 2.0, 2.0])
        b = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [5.0, 5.0, 6.0, 6.0]])
        got = np.asarray(iou_2d(a, b))
        np.testing.assert_allclose(got, [1.0 / 7.0, 0.0], atol=1e-5)

    @pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
    def test_obb_iou_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        R1 = Rotation.random(random_state=seed).as_matrix()
        R2 = Rotation.random(random_state=seed + 100).as_matrix()
        c1 = _make_box(rng.normal(size=3) * 0.3, rng.uniform(0.5, 2.0, 3), R1)
        c2 = _make_box(rng.normal(size=3) * 0.3, rng.uniform(0.5, 2.0, 3), R2)
        want = _oracle_obb_iou(c1, c2)
        got = float(obb_grid_iou(jnp.asarray(c1, jnp.float32), jnp.asarray(c2, jnp.float32)))
        assert abs(got - want) < 2e-2, (got, want)

    def test_disjoint_is_zero(self):
        c1 = _make_box([0, 0, 0], [1, 1, 1], np.eye(3))
        c2 = _make_box([5, 0, 0], [1, 1, 1], np.eye(3))
        assert float(obb_grid_iou(jnp.asarray(c1, jnp.float32), jnp.asarray(c2, jnp.float32))) == 0.0
        assert not bool(obb_intersect_mask(jnp.asarray(c1, jnp.float32), jnp.asarray(c2, jnp.float32)))

    def test_plus_sign_gate_parity(self):
        # Two long thin boxes crossing: no vertex/midpoint containment, so both
        # the reference gate and ours report no intersection (known behavior).
        c1 = _make_box([0, 0, 0], [4.0, 0.2, 0.2], np.eye(3))
        c2 = _make_box([0, 0, 0], [0.2, 0.2, 4.0], np.eye(3))
        want = _oracle_obb_iou(c1, c2)
        got = float(obb_grid_iou(jnp.asarray(c1, jnp.float32), jnp.asarray(c2, jnp.float32)))
        # midpoint (0,0,0) of both boxes is contained, so the gate passes here.
        assert abs(got - want) < 2e-2

    def test_pairwise_matrix(self):
        boxes = []
        for i in range(5):
            R = Rotation.random(random_state=i).as_matrix()
            boxes.append(_make_box(np.array([i * 0.4, 0, 0]), [1, 1, 1], R))
        corners = jnp.asarray(np.stack(boxes), jnp.float32)
        mat = np.asarray(pairwise_obb_iou(corners))
        assert mat.shape == (5, 5)
        np.testing.assert_allclose(np.diag(mat), 0.0)
        for i in range(5):
            for j in range(5):
                if i != j:
                    want = _oracle_obb_iou(np.asarray(boxes[i]), np.asarray(boxes[j]))
                    assert abs(mat[i, j] - want) < 2e-2


class TestOrientation:
    def test_get_orientation_upright(self):
        pose = np.eye(4)
        pose[2, :3] = [0.0, -1.0, 0.0]
        assert get_orientation(pose[None]) == ImageOrientation.UPRIGHT

    def test_rotate_K_left(self):
        K = np.array([[[500.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]], np.float32)
        out = rotate_K(K, ImageOrientation.LEFT, (640, 480))
        # fx <-> fy swap, cx <- cy (reference orientation.py:63-68).
        assert out[0, 0, 0] == 600.0 and out[0, 1, 1] == 500.0
        assert out[0, 0, 2] == 240.0 and out[0, 1, 2] == 320.0

    def test_rotate_pose_inverse_of_rotz(self):
        pose = np.eye(4, dtype=np.float32)
        out = rotate_pose(pose, ImageOrientation.LEFT)
        want_r = Rotation.from_euler("z", np.pi / 2).as_matrix()
        np.testing.assert_allclose(out[:3, :3], np.linalg.inv(want_r), atol=1e-6)

    def test_gravity_transform_has_no_yaw(self):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_euler("xyz", [0.3, 0.1, 0.7]).as_matrix()
        T = get_camera_to_gravity_transform(pose, ImageOrientation.UPRIGHT)
        assert T.shape == (3, 3)
        np.testing.assert_allclose(T @ T.T, np.eye(3), atol=1e-5)
        # 'yxz' euler of T must have a (near) zero yaw-about-gravity component.
        ey = Rotation.from_matrix(T).as_euler("yxz")
        assert abs(ey[0]) < 1e-6


class TestGridIoUPairs:
    """The fused batched lattice (obb_grid_iou_pairs) vs the per-pair op."""

    def test_matches_scalar_version(self):
        import jax

        from boxfusion_tpu.geometry.iou import obb_grid_iou_pairs

        rng = np.random.RandomState(0)
        n = 64
        ca, cb = [], []
        for i in range(n):
            Ra = Rotation.random(random_state=i).as_matrix()
            Rb = Rotation.random(random_state=i + 500).as_matrix()
            c = rng.uniform(-1, 1, 3)
            ca.append(_make_box(c, rng.uniform(0.2, 1.0, 3), Ra))
            cb.append(_make_box(c + rng.uniform(-0.4, 0.4, 3), rng.uniform(0.2, 1.0, 3), Rb))
        ca = jnp.asarray(np.stack(ca), jnp.float32)
        cb = jnp.asarray(np.stack(cb), jnp.float32)

        scalar = jax.jit(jax.vmap(lambda a, b: obb_grid_iou(a, b)))(ca, cb)
        gate = jax.jit(jax.vmap(obb_intersect_mask))(ca, cb)
        batched = jax.jit(obb_grid_iou_pairs)(ca, cb) * gate
        # identical lattice + math; only borderline lattice points may flip
        np.testing.assert_allclose(np.asarray(batched), np.asarray(scalar), atol=1e-3)
        assert (np.asarray(scalar) > 0).sum() > 10  # the scene overlaps
