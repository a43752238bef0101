"""Image orientation handling and gravity alignment (host-side numpy).

These run in the data pipeline (per-frame metadata, tiny math), so they are
plain numpy/scipy rather than jnp.

Parity targets:
  * ImageOrientation / ROT_Z / ROT_K tables (reference orientation.py:10-41)
  * get_orientation (orientation.py:43-57), rotate_K (59-82), rotate_pose (84-89)
  * get_camera_to_gravity_transform (reference capture_stream.py:62-82)
  * first-camera upright handling (capture_stream.py:84-114)
"""
from __future__ import annotations

import enum

import numpy as np
from scipy.spatial.transform import Rotation


class ImageOrientation(enum.Enum):
    UPRIGHT = 0
    LEFT = 1
    UPSIDE_DOWN = 2
    RIGHT = 3
    ORIGINAL = 4


def _rot_z(angle: float) -> np.ndarray:
    return Rotation.from_euler("z", angle).as_matrix().astype(np.float32)


ROT_Z = {
    (ImageOrientation.UPRIGHT, ImageOrientation.UPRIGHT): _rot_z(0.0),
    (ImageOrientation.LEFT, ImageOrientation.UPRIGHT): _rot_z(np.pi / 2),
    (ImageOrientation.UPSIDE_DOWN, ImageOrientation.UPRIGHT): _rot_z(np.pi),
    (ImageOrientation.RIGHT, ImageOrientation.UPRIGHT): _rot_z(-np.pi / 2),
    (ImageOrientation.UPRIGHT, ImageOrientation.LEFT): _rot_z(-np.pi / 2),
    (ImageOrientation.UPRIGHT, ImageOrientation.UPSIDE_DOWN): _rot_z(-np.pi),
    (ImageOrientation.UPRIGHT, ImageOrientation.RIGHT): _rot_z(np.pi / 2),
}

ROT_K = {
    (ImageOrientation.UPRIGHT, ImageOrientation.UPRIGHT): 0,
    (ImageOrientation.LEFT, ImageOrientation.UPRIGHT): -1,
    (ImageOrientation.UPSIDE_DOWN, ImageOrientation.UPRIGHT): 2,
    (ImageOrientation.RIGHT, ImageOrientation.UPRIGHT): 1,
    (ImageOrientation.UPRIGHT, ImageOrientation.LEFT): 1,
    (ImageOrientation.UPRIGHT, ImageOrientation.UPSIDE_DOWN): -2,
    (ImageOrientation.UPRIGHT, ImageOrientation.RIGHT): -1,
}

_Z_ORIENTATIONS = np.array(
    [
        [0.0, -1.0, 0.0],  # upright
        [-1.0, 0.0, 0.0],  # left
        [0.0, 1.0, 0.0],   # upside-down
        [1.0, 0.0, 0.0],   # right
    ],
    dtype=np.float64,
)


def get_orientation(pose: np.ndarray) -> ImageOrientation:
    """Infer image orientation from the pose's z row (orientation.py:43-57)."""
    z_vec = np.asarray(pose)[..., 2, :3].reshape(-1, 3)
    corr = z_vec @ _Z_ORIENTATIONS.T
    # majority vote across frames (sensor.py:171-187); single frame -> argmax.
    idx = np.argmax(corr, axis=-1)
    vals, counts = np.unique(idx, return_counts=True)
    return ImageOrientation(int(vals[np.argmax(counts)]))


def check_first_camera(pose: np.ndarray) -> bool:
    """Detect a ceiling-facing first camera (capture_stream.py:84-99)."""
    z_vec = np.asarray(pose)[..., 2, :3].reshape(-1, 3)
    z_orien = np.concatenate([_Z_ORIENTATIONS, np.array([[0.0, 0.0, 1.0]])], axis=0)
    corr = z_vec @ z_orien.T
    return bool(np.argmax(corr[-1]) == 4)


def first_camera_to_upright(pose: np.ndarray) -> np.ndarray:
    """Pre-rotate poses so a ceiling-facing first camera counts as upright."""
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = Rotation.from_euler("x", -np.pi / 2.0).as_matrix()
    return rot @ pose


def revert_first_camera(pose: np.ndarray) -> np.ndarray:
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = Rotation.from_euler("x", -np.pi / 2.0).as_matrix()
    return np.linalg.inv(rot) @ pose


def rotate_pose(pose: np.ndarray, current: ImageOrientation,
                target: ImageOrientation = ImageOrientation.UPRIGHT) -> np.ndarray:
    """pose @ inv(Rz) (orientation.py:84-89)."""
    rot4 = np.eye(4, dtype=np.float32)
    rot4[:3, :3] = ROT_Z[(current, target)]
    return np.asarray(pose, dtype=np.float32) @ np.linalg.inv(rot4)


def rotate_K(K: np.ndarray, current: ImageOrientation, image_size,
             target: ImageOrientation = ImageOrientation.UPRIGHT) -> np.ndarray:
    """Intrinsics under 90-degree image rotations (orientation.py:59-82).

    K is (..., 3, 3); image_size is (W, H) of the *current* image.
    """
    K = np.asarray(K, dtype=np.float32)
    pair = (current, target)
    if pair == (ImageOrientation.UPRIGHT, ImageOrientation.UPRIGHT):
        return K.copy()
    if pair in (
        (ImageOrientation.LEFT, ImageOrientation.UPRIGHT),
        (ImageOrientation.UPRIGHT, ImageOrientation.RIGHT),
        (ImageOrientation.RIGHT, ImageOrientation.UPRIGHT),
        (ImageOrientation.UPRIGHT, ImageOrientation.LEFT),
    ):
        out = K.copy()
        out[..., 0, 0] = K[..., 1, 1]
        out[..., 0, 1] = K[..., 0, 1]
        out[..., 0, 2] = K[..., 1, 2]
        out[..., 1, 0] = K[..., 1, 0]
        out[..., 1, 1] = K[..., 0, 0]
        out[..., 1, 2] = K[..., 0, 2]
        return out
    if pair in (
        (ImageOrientation.UPSIDE_DOWN, ImageOrientation.UPRIGHT),
        (ImageOrientation.UPRIGHT, ImageOrientation.UPSIDE_DOWN),
    ):
        out = K.copy()
        out[..., 0, 2] = image_size[0] - K[..., 0, 2]
        out[..., 1, 2] = image_size[1] - K[..., 1, 2]
        return out
    raise ValueError(f"unknown orientation pair {pair}")


def rotate_image(arr: np.ndarray, current: ImageOrientation,
                 target: ImageOrientation = ImageOrientation.UPRIGHT) -> np.ndarray:
    """rot90 on the trailing (H, W) dims (orientation.py:95-96)."""
    return np.rot90(arr, ROT_K[(current, target)], axes=(-2, -1))


# Unit-box corners in the permuted order used by the gravity transform
# (capture_stream.py:68-69): DepthInstance3DBoxes([[0,0,0,1,1,1,0]]).corners
# reordered by [1, 5, 4, 0, 2, 6, 7, 3].
_FAKE_CORNERS = np.array(
    [
        [-0.5, -0.5, 1.0],
        [0.5, -0.5, 1.0],
        [0.5, -0.5, 0.0],
        [-0.5, -0.5, 0.0],
        [-0.5, 0.5, 1.0],
        [0.5, 0.5, 1.0],
        [0.5, 0.5, 0.0],
        [-0.5, 0.5, 0.0],
    ],
    dtype=np.float64,
)


def get_camera_to_gravity_transform(
    pose: np.ndarray,
    current: ImageOrientation,
    target: ImageOrientation = ImageOrientation.UPRIGHT,
) -> np.ndarray:
    """Rotation applied to model-predicted poses to gravity-align them.

    Re-derivation of capture_stream.py:62-82: transform a canonical unit box
    into the (orientation-corrected) camera frame, build an orthonormal basis
    from its edges, strip the yaw-about-gravity component via a 'yxz' euler
    decomposition, and keep only the x/z (pitch/roll) part.

    Args:
      pose: (4, 4) camera-to-world.

    Returns:
      (3, 3) float32 T_gravity.
    """
    rot4 = np.eye(4, dtype=np.float64)
    rot4[:3, :3] = ROT_Z[(current, target)]
    pose = np.asarray(pose, dtype=np.float64) @ np.linalg.inv(rot4)

    corners_h = np.concatenate([_FAKE_CORNERS, np.ones((8, 1))], axis=-1)
    cam = (np.linalg.inv(pose) @ corners_h.T).T[:, :3]

    def _unit(v):
        return v / np.linalg.norm(v)

    basis = np.stack(
        [_unit(cam[1] - cam[0]), _unit(cam[3] - cam[0]), _unit(cam[4] - cam[0])],
        axis=0,
    ).T  # columns are the box's edge directions in camera frame

    euler = Rotation.from_matrix(basis).as_euler("yxz")
    T = Rotation.from_euler("xz", euler[1:]).as_matrix()
    return T.astype(np.float32)
