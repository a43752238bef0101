"""GeneralBoxes3D: oriented 3D boxes as an immutable pytree.

Capability target: ``GeneralInstance3DBoxes`` (reference
boxfusion/boxes.py:656-943) -- gravity-centered ``(N, 6)`` ``xyzlhw``
parameters plus explicit per-box rotation matrices ``R`` of shape
``(N, 3, 3)``.  All geometry is delegated to the pure-functional
``boxfusion_tpu.geometry`` kernels so the same math runs under
``jit``/``vmap`` on TPU.
"""
from __future__ import annotations

from typing import Iterable, List

import jax
import jax.numpy as jnp

from boxfusion_tpu.geometry.boxes import box_corners, boxes_to_world


class GeneralBoxes3D:
    """(N, 6) xyzlhw + (N, 3, 3) rotations; immutable, pytree-registered."""

    __slots__ = ("tensor", "R")

    def __init__(self, tensor: jnp.ndarray, R: jnp.ndarray):
        object.__setattr__(self, "tensor", tensor)
        object.__setattr__(self, "R", R)

    def __setattr__(self, *_):
        raise AttributeError("GeneralBoxes3D is immutable")

    def __len__(self) -> int:
        return int(self.tensor.shape[0])

    def __getitem__(self, item) -> "GeneralBoxes3D":
        if isinstance(item, int):
            item = slice(item, item + 1 if item != -1 else None)
        return GeneralBoxes3D(self.tensor[item], self.R[item])

    @property
    def gravity_center(self) -> jnp.ndarray:
        """(N, 3) box centers (reference boxes.py:700-706)."""
        return self.tensor[..., :3]

    @property
    def dims(self) -> jnp.ndarray:
        """(N, 3) box dims (l, h, w) (reference boxes.py:688-695)."""
        return self.tensor[..., 3:6]

    @property
    def volume(self) -> jnp.ndarray:
        return jnp.prod(self.dims, axis=-1)

    @property
    def corners(self) -> jnp.ndarray:
        """(N, 8, 3) world corners (reference boxes.py:726-778 layout)."""
        return box_corners(self.tensor, self.R)

    def transform2world(self, cam_pose: jnp.ndarray) -> "GeneralBoxes3D":
        """Camera frame -> world frame via (N, 4, 4) / (4, 4) poses.

        Matches ``GeneralInstance3DBoxes.transform2world`` (reference
        boxes.py:825-833) but returns a new object instead of mutating.
        """
        t, r = boxes_to_world(self.tensor, self.R, cam_pose)
        return GeneralBoxes3D(t, r)

    def translate(self, translation: jnp.ndarray) -> "GeneralBoxes3D":
        center = self.tensor[..., :3] + translation
        return GeneralBoxes3D(
            jnp.concatenate([center, self.tensor[..., 3:]], axis=-1), self.R
        )

    @staticmethod
    def cat(boxes_list: Iterable["GeneralBoxes3D"]) -> "GeneralBoxes3D":
        boxes_list = list(boxes_list)
        return GeneralBoxes3D(
            jnp.concatenate([b.tensor for b in boxes_list], axis=0),
            jnp.concatenate([b.R for b in boxes_list], axis=0),
        )

    def split(self, sizes) -> List["GeneralBoxes3D"]:
        out, start = [], 0
        for n in sizes:
            out.append(GeneralBoxes3D(self.tensor[start : start + n], self.R[start : start + n]))
            start += n
        return out

    def clone(self) -> "GeneralBoxes3D":
        return GeneralBoxes3D(self.tensor, self.R)

    def __repr__(self):
        return f"GeneralBoxes3D(n={self.tensor.shape[0]})"


jax.tree_util.register_pytree_node(
    GeneralBoxes3D,
    lambda b: ((b.tensor, b.R), None),
    lambda _, leaves: GeneralBoxes3D(*leaves),
)


class DepthBoxes:
    """Bottom-centered z-up yaw boxes: the reference's yaw-parameterized API.

    Capability target: ``DepthInstance3DBoxes`` and its ``BaseInstance3DBoxes``
    surface (reference boxes.py:115-510, 512-654): ``(N, 7)``
    ``[x, y, z, dx, dy, dz, yaw]`` rows, bottom-center origin (0.5, 0.5, 0),
    yaw about +z.  Immutable/functional: mutating reference methods
    (``rotate``/``translate``/``flip``/``scale``) return a NEW ``DepthBoxes``
    (the reference mutates in place and returns ``self``; callers there
    ``clone()`` first, so the functional form covers the same use).

    6-wide inputs gain a zero fake yaw with ``with_yaw=False``
    (boxes.py:164-172); non-default ``origin`` is normalized to bottom-center
    on construction (boxes.py:177-181).
    """

    __slots__ = ("tensor", "with_yaw")
    YAW_AXIS = 2  # boxes.py:513

    def __init__(self, tensor, with_yaw: bool = True,
                 origin=(0.5, 0.5, 0.0)):
        tensor = jnp.asarray(tensor, jnp.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, 7)
        if tensor.ndim != 2 or tensor.shape[-1] not in (6, 7):
            raise ValueError(f"DepthBoxes expects (N, 6|7), got {tensor.shape}")
        if tensor.shape[-1] == 6:
            tensor = jnp.concatenate(
                [tensor, jnp.zeros((tensor.shape[0], 1), tensor.dtype)], axis=-1
            )
            with_yaw = False
        if tuple(origin) != (0.5, 0.5, 0.0):
            dst = jnp.asarray([0.5, 0.5, 0.0])
            src = jnp.asarray(origin, jnp.float32)
            tensor = tensor.at[:, :3].add(tensor[:, 3:6] * (dst - src))
        object.__setattr__(self, "tensor", tensor)
        object.__setattr__(self, "with_yaw", bool(with_yaw))

    def __setattr__(self, *_):
        raise AttributeError("DepthBoxes is immutable")

    def _new(self, tensor) -> "DepthBoxes":
        return DepthBoxes(tensor, with_yaw=self.with_yaw)

    # -- properties (boxes.py:184-248, 514-543) -------------------------------
    def __len__(self) -> int:
        return self.tensor.shape[0]

    @property
    def shape(self):
        return self.tensor.shape

    @property
    def volume(self) -> jnp.ndarray:
        return self.tensor[:, 3] * self.tensor[:, 4] * self.tensor[:, 5]

    @property
    def dims(self) -> jnp.ndarray:
        return self.tensor[:, 3:6]

    @property
    def yaw(self) -> jnp.ndarray:
        return self.tensor[:, 6]

    @property
    def height(self) -> jnp.ndarray:
        return self.tensor[:, 5]

    @property
    def bottom_height(self) -> jnp.ndarray:
        return self.tensor[:, 2]

    @property
    def top_height(self) -> jnp.ndarray:
        return self.bottom_height + self.height

    @property
    def bottom_center(self) -> jnp.ndarray:
        return self.tensor[:, :3]

    center = bottom_center  # MMDet3D depth convention (boxes.py:229-233)

    @property
    def gravity_center(self) -> jnp.ndarray:
        bc = self.bottom_center
        return jnp.concatenate(
            [bc[:, :2], (bc[:, 2] + self.tensor[:, 5] * 0.5)[:, None]], axis=1
        )

    @property
    def corners(self) -> jnp.ndarray:
        from boxfusion_tpu.geometry.boxes import yaw_box_corners

        return yaw_box_corners(self.tensor)

    # -- transforms (boxes.py:282-291, 340-349, 545-654) ----------------------
    def rotate(self, angle) -> "DepthBoxes":
        """Rotate about +z by an angle or a 3x3 matrix (boxes.py:545-593).

        Matrix input follows the reference exactly: the matrix is used as
        ``rot_mat_T`` (centers right-multiply it) and the yaw increment is
        ``arctan2(R[0, 1], R[0, 0])``."""
        from boxfusion_tpu.geometry.rotation import rotation_3d_in_axis

        angle = jnp.asarray(angle, jnp.float32)
        if angle.ndim == 2:
            rot_mat_t = angle
            ang = jnp.arctan2(rot_mat_t[0, 1], rot_mat_t[0, 0])
            centers = jnp.matmul(
                self.tensor[:, :3], rot_mat_t, precision=jax.lax.Precision.HIGHEST
            )
        else:
            ang = angle
            n = self.tensor.shape[0]
            centers = rotation_3d_in_axis(
                self.tensor[:, None, :3], jnp.broadcast_to(ang, (n,)),
                axis=self.YAW_AXIS,
            )[:, 0]
            c, s = jnp.cos(ang), jnp.sin(ang)
            rot_mat_t = jnp.asarray([[c, s, 0], [-s, c, 0], [0, 0, 1]], jnp.float32)

        t = self.tensor.at[:, :3].set(centers)
        if self.with_yaw:
            t = t.at[:, 6].add(ang)
            return self._new(t)
        # axis-aligned boxes: refit the enclosing AABB after rotation
        # (boxes.py:580-590; note the reference rotates self.corners AFTER
        # the centers already moved -- replicated for parity)
        corners_rot = jnp.matmul(
            self._new(t).corners, rot_mat_t, precision=jax.lax.Precision.HIGHEST
        )
        new_x = corners_rot[..., 0].max(axis=1) - corners_rot[..., 0].min(axis=1)
        new_y = corners_rot[..., 1].max(axis=1) - corners_rot[..., 1].min(axis=1)
        t = t.at[:, 3].set(new_x).at[:, 4].set(new_y)
        return self._new(t)

    def translate(self, trans_vector) -> "DepthBoxes":
        return self._new(self.tensor.at[:, :3].add(jnp.asarray(trans_vector)))

    def scale(self, scale_factor: float) -> "DepthBoxes":
        return self._new(self.tensor.at[:, :6].multiply(scale_factor))

    def flip(self, bev_direction: str = "horizontal") -> "DepthBoxes":
        """BEV flip (boxes.py:595-620): horizontal negates x (yaw -> pi-yaw),
        vertical negates y (yaw -> -yaw)."""
        if bev_direction not in ("horizontal", "vertical"):
            raise ValueError(bev_direction)
        t = self.tensor
        if bev_direction == "horizontal":
            t = t.at[:, 0].multiply(-1.0)
            if self.with_yaw:
                t = t.at[:, 6].set(-t[:, 6] + jnp.pi)
        else:
            t = t.at[:, 1].multiply(-1.0)
            if self.with_yaw:
                t = t.at[:, 6].multiply(-1.0)
        return self._new(t)

    def enlarged_box(self, extra_width) -> "DepthBoxes":
        """Grow every side by extra_width (boxes.py:632-647)."""
        extra = jnp.asarray(extra_width, jnp.float32)
        t = self.tensor.at[:, 3:6].add(extra * 2.0)
        z_extra = extra[..., 2] if extra.ndim and extra.shape[-1] == 3 else extra
        t = t.at[:, 2].add(-z_extra)
        return self._new(t)

    # -- predicates (boxes.py:293-318, 351-371) -------------------------------
    def in_range_3d(self, box_range) -> jnp.ndarray:
        r = jnp.asarray(box_range)
        t = self.tensor
        return (
            (t[:, 0] > r[0]) & (t[:, 1] > r[1]) & (t[:, 2] > r[2])
            & (t[:, 0] < r[3]) & (t[:, 1] < r[4]) & (t[:, 2] < r[5])
        )

    def nonempty(self, threshold: float = 0.0) -> jnp.ndarray:
        d = self.tensor[:, 3:6]
        return (d[:, 0] > threshold) & (d[:, 1] > threshold) & (d[:, 2] > threshold)

    # -- container ops (boxes.py:373-398, 422-505) ----------------------------
    def __getitem__(self, item) -> "DepthBoxes":
        t = self.tensor[item]
        if t.ndim == 1:
            t = t[None]
        return self._new(t)

    @staticmethod
    def cat(boxes_list: Iterable["DepthBoxes"]) -> "DepthBoxes":
        boxes_list = list(boxes_list)
        return DepthBoxes(
            jnp.concatenate([b.tensor for b in boxes_list], axis=0),
            with_yaw=all(b.with_yaw for b in boxes_list),
        )

    def clone(self) -> "DepthBoxes":
        return self._new(self.tensor)

    def __repr__(self):
        return f"DepthBoxes(n={len(self)}, with_yaw={self.with_yaw})"


jax.tree_util.register_pytree_node(
    DepthBoxes,
    lambda b: ((b.tensor,), b.with_yaw),
    lambda aux, leaves: DepthBoxes(leaves[0], with_yaw=aux),
)
