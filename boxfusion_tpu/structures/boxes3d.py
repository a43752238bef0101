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
