"""Pallas fitness kernel vs the XLA reference path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxfusion_tpu.fusion import synthesize_pst
from boxfusion_tpu.fusion.kernel import multiview_fitness
from boxfusion_tpu.geometry.boxes import box_corners
from boxfusion_tpu.geometry.projection import project_corners_to_image


def _scene(V=5, seed=0):
    gt = np.array([0.2, -0.1, 0.3, 0.6, 0.4, 0.5], np.float32)
    K = np.array([[300.0, 0, 256], [0, 300.0, 192], [0, 0, 1]], np.float32)
    poses = []
    for i in range(V):
        ang = 0.4 * i
        eye = gt[:3] + np.array([3 * np.sin(ang), 0.3, -3 * np.cos(ang)])
        fwd = gt[:3] - eye
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], 1)
        P[:3, 3] = eye
        poses.append(P)
    poses = np.stack(poses)
    corners = box_corners(jnp.asarray(gt[None]), jnp.eye(3)[None])[0]
    obs = np.asarray(
        project_corners_to_image(
            jnp.broadcast_to(corners[None], (V, 8, 3)), jnp.asarray(poses), jnp.asarray(K),
            384.0, 512.0,
        )
    )
    return gt, K, poses, obs


@pytest.mark.parametrize("pst_size", [128, 256])
def test_pallas_fitness_matches_xla(pst_size):
    gt, K, poses, obs = _scene(V=5)
    pst = synthesize_pst(pst_size)
    vmask = np.ones(5, np.float32)
    vmask[4] = 0.0  # one masked view slot

    args = (
        jnp.asarray(gt + np.array([0.05, -0.04, 0.02, 0.1, -0.08, 0.06], np.float32)),
        jnp.eye(3),
        jnp.asarray(pst),
        jnp.asarray(np.full(6, 0.1, np.float32)),
        jnp.asarray(poses),
        jnp.asarray(obs),
        jnp.asarray(vmask),
        jnp.asarray(K),
        jnp.float32(384.0),
        jnp.float32(512.0),
    )
    want = np.asarray(jax.jit(lambda *a: multiview_fitness(*a, impl="xla"))(*args))
    got = np.asarray(jax.jit(lambda *a: multiview_fitness(*a, impl="pallas"))(*args))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # particle 0 (identity) fitness must be small but nonzero given the offset
    assert got[0] > 1e-3


def test_pallas_fitness_degenerate_views():
    """Padded view slots (identity poses, zero observed corners) stay finite."""
    gt, K, poses, obs = _scene(V=3)
    V = 6
    poses_pad = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    poses_pad[:3] = poses
    obs_pad = np.zeros((V, 8, 2), np.float32)
    obs_pad[:3] = obs
    vmask = np.zeros(V, np.float32)
    vmask[:3] = 1.0
    pst = synthesize_pst(128)

    args = (
        jnp.asarray(gt),
        jnp.eye(3),
        jnp.asarray(pst),
        jnp.asarray(np.full(6, 0.1, np.float32)),
        jnp.asarray(poses_pad),
        jnp.asarray(obs_pad),
        jnp.asarray(vmask),
        jnp.asarray(K),
        jnp.float32(384.0),
        jnp.float32(512.0),
    )
    got = np.asarray(jax.jit(lambda *a: multiview_fitness(*a, impl="pallas"))(*args))
    want = np.asarray(jax.jit(lambda *a: multiview_fitness(*a, impl="xla"))(*args))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    assert got[0] == pytest.approx(0.0, abs=1e-4)  # identity particle on GT
