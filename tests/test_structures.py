"""Tests for Instances / GeneralBoxes3D / config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxfusion_tpu.structures import GeneralBoxes3D, Instances
from boxfusion_tpu.utils.config import load_config


def test_instances_basic():
    inst = Instances(scores=jnp.array([0.9, 0.5, 0.1]), labels=np.array([1, 2, 3]))
    assert len(inst) == 3
    assert inst.has("scores")
    sub = inst[jnp.array([True, False, True])]
    assert len(sub) == 2
    np.testing.assert_allclose(np.asarray(sub.scores), [0.9, 0.1])
    cat = Instances.cat([inst, inst])
    assert len(cat) == 6


def test_instances_immutable_and_pytree():
    inst = Instances(x=jnp.arange(4.0))
    with pytest.raises(AttributeError):
        inst.x = jnp.zeros(4)
    doubled = jax.tree.map(lambda v: v * 2, inst)
    np.testing.assert_allclose(np.asarray(doubled.x), [0, 2, 4, 6])

    @jax.jit
    def f(i):
        return i.set("y", i.x + 1)

    out = f(inst)
    np.testing.assert_allclose(np.asarray(out.y), [1, 2, 3, 4])


def test_instances_length_mismatch():
    with pytest.raises(ValueError):
        Instances(a=jnp.zeros(3), b=jnp.zeros(4))


def test_boxes3d_roundtrip():
    t = jnp.array([[1.0, 2.0, 3.0, 2.0, 1.0, 0.5]])
    R = jnp.eye(3)[None]
    b = GeneralBoxes3D(t, R)
    assert len(b) == 1
    c = np.asarray(b.corners[0])
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c.mean(axis=0), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.volume), [1.0], atol=1e-6)

    pose = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 0.0, 0.0]))[None]
    w = b.transform2world(pose)
    np.testing.assert_allclose(np.asarray(w.gravity_center), [[2, 2, 3]], atol=1e-6)


def test_config_defaults_and_unknown_keys(tmp_path):
    cfg = load_config("config/ca1m.yaml")
    assert cfg["box_fusion"]["iters"] == 20
    # cubicle-only keys defaulted:
    assert cfg["detection"]["class_sim_thres"] == 0.0
    assert cfg["box_fusion"]["clip_sim_coeff"] == 0.0

    bad = tmp_path / "bad.yaml"
    bad.write_text("detection:\n  scor_thresh: 0.2\n")
    with pytest.raises(KeyError):
        load_config(str(bad))
