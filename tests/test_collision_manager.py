"""CollisionManager (my_cpp.CollisionManager analog) behavior tests."""
import numpy as np
import pytest

from catgrasp_tpu.geom.collision_manager import CollisionManager


def _box(half=0.05):
    h = half
    V = np.array([[x, y, z] for x in (-h, h) for y in (-h, h) for z in (-h, h)],
                 np.float32)
    F = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return V, F


def _T(t):
    T = np.eye(4)
    T[:3, 3] = t
    return T


def test_mesh_pair_apart_then_overlapping():
    V, F = _box()
    cm = CollisionManager()
    cm.register_mesh("a", V, F)
    cm.register_mesh("b", V, F, T=_T([0.3, 0, 0]))
    assert not cm.is_any_collision()
    assert cm.min_distance_pair("a", "b") > 0.1

    cm.set_transform("b", _T([0.06, 0, 0]))  # 4 cm overlap
    assert cm.in_collision("a", "b")
    assert cm.is_any_collision()
    assert cm.min_distance_pair("a", "b") < 0.0


def test_margin_semantics():
    V, F = _box()
    cm = CollisionManager()
    cm.register_mesh("a", V, F)
    cm.register_mesh("b", V, F, T=_T([0.104, 0, 0]))  # 4 mm gap
    assert not cm.in_collision("a", "b", margin=0.0)
    assert cm.in_collision("a", "b", margin=0.01)


def test_cloud_vs_mesh():
    V, F = _box()
    cm = CollisionManager()
    cm.register_mesh("a", V, F)
    cm.register_cloud("scan", np.array([[0.2, 0, 0], [0.3, 0, 0]], np.float32))
    assert not cm.is_any_collision()
    cm.set_transform("scan", _T([-0.19, 0, 0]))  # point lands inside the box
    assert cm.is_any_collision()


def test_cloud_pair_requires_mesh():
    cm = CollisionManager()
    cm.register_cloud("s1", np.zeros((4, 3), np.float32))
    cm.register_cloud("s2", np.zeros((4, 3), np.float32))
    assert not cm.is_any_collision()  # cloud-cloud pairs skipped
    with pytest.raises(ValueError):
        cm.min_distance_pair("s1", "s2")
