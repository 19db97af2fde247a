"""render_chunked == render, bit-exact, including an uneven last strip.

The full-resolution reference camera (2064x1544, ``config.yml:1-3``) OOMs a
single dispatch on one chip (the label passes materialize (P, N, 3) CSG
intermediates); ``render_chunked`` renders row strips by shifting the
principal point, which must reproduce the identical pixel rays.
"""
import jax.numpy as jnp
import numpy as np

from catgrasp_tpu.render import raymarch
from tests.test_render import _cam, _one_object_scene


def test_chunked_matches_single_pass():
    lib, state, params = _one_object_scene()
    H, W = 70, 64  # 70 = 2*32 + 6: exercises the padded/cropped last strip
    K = jnp.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1.0]])
    full = raymarch.render(lib, state, params, K, _cam(0.35), H, W)
    chk = raymarch.render_chunked(lib, state, params, K, _cam(0.35), H, W,
                                  rows_per_chunk=32)
    assert np.asarray(full["seg"] == 0).sum() > 30  # scene actually visible
    for k in full:
        np.testing.assert_array_equal(np.asarray(chk[k]), np.asarray(full[k]),
                                      err_msg=k)


def test_chunked_exact_multiple():
    lib, state, params = _one_object_scene()
    H, W = 64, 48
    K = jnp.array([[280.0, 0, W / 2], [0, 280.0, H / 2], [0, 0, 1.0]])
    full = raymarch.render(lib, state, params, K, _cam(0.35), H, W)
    chk = raymarch.render_chunked(lib, state, params, K, _cam(0.35), H, W,
                                  rows_per_chunk=16)
    for k in full:
        np.testing.assert_array_equal(np.asarray(chk[k]), np.asarray(full[k]),
                                      err_msg=k)
