"""Native (C++) mocap pipeline parity against the NumPy reference path."""

import numpy as np
import pytest

from pfpn_tpu.mocap import native
from pfpn_tpu.math.filters import so_fb_butter_lpf

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libpfpn_mocap.so not built (make -C csrc)"
)


def test_butterworth_parity():
    x = np.random.RandomState(0).randn(64, 5)
    np.testing.assert_allclose(
        native.butterworth_fb(x, 30.0, 6.0), so_fb_butter_lpf(x, 30.0, 6.0),
        atol=1e-12,
    )


def test_quat_velocity_parity():
    from pfpn_tpu.mocap.loader import _angular_vel_global, _angular_vel_local

    q = np.random.RandomState(1).randn(12, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    dts = np.full(12, 1.0 / 30.0)
    for local, fn in ((False, _angular_vel_global), (True, _angular_vel_local)):
        va = native.quat_velocities(q, dts, local)
        vb = np.array([fn(q[i], q[i + 1], dts[i]) for i in range(11)]
                      + [np.zeros(3)])
        vb[-1] = vb[-2]
        np.testing.assert_allclose(va, vb, atol=1e-12)


def test_loader_native_vs_numpy():
    """Full motion tables identical with the native pipeline on and off."""
    from pfpn_tpu.envs.assets import humanoid_tree
    from pfpn_tpu.mocap import loader

    tree = humanoid_tree()
    m_native = loader.load_motion(tree, "walk")
    orig = native.available
    native.available = lambda: False
    try:
        m_numpy = loader.load_motion(tree, "walk")
    finally:
        native.available = orig
    for field in ("base_pos", "base_quat", "base_lin", "base_ang",
                  "q_sph", "w_sph", "q_rev", "w_rev"):
        np.testing.assert_allclose(
            getattr(m_native, field), getattr(m_numpy, field), atol=1e-5,
            err_msg=field,
        )
