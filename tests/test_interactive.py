"""Interactive camera controller: the reference's exact input mapping
(Source/skeleton.cpp:300-361), testable without a display."""
import numpy as np

from uob_raytracer_tpu.interactive import CameraController


def test_mouse_motion_increments():
    c = CameraController()
    c.mouse_motion(100, -50)     # xrel=100 px, yrel=-50 px
    assert np.isclose(c.yaw, 100 * 0.0009)      # yaw += xrel * 0.0009
    assert np.isclose(c.pitch, 50 * 0.0009)     # pitch -= yrel * 0.0009


def test_key_increments():
    c = CameraController()
    assert c.key("Up") and np.isclose(c.pitch, -0.1)
    assert c.key("Down") and np.isclose(c.pitch, 0.0)
    assert c.key("Left") and np.isclose(c.yaw, 0.1)
    assert c.key("Right") and np.isclose(c.yaw, 0.0)
    assert c.key("i") and np.isclose(c.cam_z, -3.1)   # from -3.2
    assert c.key("o") and np.isclose(c.cam_z, -3.2)
    assert c.key("k") and np.isclose(c.cam_x, 0.1)
    assert c.key("j") and np.isclose(c.cam_x, 0.0)
    assert not c.key("w")        # unmapped (commented out in the reference)
    assert not c.quit
    assert c.key("Escape") and c.quit


def test_apply_moves_the_render(cornell):
    """The applied camera state changes the rendered image (a live loop
    re-rendering per input actually shows movement)."""
    import uob_raytracer_tpu as rt
    cfg = rt.RenderConfig(width=32, height=32, aa_x=1, aa_y=1,
                          shadow_samples=1, bounces=0)
    c = CameraController()
    base = np.asarray(rt.render(c.apply(cornell), cfg).image)
    c.key("Left")
    c.key("i")
    moved = np.asarray(rt.render(c.apply(cornell), cfg).image)
    assert float(np.abs(moved - base).max()) > 0.01
    assert np.isclose(float(c.apply(cornell).yaw), 0.1)
    assert np.isclose(float(c.apply(cornell).camera_pos[2]), -3.1)
