"""Headless tests of the interactive viewer's state machine + renderer
(tools/show3d.py), the re-design of reference visualizer/show3d_balls.py.
The cv2 window itself needs a display; everything else — key bindings,
mouse rotation, color-source toggling, zoom, save, frame rendering — is
pure and driven here with synthetic event streams."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from show3d import (ViewerState, handle_key, handle_mouse, render_frame,
                    run_viewer)  # noqa: E402


def _cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    return pts / np.linalg.norm(pts, axis=1, keepdims=True).max()


class TestKeyBindings:
    def test_quit(self):
        s = handle_key(ViewerState(), ord("q"))
        assert s.quit and not s.hard_exit

    def test_hard_exit(self):
        s = handle_key(ViewerState(), ord("Q"))
        assert s.quit and s.hard_exit

    def test_zoom_in_out_reset(self):
        s = ViewerState()
        s = handle_key(s, ord("n"))
        assert s.zoom == pytest.approx(1.1) and s.changed
        s = handle_key(s, ord("m"))
        assert s.zoom == pytest.approx(1.0)
        s = handle_key(handle_key(s, ord("m")), ord("r"))
        assert s.zoom == 1.0

    def test_color_toggle(self):
        s = handle_key(ViewerState(), ord("p"))
        assert s.color_source == "pred"
        s = handle_key(s, ord("t"))
        assert s.color_source == "gt"

    def test_save_is_one_tick(self):
        s = handle_key(ViewerState(), ord("s"))
        assert s.save_requested
        s = handle_key(s, ord("n"))
        assert not s.save_requested

    def test_unknown_key_noop(self):
        s0 = ViewerState(zoom=1.3, color_source="pred", changed=False)
        s = handle_key(s0, ord("z"))
        assert s == s0


class TestMouse:
    def test_center_is_rest_pose(self):
        s = handle_mouse(ViewerState(), 400, 400, showsz=800)
        assert s.xangle == pytest.approx(0.0)
        assert s.yangle == pytest.approx(0.0)

    def test_corner_angles(self):
        # show3d_balls.py:173-187 -> angle = (frac - 0.5) * pi * 1.2
        s = handle_mouse(ViewerState(), 800, 0, showsz=800)
        assert s.yangle == pytest.approx(0.5 * np.pi * 1.2)
        assert s.xangle == pytest.approx(-0.5 * np.pi * 1.2)
        assert s.changed


class TestRenderFrame:
    def test_shape_dtype(self):
        f = render_frame(_cloud(), ViewerState(), showsz=128, ballradius=3)
        assert f.shape == (128, 128, 3) and f.dtype == np.uint8
        assert f.max() > 0  # something was drawn

    def test_rotation_changes_frame(self):
        pts = _cloud()
        f0 = render_frame(pts, ViewerState(), showsz=128, ballradius=3)
        s = handle_mouse(ViewerState(), 100, 30, showsz=128)
        f1 = render_frame(pts, s, showsz=128, ballradius=3)
        assert (f0 != f1).any()

    def test_freezerot_ignores_mouse(self):
        pts = _cloud()
        s = handle_mouse(ViewerState(), 100, 30, showsz=128)
        f0 = render_frame(pts, ViewerState(), showsz=128, ballradius=3,
                          freezerot=True)
        f1 = render_frame(pts, s, showsz=128, ballradius=3, freezerot=True)
        assert (f0 == f1).all()

    def test_zoom_grows_footprint(self):
        pts = _cloud()
        drawn0 = (render_frame(pts, ViewerState(), showsz=128,
                               ballradius=2) > 0).any(-1).sum()
        big = ViewerState(zoom=1.5)
        drawn1 = (render_frame(pts, big, showsz=128,
                               ballradius=2) > 0).any(-1).sum()
        assert drawn1 > drawn0

    def test_background_fills_empty(self):
        f = render_frame(_cloud(8), ViewerState(), showsz=64, ballradius=1,
                         background=(255, 0, 0))
        corners = f[[0, 0, -1, -1], [0, -1, 0, -1]]
        assert (corners == np.array([255, 0, 0], np.uint8)).all()

    def test_color_sources(self):
        pts = _cloud(200)
        gt = np.tile([[1.0, 0.0, 0.0]], (200, 1)).astype(np.float32)
        pred = np.tile([[0.0, 0.0, 1.0]], (200, 1)).astype(np.float32)
        fg = render_frame(pts, ViewerState(color_source="gt"), c_gt=gt,
                          c_pred=pred, showsz=96, ballradius=3)
        fp = render_frame(pts, ViewerState(color_source="pred"), c_gt=gt,
                          c_pred=pred, showsz=96, ballradius=3)
        assert fg[..., 0].sum() > fg[..., 2].sum()   # gt view is red
        assert fp[..., 2].sum() > fp[..., 0].sum()   # pred view is blue

    def test_missing_colors_render_white(self):
        f = render_frame(_cloud(100), ViewerState(color_source="pred"),
                         showsz=96, ballradius=3)
        drawn = f[(f > 0).any(-1)]
        assert (drawn[:, 0] == drawn[:, 1]).all()
        assert (drawn[:, 1] == drawn[:, 2]).all()


class TestEventLoop:
    def test_scripted_session(self, tmp_path):
        """Drive a zoom-in, save, color-flip, quit session headless."""
        keys = iter([ord("n"), ord("s"), ord("p"), ord("q")])
        frames = []
        save = tmp_path / "shot.png"
        cmd = run_viewer(_cloud(), key_source=lambda: next(keys),
                         on_frame=frames.append, save_path=str(save),
                         showsz=96, ballradius=2)
        assert cmd == ord("q")
        assert save.exists() and save.stat().st_size > 0
        assert len(frames) >= 3

    def test_waittime_single_shot(self):
        """waittime != 0 renders exactly one frame then returns — the
        reference's non-blocking mode (show3d_balls.py:269-270)."""
        frames = []
        run_viewer(_cloud(), waittime=5, key_source=lambda: -1,
                   on_frame=frames.append, showsz=64, ballradius=2)
        assert len(frames) == 1

    def test_hard_exit_raises_systemexit(self):
        with pytest.raises(SystemExit):
            run_viewer(_cloud(), key_source=lambda: ord("Q"),
                       showsz=64, ballradius=2)


class TestCLI:
    def test_headless_save(self, tmp_path):
        from show3d import main
        cloud = tmp_path / "c.npy"
        np.save(cloud, _cloud(300))
        out = tmp_path / "o.png"
        assert main([str(cloud), "--save", str(out), "--showsz", "96"]) == 0
        assert out.exists() and out.stat().st_size > 0
