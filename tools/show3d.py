#!/usr/bin/env python
"""Interactive point-cloud viewer (role of reference visualizer/
show3d_balls.py + render_balls_so.cpp, YBZh/Point-DAE).

Same user surface as the reference's keyboard loop:

  drag mouse      rotate (x/y angles follow cursor position)
  n / m / r       zoom in / zoom out / reset zoom
  t / p           color by ground truth / by prediction
  s               save the current frame to show3d.png
  q               close the viewer (returns last key)
  Q               hard-exit the process

Rendering goes through the framework's native z-buffered sphere-impostor
rasterizer (native/pointio.cpp:pdae_render_balls) — the same backend the
offline galleries use — instead of a second .so like the reference builds
with visualizer/build.sh.

Design: the viewer is a pure state machine. `ViewerState` holds the camera
+ color state, `handle_key`/`handle_mouse` are pure transitions, and
`render_frame` is a pure state -> image function; only `showpoints` touches
cv2. That makes the whole control surface testable headless
(tests/test_show3d.py drives synthetic key/mouse streams), which the
reference's module-global loop (show3d_balls.py:14-28,225-270) cannot do.
"""
from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from point_dae_tpu.data.native_io import render_balls  # noqa: E402


@dataclasses.dataclass
class ViewerState:
    """Camera + display state. mousex/mousey in [0, 1] window coordinates
    (0.5, 0.5 = rest pose), matching show3d_balls.py's globals."""
    mousex: float = 0.5
    mousey: float = 0.5
    zoom: float = 1.0
    color_source: str = "gt"        # 'gt' | 'pred' | 'white'
    changed: bool = True            # re-render needed
    save_requested: bool = False    # 's' pressed this tick
    quit: bool = False              # 'q' pressed
    hard_exit: bool = False         # 'Q' pressed

    @property
    def xangle(self) -> float:
        return (self.mousey - 0.5) * np.pi * 1.2

    @property
    def yangle(self) -> float:
        return (self.mousex - 0.5) * np.pi * 1.2


def handle_mouse(state: ViewerState, x: float, y: float,
                 showsz: int) -> ViewerState:
    """Mouse-move transition: cursor position -> rotation angles."""
    return dataclasses.replace(state, mousex=x / float(showsz),
                               mousey=y / float(showsz), changed=True)


def handle_key(state: ViewerState, cmd: int) -> ViewerState:
    """Keyboard transition — the reference's binding table
    (show3d_balls.py:231-268) expressed as one pure function."""
    s = dataclasses.replace(state, save_requested=False)
    if cmd == ord("q"):
        return dataclasses.replace(s, quit=True)
    if cmd == ord("Q"):
        return dataclasses.replace(s, quit=True, hard_exit=True)
    if cmd == ord("t"):
        return dataclasses.replace(s, color_source="gt", changed=True)
    if cmd == ord("p"):
        return dataclasses.replace(s, color_source="pred", changed=True)
    if cmd == ord("n"):
        return dataclasses.replace(s, zoom=s.zoom * 1.1, changed=True)
    if cmd == ord("m"):
        return dataclasses.replace(s, zoom=s.zoom / 1.1, changed=True)
    if cmd == ord("r"):
        return dataclasses.replace(s, zoom=1.0, changed=True)
    if cmd == ord("s"):
        return dataclasses.replace(s, save_requested=True)
    return s


def _rotation(state: ViewerState, freezerot: bool) -> np.ndarray:
    """Mouse-driven view rotation: Rx(xangle) then Ry(yangle), zoomed."""
    xa = 0.0 if freezerot else state.xangle
    ya = 0.0 if freezerot else state.yangle
    cx, sx = np.cos(xa), np.sin(xa)
    cy, sy = np.cos(ya), np.sin(ya)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], np.float64)
    ry = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]], np.float64)
    return (rx @ ry) * state.zoom


def _pick_colors(state: ViewerState, n: int, c_gt, c_pred,
                 normalizecolor: bool) -> np.ndarray:
    """Resolve the active color source to an (N, 3) [0, 1] array. The
    reference tracks three separate c0/c1/c2 channel vectors and rescales
    each by its own max (show3d_balls.py:160-166); same math, vectorized."""
    src = {"gt": c_gt, "pred": c_pred, "white": None}[state.color_source]
    if src is None:
        return np.ones((n, 3), np.float32)
    c = np.asarray(src, np.float32).copy()
    if normalizecolor:
        c /= c.max(axis=0, keepdims=True) + 1e-14
    else:
        c = c / 255.0
    return np.clip(c, 0.0, 1.0)


def render_frame(xyz: np.ndarray, state: ViewerState, *, c_gt=None,
                 c_pred=None, showsz: int = 800, ballradius: int = 10,
                 background=(0, 0, 0), normalizecolor: bool = True,
                 freezerot: bool = False, magnify_blue: int = 0,
                 showrot: bool = False) -> np.ndarray:
    """Pure state -> (showsz, showsz, 3) uint8 frame.

    Geometry matches the reference viewer: cloud centered on its mean,
    scaled so max radius maps to showsz/2.2 pixels (show3d_balls.py:
    147-150), orthographic, mouse rotation about x then y."""
    pts = np.asarray(xyz, np.float32)[:, :3]
    pts = pts - pts.mean(axis=0)
    radius = float(np.linalg.norm(pts, axis=1).max()) + 1e-14
    view = pts @ _rotation(state, freezerot).T.astype(np.float32)
    colors = _pick_colors(state, len(pts), c_gt, c_pred, normalizecolor)
    img = render_balls(view, colors, h=showsz, w=showsz,
                       radius=float(ballradius),
                       scale=showsz / (radius * 2.2))
    frame = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    bg = np.asarray(background, np.uint8)
    frame[(frame == 0).all(axis=-1)] = bg
    if magnify_blue > 0:
        b = frame[:, :, 2]
        for axis in (0, 1):
            b = np.maximum(b, np.roll(b, 1, axis=axis))
            if magnify_blue >= 2:
                b = np.maximum(b, np.roll(b, -1, axis=axis))
        frame[:, :, 2] = b
    if showrot:
        import cv2
        xa = 0.0 if freezerot else state.xangle
        ya = 0.0 if freezerot else state.yangle
        for i, line in enumerate([f"xangle {int(np.degrees(xa))}",
                                  f"yangle {int(np.degrees(ya))}",
                                  f"zoom {int(state.zoom * 100)}%"]):
            cv2.putText(frame, line, (30, showsz - 30 - 20 * i), 0, 0.5,
                        (255, 0, 0))
    return frame


def run_viewer(xyz, *, c_gt=None, c_pred=None, waittime: int = 0,
               key_source=None, on_frame=None, save_path: str = "show3d.png",
               **frame_kw) -> int:
    """The event loop, display-agnostic: `key_source()` yields key codes
    (-1 = no key), `on_frame(frame)` presents each rendered frame. Returns
    the last key code, like the reference's showpoints."""
    state = ViewerState()
    frame = None
    cmd = -1
    while True:
        if state.changed or frame is None:
            frame = render_frame(xyz, state, c_gt=c_gt, c_pred=c_pred,
                                 **frame_kw)
            state = dataclasses.replace(state, changed=False)
        if on_frame is not None:
            on_frame(frame)
        cmd = key_source() % 256 if key_source is not None else -1 % 256
        state = handle_key(state, cmd)
        if state.save_requested:
            _save_png(save_path, frame)
        if state.hard_exit:
            sys.exit(0)
        if state.quit or waittime != 0:
            break
    return cmd


def _save_png(path: str, frame: np.ndarray) -> None:
    try:
        import cv2
        cv2.imwrite(path, frame[:, :, ::-1])  # RGB -> BGR for cv2
    except Exception:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(path, frame)


def showpoints(xyz, c_gt=None, c_pred=None, waittime: int = 0,
               showrot: bool = False, magnifyBlue: int = 0,
               freezerot: bool = False, background=(0, 0, 0),
               normalizecolor: bool = True, ballradius: int = 10,
               showsz: int = 800) -> int:
    """Drop-in for show3d_balls.showpoints: opens a cv2 window with mouse
    rotation + the reference's key bindings. Requires a display."""
    import cv2

    state_box = {"state": ViewerState()}

    def onmouse(event, x, y, flags, param):
        state_box["state"] = handle_mouse(state_box["state"], x, y, showsz)

    cv2.namedWindow("show3d")
    cv2.moveWindow("show3d", 0, 0)
    cv2.setMouseCallback("show3d", onmouse)

    frame_kw = dict(showsz=showsz, ballradius=ballradius,
                    background=background, normalizecolor=normalizecolor,
                    freezerot=freezerot, magnify_blue=magnifyBlue,
                    showrot=showrot)
    frame = [None]
    cmd = -1
    try:
        while True:
            st = state_box["state"]
            if st.changed or frame[0] is None:
                frame[0] = render_frame(xyz, st, c_gt=c_gt, c_pred=c_pred,
                                        **frame_kw)
                state_box["state"] = dataclasses.replace(st, changed=False)
            cv2.imshow("show3d", frame[0][:, :, ::-1])
            cmd = cv2.waitKey(waittime if waittime else 10) % 256
            st = handle_key(state_box["state"], cmd)
            state_box["state"] = st
            if st.save_requested:
                _save_png("show3d.png", frame[0])
            if st.hard_exit:
                sys.exit(0)
            if st.quit or waittime != 0:
                break
    finally:
        cv2.destroyWindow("show3d")
    return cmd


def _load_cloud(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".ply"):
        from point_dae_tpu.utils.pcviews import read_ply
        return read_ply(path)
    return np.loadtxt(path, dtype=np.float32)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("cloud", help=".npy/.ply/.txt point cloud (N,>=3)")
    p.add_argument("--ballradius", type=int, default=10)
    p.add_argument("--showsz", type=int, default=800)
    p.add_argument("--background", type=int, nargs=3, default=(0, 0, 0))
    p.add_argument("--save", default=None, metavar="PNG",
                   help="headless mode: render the rest pose to PNG + exit")
    args = p.parse_args(argv)

    data = _load_cloud(args.cloud)
    xyz = data[:, :3]
    c_gt = data[:, 3:6] if data.shape[1] >= 6 else None
    if args.save:
        frame = render_frame(xyz, ViewerState(), c_gt=c_gt,
                             showsz=args.showsz, ballradius=args.ballradius,
                             background=tuple(args.background))
        _save_png(args.save, frame)
        print(f"wrote {args.save}")
        return 0
    showpoints(xyz, c_gt=c_gt, showsz=args.showsz,
               ballradius=args.ballradius,
               background=tuple(args.background))
    return 0


if __name__ == "__main__":
    sys.exit(main())
