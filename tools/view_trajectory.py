#!/usr/bin/env python3
"""Offline trajectory viewer (replaces the reference's PyBullet GUI replay).

Reads the trajectory.npz written by `python -m pfpn_tpu ... ` (no --train)
and renders a 3D stick-figure animation of the humanoid's link frames, with
the camera following the character root — the parity analog of the
reference's GUI camera follow (deepmimic.py:529-533) and mp4 state logging
(bullet_env.py:30-37) on a headless TPU rig.

Usage:
  python tools/view_trajectory.py log_.../trajectory.npz -o out.gif [--episode 0]
  python tools/view_trajectory.py log_.../trajectory.npz -o out.mp4   # cv2 encoder
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("-o", "--out", default="trajectory.gif")
    ap.add_argument("--episode", type=int, default=0)
    ap.add_argument("--stride", type=int, default=2)
    args = ap.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation, PillowWriter
    except ImportError:
        print("matplotlib is required for the offline viewer")
        return 1

    from pfpn_tpu.envs.assets import humanoid_tree

    data = np.load(args.npz, allow_pickle=True)
    pos = data["link_pos"][:, args.episode]      # (T, nl, 3)
    done = data["done"][:, args.episode]
    t_end = int(np.argmax(done)) + 1 if done.any() else pos.shape[0]
    pos = pos[: t_end : args.stride]

    tree = humanoid_tree()
    parents = tree.link_parent

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    def draw(i):
        ax.clear()
        p = pos[i]
        for l, par in enumerate(parents):
            if par >= 0:
                seg = np.stack([p[l], p[par]])
                # y-up -> matplotlib z-up
                ax.plot(seg[:, 0], seg[:, 2], seg[:, 1], "o-", color="#1f77b4",
                        markersize=3)
        # camera follow: window tracks the root link (reference
        # deepmimic.py:529-533 resets the GUI camera to the base each frame)
        c = p[0]
        ax.set_xlim(c[0] - 1, c[0] + 1)
        ax.set_ylim(c[2] - 1, c[2] + 1)
        ax.set_zlim(0, 2)
        ax.set_title(f"frame {i * args.stride}")

    if args.out.endswith(".mp4"):
        # cv2 mp4 writer (no ffmpeg binary in this image): rasterize each
        # matplotlib frame to RGB and encode at the real-time rate so the
        # clip plays at the same speed as the reference GUI (30 Hz / stride)
        import cv2

        fps = max(1, round(30 / args.stride))
        writer = None
        for i in range(len(pos)):
            draw(i)
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
            if writer is None:
                h, w = buf.shape[:2]
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            writer.write(cv2.cvtColor(buf, cv2.COLOR_RGB2BGR))
        writer.release()
    else:
        anim = FuncAnimation(fig, draw, frames=len(pos), interval=66)
        anim.save(args.out, writer=PillowWriter(fps=15))
    print(f"wrote {args.out} ({len(pos)} frames)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
