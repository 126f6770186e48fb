#!/usr/bin/env python3
"""Render learning curves (eval reward vs env samples) from results/*.log.

Parses the committed console logs — the durable training artifacts —
rather than the gitignored TensorBoard/JSONL dirs: [TRAIN] lines give the
step->samples mapping, [PERFORM] lines the deterministic-policy eval
reward; samples at eval steps are interpolated from the train mapping.

Outputs static SVGs under results/. Usage: python tools/plot_curves.py
(CPU-only, no jax import — safe to run while a TPU job is live).
"""

import os
import re
import sys

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(ROOT, "results")

# categorical slots 1-4 (dataviz default palette, light mode, validated
# adjacent-pair order: blue, orange, aqua, yellow)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"

TRAIN_RE = re.compile(r"\[TRAIN\] step (\d+) samples: ([0-9.]+)")
PERF_RE = re.compile(r"\[PERFORM\] step (\d+) reward ([0-9.]+)")


def curve(log_name):
    """-> (samples_at_eval, eval_reward) arrays from a results/ log."""
    path = os.path.join(RES, log_name)
    tsteps, tsamples, psteps, prew = [], [], [], []
    with open(path) as f:
        for line in f:
            m = TRAIN_RE.search(line)
            if m:
                tsteps.append(int(m.group(1)))
                tsamples.append(float(m.group(2)))
                continue
            m = PERF_RE.search(line)
            if m:
                psteps.append(int(m.group(1)))
                prew.append(float(m.group(2)))
    if not psteps or not tsteps:
        return None
    # resumed runs repeat step ranges; keep the mapping monotone
    ts, ss = np.asarray(tsteps), np.asarray(tsamples)
    order = np.argsort(ts)
    samples = np.interp(np.asarray(psteps), ts[order], ss[order])
    return samples / 1e6, np.asarray(prew)


def style(ax, xlabel, ylabel):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    ax.tick_params(colors=INK2, labelsize=8)
    ax.set_xlabel(xlabel, color=INK2, fontsize=9)
    ax.set_ylabel(ylabel, color=INK2, fontsize=9)


def plot(series, title, out, ymax=600, legend_loc="lower right"):
    """series: list of (label, log_name) drawn in palette slot order."""
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=120)
    fig.patch.set_facecolor(SURFACE)
    drawn = 0
    for (label, log_name), color in zip(series, SERIES):
        c = curve(log_name)
        if c is None:
            print(f"  skip {log_name} (no data)", file=sys.stderr)
            continue
        x, y = c
        ax.plot(x, y, color=color, linewidth=1.8, label=label)
        # selective direct label at the line end
        ax.annotate(f" {label} ({y.max():.0f})", (x[-1], y[-1]),
                    color=color, fontsize=8, va="center")
        drawn += 1
    if not drawn:
        plt.close(fig)
        return
    style(ax, "environment samples (millions)", "eval reward (max 600)")
    ax.set_ylim(0, ymax)
    ax.set_xlim(left=0)
    ax.set_title(title, color=INK, fontsize=10, loc="left")
    if drawn >= 2:
        ax.legend(frameon=False, fontsize=8, labelcolor=INK2, loc=legend_loc)
    # headroom for the end-of-line labels
    x0, x1 = ax.get_xlim()
    ax.set_xlim(x0, x1 * 1.22)
    fig.tight_layout()
    fig.savefig(os.path.join(RES, out), format="svg",
                facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote results/{out}")


def main():
    plot([
        ("Walk", "dppo_pfpn35_walk_seed34114_exactgeom_tpu.log"),
        ("Punch", "dppo_pfpn35_punch_seed34114_exactgeom_tpu.log"),
        ("Kick", "dppo_pfpn35_kick_seed34114_exactgeom_tpu.log"),
    ], "DPPO+PFPN-35 at the reference's exact update geometry (seed 34114)",
        "curves_exactgeom.svg")

    plot([
        ("34114", "dppo_pfpn35_walk_seed34114_exactgeom_tpu.log"),
        ("33406", "dppo_pfpn35_walk_seed33406_exactgeom_tpu.log"),
        ("28949", "dppo_pfpn35_walk_seed28949_exactgeom_tpu.log"),
        ("12831", "dppo_pfpn35_walk_seed12831_exactgeom_tpu.log"),
        ("39907", "dppo_pfpn35_walk_seed39907_exactgeom_tpu.log"),
    ], "Walk seed robustness at the exact reference geometry "
       "(5 benchmark.sh seeds, mean 568.1 ± 6.6)",
        "curves_seeds.svg", legend_loc="lower right")

    plot([
        ("DPPO", "dppo_pfpn35_walk_seed34114_exactgeom_tpu.log"),
        ("SAC", "sac_pfpn35_walk_seed34114_mult16b_tpu.log"),
        ("A3C", "a3c_pfpn35_walk_seed34114_tpu.log"),
        ("IMPALA", "impala_pfpn35_walk_seed34114_tpu.log"),
    ], "Algorithm families on DeepMimicWalk-v0 (PFPN-35, seed 34114)",
        "curves_algos.svg")

    plot([
        ("PFPN-35", "dppo_pfpn35_walk_seed34114_geom512_tpu.log"),
        ("PFPN-100", "dppo_pfpn100_walk_seed34114_tpu.log"),
        ("PFPN-10", "dppo_pfpn10_walk_seed34114_tpu.log"),
        ("Gaussian", "dppo_gauss_walk_seed34114_tpu.log"),
    ], "Particle sweep + Gaussian baseline (DPPO Walk, mult8 geometry)",
        "curves_particles.svg", legend_loc="upper left")

    mt = "dppo_pfpn35_multitask_seed34114_exactgeom_tpu.log"
    if os.path.exists(os.path.join(RES, mt)):
        plot([("Walk+Punch+Kick (one policy)", mt)],
             "Multi-task PFPN-35: three motions, one policy (task one-hot)",
             "curves_multitask.svg")

    plot([
        ("34114", "dppo_pfpn35_punch_seed34114_exactgeom_tpu.log"),
        ("33406", "dppo_pfpn35_punch_seed33406_exactgeom_tpu.log"),
        ("28949", "dppo_pfpn35_punch_seed28949_exactgeom_tpu.log"),
    ], "Punch seed robustness at the exact reference geometry "
       "(mean 540.5 ± 4.3)",
        "curves_punch_seeds.svg")

    plot([
        ("PFPN-35", "ddpg_pfpn35_walk_seed34114_mult16_tpu.log"),
        ("Gaussian", "ddpg_gauss_walk_seed34114_mult16_tpu.log"),
    ], "DDPG head-to-head (Walk, mult16 geometry, 5 M budget)",
        "curves_ddpg.svg", ymax=200, legend_loc="upper left")

    # algorithm x head validation matrix (the paper's motivating negative
    # result: plain-Gaussian on-policy baselines collapse where PFPN and
    # discretized heads learn)
    fig, axes = plt.subplots(2, 3, figsize=(13.8, 6.4), dpi=120)
    fig.patch.set_facecolor(SURFACE)
    panels = [
        ("A3C (Walk, preset geometry)", [
            ("PFPN-35", "a3c_pfpn35_walk_seed34114_tpu.log"),
            ("discrete", "a3c_dis_walk_seed34114_tpu.log"),
            ("Gaussian", "a3c_gauss_walk_seed34114_tpu.log")]),
        ("IMPALA (Walk, preset geometry)", [
            ("PFPN-35", "impala_pfpn35_walk_seed34114_tpu.log"),
            ("discrete", "impala_dis_walk_seed34114_tpu.log"),
            ("Gaussian", "impala_gauss_walk_seed34114_tpu.log")]),
        ("DPPO (Walk, mult8 geometry)", [
            ("PFPN-35", "dppo_pfpn35_walk_seed34114_geom512_tpu.log"),
            ("discrete", "dppo_dis_walk_seed34114_tpu.log"),
            ("Gaussian", "dppo_gauss_walk_seed34114_tpu.log")]),
        ("SAC (Walk, mult16 geometry)", [
            ("PFPN-35", "sac_pfpn35_walk_seed34114_mult16b_tpu.log"),
            ("Gaussian", "sac_gauss_walk_seed34114_mult16_tpu.log")]),
        ("DDPG (Walk, mult16 geometry, 5 M)", [
            ("PFPN-35", "ddpg_pfpn35_walk_seed34114_mult16_tpu.log"),
            ("Gaussian", "ddpg_gauss_walk_seed34114_mult16_tpu.log")]),
    ]
    for ax in axes.ravel()[len(panels):]:
        ax.set_visible(False)
    for ax, (title, series) in zip(axes.ravel(), panels):
        for (label, log_name), color in zip(series, SERIES):
            c = curve(log_name)
            if c is None:
                print(f"  skip {log_name} (no data)", file=sys.stderr)
                continue
            x, y = c
            ax.plot(x, y, color=color, linewidth=1.6,
                    label=f"{label} ({y.max():.0f})")
        style(ax, "env samples (M)", "eval reward")
        ax.set_ylim(0, 600)
        ax.set_xlim(left=0)
        ax.set_title(title, color=INK, fontsize=9, loc="left")
        ax.legend(frameon=False, fontsize=8, labelcolor=INK2,
                  loc="upper left")
    fig.tight_layout()
    fig.savefig(os.path.join(RES, "curves_matrix.svg"), format="svg",
                facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)
    print("wrote results/curves_matrix.svg")


if __name__ == "__main__":
    main()
