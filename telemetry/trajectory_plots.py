#!/usr/bin/env python
"""CR3BP trajectory plots (reference ``support_scripts/plot.py`` /
``cr3bp_...warmstart.py:294-314`` capability): propagate warm-start control
schedules through the JAX CR3BP dynamics and plot the rotating-frame
trajectories with Earth/Moon/L1 markers.

    python telemetry/trajectory_plots.py --samples generated_samples.pkl \
        --out plots/trajectories.png --n 8
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def propagate_trajectory(guess, n_segments=20, thrust=1.0,
                         start_bdry=6.48423370092, pts_per_seg=8):
    """Integrate [coast1, N segments, coast2] from the spiral boundary
    state, returning the stacked rotating-frame states."""
    import jax.numpy as jnp
    from rdm_tpu.physics import cr3bp as dyn

    s = dyn.spiral_to_boundary(start_bdry, thrust_n=1.0)
    t_shoot, t_c1, t_c2 = float(guess[0]), float(guess[1]), float(guess[2])
    ctrl = np.asarray(guess[3:3 + 3 * n_segments]).reshape(n_segments, 3)
    states = [np.asarray(s[:6])]

    def prop(s, u, throttle, tof, n):
        traj = []
        for _ in range(n):
            s = dyn.propagate(s, jnp.asarray(u, jnp.float32), throttle,
                              thrust, tof / n, n_steps=8)
            traj.append(np.asarray(s[:6]))
        return s, traj

    s, traj = prop(s, np.zeros(3), 0.0, max(t_c1, 1e-3), pts_per_seg)
    states += traj
    seg_dt = max(t_shoot, 1e-3) / n_segments
    for alpha, beta, r in ctrl:
        u = np.array([np.cos(beta) * np.cos(alpha),
                      np.cos(beta) * np.sin(alpha), np.sin(beta)])
        s, traj = prop(s, u, float(np.clip(r, 0, 1)), seg_dt, pts_per_seg)
        states += traj
    s, traj = prop(s, np.zeros(3), 0.0, max(t_c2, 1e-3), pts_per_seg)
    states += traj
    return np.asarray(states)


def plot_trajectories(samples, out_path, n=8):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from rdm_tpu.physics import cr3bp as dyn

    fig, ax = plt.subplots(figsize=(8, 7))
    mu = dyn.CR3BP_MU
    for i in range(min(n, len(samples))):
        traj = propagate_trajectory(samples[i, 1:])
        ax.plot(traj[:, 0], traj[:, 1], lw=0.8,
                label=f"#{i} (E={samples[i, 0]:.3f})")
    ax.scatter([-mu], [0], s=120, color="DodgerBlue", zorder=5, label="Earth")
    ax.scatter([1 - mu], [0], s=40, color="gray", zorder=5, label="Moon")
    ax.scatter([dyn.l1_position()], [0], marker="x", s=60, color="red",
               zorder=5, label="L1")
    ax.set_xlabel("x [LU]")
    ax.set_ylabel("y [LU]")
    ax.set_title("warm-start trajectories (rotating frame)")
    ax.legend(fontsize=7, ncol=2)
    ax.set_aspect("equal")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {out_path}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", required=True,
                   help="[N, 67] pkl/npy of physical warm starts")
    p.add_argument("--out", default="plots/trajectories.png")
    p.add_argument("--n", type=int, default=8)
    args = p.parse_args()
    if args.samples.endswith(".npy"):
        samples = np.load(args.samples)
    else:
        with open(args.samples, "rb") as f:
            samples = pickle.load(f)
    plot_trajectories(np.asarray(samples), args.out, args.n)


if __name__ == "__main__":
    main()
