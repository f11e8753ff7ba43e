#!/usr/bin/env python
"""Plotting tools for training logs, evaluation results and trajectories.

Parity reference: gymnax_exchange/jaxrl/MARL/baseline_eval/
{plotting_episodes.py, plotting_combinations.py, simple_triangular_plot.py}.
Produces (a) per-episode feature plots from pickled trajectories, (b) a
combo-grid heatmap of mean rewards over Learned/Baseline combinations, and
(c) training-curve plots from the trainer's JSONL log.
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_training_log(log_path: str, out: str):
    """Loss / reward curves from scripts/train.py --log-file JSONL."""
    rows = [json.loads(l) for l in open(log_path)]
    updates = [r["update"] for r in rows]
    n_types = len(rows[0]["avg_reward"])
    fig, axes = plt.subplots(2, 1, figsize=(8, 8), sharex=True)
    for i in range(n_types):
        axes[0].plot(updates, [r["avg_reward"][i] for r in rows],
                     label=f"type {i}")
        axes[1].plot(updates, [r["loss"][i]["total_loss"] for r in rows],
                     label=f"type {i}")
    axes[0].set_ylabel("avg reward")
    axes[1].set_ylabel("total loss")
    axes[1].set_xlabel("update")
    for ax in axes:
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def plot_combination_grid(results_path: str, out: str):
    """Heatmap of per-type mean rewards over L/B combos
    (reference: plotting_combinations.py)."""
    results = json.load(open(results_path))
    combos = sorted(results.keys())
    n_types = len(results[combos[0]]["mean_reward_per_type"])
    mat = np.array([[results[c]["mean_reward_per_type"][i]
                     for i in range(n_types)] for c in combos])
    fig, ax = plt.subplots(figsize=(2 + n_types * 1.6,
                                    1.5 + len(combos) * 0.6))
    im = ax.imshow(mat, aspect="auto", cmap="RdYlGn")
    ax.set_xticks(range(n_types))
    ax.set_xticklabels([f"type {i}" for i in range(n_types)])
    ax.set_yticks(range(len(combos)))
    ax.set_yticklabels(combos)
    for i in range(len(combos)):
        for j in range(n_types):
            ax.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center",
                    fontsize=8)
    fig.colorbar(im, ax=ax, label="mean reward")
    ax.set_title("mean reward by Learned/Baseline combination")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def plot_triangular(results_path: str, out: str):
    """2x2 Learned/Baseline matrix with triangular split cells — lower-left
    triangle colored/labeled by the first type's (MM) mean reward, upper
    right by the second's (Exec) (reference: simple_triangular_plot.py).
    Requires exactly two agent types."""
    results = json.load(open(results_path))
    n_types = len(next(iter(results.values()))["mean_reward_per_type"])
    if n_types != 2:
        raise SystemExit("triangular plot needs exactly 2 agent types")
    tags = ["L", "B"]
    r0 = np.array([[results[a + b]["mean_reward_per_type"][0]
                    for b in tags] for a in tags])
    r1 = np.array([[results[a + b]["mean_reward_per_type"][1]
                    for b in tags] for a in tags])
    fig, ax = plt.subplots(figsize=(6, 6))
    norm0 = plt.Normalize(r0.min(), r0.max())
    norm1 = plt.Normalize(r1.min(), r1.max())
    cm0, cm1 = plt.get_cmap("Blues"), plt.get_cmap("Oranges")
    for i in range(2):
        for j in range(2):
            x, y = j, 1 - i
            lower = plt.Polygon([(x, y), (x + 1, y), (x, y + 1)],
                                facecolor=cm0(norm0(r0[i, j])),
                                edgecolor="k")
            upper = plt.Polygon([(x + 1, y), (x + 1, y + 1), (x, y + 1)],
                                facecolor=cm1(norm1(r1[i, j])),
                                edgecolor="k")
            ax.add_patch(lower)
            ax.add_patch(upper)
            ax.text(x + 0.3, y + 0.3, f"{r0[i, j]:.2f}", ha="center",
                    va="center", fontsize=10)
            ax.text(x + 0.7, y + 0.7, f"{r1[i, j]:.2f}", ha="center",
                    va="center", fontsize=10)
    ax.set_xlim(0, 2)
    ax.set_ylim(0, 2)
    ax.set_xticks([0.5, 1.5])
    ax.set_xticklabels([f"type1 {t}" for t in tags])
    ax.set_yticks([0.5, 1.5])
    ax.set_yticklabels([f"type0 {t}" for t in reversed(tags)])
    ax.set_title("mean reward: type0 (lower-left) / type1 (upper-right)")
    ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def plot_episode(traj_path: str, out: str, env_idx: int = 0):
    """Per-step reward traces from a pickled trajectory
    (reference: plotting_episodes.py)."""
    with open(traj_path, "rb") as f:
        rewards, infos = pickle.load(f)
    n_types = len(rewards)
    fig, axes = plt.subplots(n_types + 1, 1, figsize=(9, 3 * (n_types + 1)),
                             sharex=True)
    for i in range(n_types):
        r = np.asarray(rewards[i])[:, env_idx]
        r = r.reshape(r.shape[0], -1)
        for a in range(r.shape[1]):
            axes[i].plot(r[:, a], label=f"agent {a}")
        axes[i].set_ylabel(f"type {i} reward")
        axes[i].legend()
        axes[i].grid(alpha=0.3)
    w = infos["world"]
    mid = np.asarray(w["end_mid_price"])[:, env_idx]
    axes[-1].plot(mid, color="k")
    axes[-1].set_ylabel("mid price")
    axes[-1].set_xlabel("step")
    axes[-1].grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("train-log")
    p1.add_argument("log"); p1.add_argument("--out", default="train_log.png")
    p2 = sub.add_parser("combos")
    p2.add_argument("results"); p2.add_argument("--out", default="combos.png")
    p3 = sub.add_parser("episode")
    p3.add_argument("traj"); p3.add_argument("--out", default="episode.png")
    p3.add_argument("--env", type=int, default=0)
    p4 = sub.add_parser("triangular")
    p4.add_argument("results")
    p4.add_argument("--out", default="triangular.png")
    args = ap.parse_args()
    if args.cmd == "train-log":
        plot_training_log(args.log, args.out)
    elif args.cmd == "combos":
        plot_combination_grid(args.results, args.out)
    elif args.cmd == "triangular":
        plot_triangular(args.results, args.out)
    else:
        plot_episode(args.traj, args.out, args.env)


if __name__ == "__main__":
    main()
