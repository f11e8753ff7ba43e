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


def _load_traj(traj_path: str):
    """Load a trajectory artifact (scripts/evaluate.py --save-trajectories).
    Canonical format is .npz (utils.trajio); legacy pickles — both the dict
    format {"rewards", "infos", "actions", "dones", ...} and the
    (rewards, infos) tuple — still load."""
    if traj_path.endswith(".npz"):
        from jaxmarl_hft_tpu.utils import trajio
        return trajio.load_traj(traj_path)
    with open(traj_path, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, dict):
        return data
    rewards, infos = data
    return {"rewards": rewards, "infos": infos, "actions": None,
            "dones": None, "combo": os.path.basename(traj_path),
            "agent_names": [f"type{i}" for i in range(len(rewards))]}


def _scalar_series(values, env_idx):
    """(T, E, ...) array -> (T,) or (T, A) per-env series; None if not a
    plottable per-step scalar."""
    v = np.asarray(values)
    if v.ndim == 1:                       # (T,)
        return v
    if v.ndim == 2:                       # (T, E)
        return v[:, env_idx]
    if v.ndim == 3:                       # (T, E, A) or (T, E, 2=time)
        return v[:, env_idx]
    return None


def _agent_info_fields(infos, type_idx):
    """Plottable scalar fields of one agent type's info dict."""
    agent_infos = infos["agents"][type_idx]
    out = {}
    for k, v in sorted(agent_infos.items()):
        arr = np.asarray(v)
        if arr.ndim in (2, 3) and np.issubdtype(arr.dtype, np.number):
            out[k] = arr
    return out


def traj_for_combo(traj_dir: str, combo: str) -> str:
    """Trajectory file for a combo tag in a directory (reference:
    get_latest_pickle_file, plotting_episodes.py:22-88 — here evaluate.py
    writes one canonical traj_<combo>.npz per combo)."""
    path = os.path.join(traj_dir, f"traj_{combo}.npz")
    if not os.path.exists(path):
        path = os.path.join(traj_dir, f"traj_{combo}.pkl")
    if not os.path.exists(path):
        raise SystemExit(f"no trajectory for combo {combo}: {path}")
    return path


def plot_episode(traj_path: str, out_dir: str, env_indices=(0,),
                 features=None):
    """Multi-panel per-episode feature plots from a pickled trajectory: one
    figure per feature group, one subplot per requested env — actions
    (scatter), rewards, every scalar agent-info feature (inventory, posted
    prices, PnL, executed quantity, ...), and world features (mid price,
    spread, best bid/ask) (reference: plot_episode_features,
    plotting_episodes.py:525-761)."""
    data = _load_traj(traj_path)
    rewards, infos = data["rewards"], data["infos"]
    actions = data.get("actions")
    names = data.get("agent_names") or [f"type{i}"
                                        for i in range(len(rewards))]
    os.makedirs(out_dir, exist_ok=True)
    env_indices = list(env_indices)
    n_env = len(env_indices)
    written = []

    def new_fig():
        fig, axes = plt.subplots(n_env, 1, figsize=(10, 4 * n_env),
                                 sharex=True, squeeze=False)
        return fig, axes[:, 0]

    # --- actions (scatter, one colour per type; reference :571-599) -------
    if actions is not None:
        fig, axes = new_fig()
        for row, e in enumerate(env_indices):
            for i, a in enumerate(actions):
                arr = np.asarray(a)          # (T, E) or (T, E, A[, K])
                s = arr[:, e].reshape(arr.shape[0], -1)
                for col in range(s.shape[1]):
                    lbl = names[i] if col == 0 else None
                    axes[row].scatter(np.arange(s.shape[0]), s[:, col],
                                      s=14, alpha=0.6, label=lbl,
                                      color=f"C{i}")
            axes[row].set_ylabel(f"env {e} action")
            axes[row].grid(alpha=0.3)
            axes[row].legend()
        axes[-1].set_xlabel("step")
        fig.suptitle("actions")
        path = os.path.join(out_dir, "actions.png")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        written.append(path)

    # --- rewards per type --------------------------------------------------
    fig, axes = new_fig()
    for row, e in enumerate(env_indices):
        for i, r in enumerate(rewards):
            s = np.asarray(r)[:, e].reshape(np.asarray(r).shape[0], -1)
            for col in range(s.shape[1]):
                axes[row].plot(s[:, col], color=f"C{i}",
                               label=names[i] if col == 0 else None)
        axes[row].set_ylabel(f"env {e} reward")
        axes[row].grid(alpha=0.3)
        axes[row].legend()
    axes[-1].set_xlabel("step")
    fig.suptitle("rewards")
    path = os.path.join(out_dir, "rewards.png")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    written.append(path)

    # --- per-agent info features (reference :601-665) ----------------------
    for i in range(len(rewards)):
        fields = _agent_info_fields(infos, i)
        if features:
            fields = {k: v for k, v in fields.items() if k in features}
        for k, arr in fields.items():
            fig, axes = new_fig()
            for row, e in enumerate(env_indices):
                s = _scalar_series(arr, e)
                s = s.reshape(s.shape[0], -1)
                for col in range(s.shape[1]):
                    axes[row].plot(s[:, col],
                                   label=f"agent {col}" if s.shape[1] > 1
                                   else None)
                axes[row].set_ylabel(f"env {e} {k}")
                axes[row].grid(alpha=0.3)
                if s.shape[1] > 1:
                    axes[row].legend()
            axes[-1].set_xlabel("step")
            fig.suptitle(f"{names[i]}: {k}")
            path = os.path.join(out_dir, f"{names[i]}_{k}.png")
            fig.tight_layout()
            fig.savefig(path, dpi=120)
            plt.close(fig)
            written.append(path)

    # --- world features (reference :719-757) -------------------------------
    world = infos.get("world", {})
    world_keys = [k for k in ("end_mid_price", "spread", "best_asks",
                              "best_bids", "delta_time") if k in world]
    if features:
        world_keys = [k for k in world_keys if k in features] or world_keys
    for k in world_keys:
        fig, axes = new_fig()
        for row, e in enumerate(env_indices):
            s = _scalar_series(world[k], e)
            axes[row].plot(np.asarray(s).reshape(len(s), -1), color="k")
            axes[row].set_ylabel(f"env {e} {k}")
            axes[row].grid(alpha=0.3)
        axes[-1].set_xlabel("step")
        fig.suptitle(f"world: {k}")
        path = os.path.join(out_dir, f"world_{k}.png")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        written.append(path)

    for p in written:
        print(f"wrote {p}")
    return written


def plot_episode_same_axis(traj_dir: str, combos, out_dir: str,
                           features=("inventory", "total_PnL"),
                           env_indices=(0,)):
    """Overlay one feature across several combos on shared axes, one subplot
    per env (reference: plot_same_axis, plotting_episodes.py:125-322)."""
    os.makedirs(out_dir, exist_ok=True)
    env_indices = list(env_indices)
    written = []
    for feat in features:
        fig, axes = plt.subplots(len(env_indices), 1,
                                 figsize=(10, 4 * len(env_indices)),
                                 sharex=True, squeeze=False)
        axes = axes[:, 0]
        found = False
        for ci, combo in enumerate(combos):
            data = _load_traj(traj_for_combo(traj_dir, combo))
            infos = data["infos"]
            names = data.get("agent_names") or []
            for i in range(len(data["rewards"])):
                fields = _agent_info_fields(infos, i)
                if feat not in fields:
                    continue
                found = True
                for row, e in enumerate(env_indices):
                    s = _scalar_series(fields[feat], e)
                    s = s.reshape(s.shape[0], -1)
                    nm = names[i] if i < len(names) else f"type{i}"
                    axes[row].plot(s[:, 0], color=f"C{ci}",
                                   label=f"{combo} {nm}")
        if not found:
            plt.close(fig)
            continue
        for row, e in enumerate(env_indices):
            axes[row].set_ylabel(f"env {e} {feat}")
            axes[row].grid(alpha=0.3)
            axes[row].legend()
        axes[-1].set_xlabel("step")
        fig.suptitle(f"{feat} across combos {','.join(combos)}")
        path = os.path.join(out_dir, f"sameaxis_{feat}.png")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        written.append(path)
        print(f"wrote {path}")
    return written


def plot_combination_heatmap_ci(traj_dir: str, out: str):
    """Combo heatmap with dispersion: mean reward per type per combo with a
    ±std annotation, computed from per-env episode returns in the
    trajectory pickles (reference: plotting_combinations.py:1-694 spread/CI
    handling)."""
    by_combo = {}                      # npz preferred over a stale legacy pkl
    for f in sorted(os.listdir(traj_dir)):
        if f.startswith("traj_") and f.endswith((".npz", ".pkl")):
            combo = f[5:-4]
            if combo not in by_combo or f.endswith(".npz"):
                by_combo[combo] = f
    files = [by_combo[c] for c in sorted(by_combo)]
    if not files:
        raise SystemExit(f"no traj_*.npz under {traj_dir}")
    combos, means, stds = [], [], []
    for f in files:
        data = _load_traj(os.path.join(traj_dir, f))
        combos.append(data.get("combo") or f[5:-4])
        m_row, s_row = [], []
        for r in data["rewards"]:
            arr = np.asarray(r)                  # (T, E[, A])
            per_env = arr.reshape(arr.shape[0], arr.shape[1], -1)\
                         .mean(axis=(0, 2))      # mean reward per env
            m_row.append(per_env.mean())
            s_row.append(per_env.std())
        means.append(m_row)
        stds.append(s_row)
    means, stds = np.array(means), np.array(stds)
    n_types = means.shape[1]
    fig, ax = plt.subplots(figsize=(2.5 + n_types * 2.0,
                                    1.5 + len(combos) * 0.7))
    im = ax.imshow(means, aspect="auto", cmap="RdYlGn")
    ax.set_xticks(range(n_types))
    ax.set_xticklabels([f"type {i}" for i in range(n_types)])
    ax.set_yticks(range(len(combos)))
    ax.set_yticklabels(combos)
    for i in range(len(combos)):
        for j in range(n_types):
            ax.text(j, i, f"{means[i, j]:.2f}\n±{stds[i, j]:.2f}",
                    ha="center", va="center", fontsize=8)
    fig.colorbar(im, ax=ax, label="mean reward (± std over envs)")
    ax.set_title("reward by Learned/Baseline combination")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("train-log")
    p1.add_argument("log"); p1.add_argument("--out", default="train_log.png")
    p2 = sub.add_parser("combos")
    p2.add_argument("results"); p2.add_argument("--out", default="combos.png")
    p3 = sub.add_parser("episode", help="per-episode feature panels from a "
                        "trajectory pickle or --traj-dir/--combo")
    p3.add_argument("traj", nargs="?", default=None)
    p3.add_argument("--traj-dir", default=None)
    p3.add_argument("--combo", default=None)
    p3.add_argument("--out", default="intra-episode-figs")
    p3.add_argument("--envs", default="0",
                    help="comma-separated env indices")
    p3.add_argument("--features", default=None,
                    help="comma-separated feature filter")
    p4 = sub.add_parser("triangular")
    p4.add_argument("results")
    p4.add_argument("--out", default="triangular.png")
    p5 = sub.add_parser("same-axis", help="overlay features across combos")
    p5.add_argument("--traj-dir", required=True)
    p5.add_argument("--combos", default="LL,LB,BL,BB")
    p5.add_argument("--features", default="inventory,total_PnL")
    p5.add_argument("--envs", default="0")
    p5.add_argument("--out", default="intra-episode-figs")
    p6 = sub.add_parser("combo-heatmap", help="combo heatmap with ±std from "
                        "trajectory pickles")
    p6.add_argument("--traj-dir", required=True)
    p6.add_argument("--out", default="combo_heatmap.png")
    args = ap.parse_args()
    if args.cmd == "train-log":
        plot_training_log(args.log, args.out)
    elif args.cmd == "combos":
        plot_combination_grid(args.results, args.out)
    elif args.cmd == "triangular":
        plot_triangular(args.results, args.out)
    elif args.cmd == "same-axis":
        plot_episode_same_axis(
            args.traj_dir, args.combos.split(","), args.out,
            features=args.features.split(","),
            env_indices=[int(x) for x in args.envs.split(",")])
    elif args.cmd == "combo-heatmap":
        plot_combination_heatmap_ci(args.traj_dir, args.out)
    else:
        traj = args.traj
        if traj is None:
            if not (args.traj_dir and args.combo):
                raise SystemExit("episode needs a traj path or "
                                 "--traj-dir + --combo")
            traj = traj_for_combo(args.traj_dir, args.combo)
        plot_episode(traj, args.out,
                     env_indices=[int(x) for x in args.envs.split(",")],
                     features=args.features.split(",")
                     if args.features else None)


if __name__ == "__main__":
    main()
