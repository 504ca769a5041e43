"""Reward-curve PNG artifacts (reference training drivers save a
matplotlib `plot.png` of the reward history every iteration alongside
`plot_data.npy`, e.g. trajopt_folding.py:141-142, run_cmaes_all.py:184)."""
from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def save_reward_curve(path: str, history, ylabel: str = "reward"):
    y = np.asarray(history, dtype=float)
    fig, ax = plt.subplots()
    ax.plot(np.arange(len(y)), y)
    ax.set_xlabel("iteration")
    ax.set_ylabel(ylabel)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
    return path
