"""Trajectory plotting — the reference's 3-D dot/line plots, file-based.

Parity with plot_and_save (traj_evaluation_data_analysis.py:73-110) and the
live 3-D GT-vs-VO plots (visual_odometry_v2.py:376-447), rendered headlessly
to PNG (no GUI dependency).
"""

from __future__ import annotations

import numpy as np


def plot_trajectory_3d(
    path: str,
    named_position_streams: dict[str, np.ndarray],
    title: str = "trajectory",
) -> None:
    """Plot one or more (N, 3) position streams into a 3-D PNG.

    Prints the bounding-box extent like the reference does
    (data_analysis:102-108).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    for name, pos in named_position_streams.items():
        pos = np.asarray(pos)
        ax.plot(pos[:, 0], pos[:, 1], pos[:, 2], marker=".", markersize=3, label=name)
        ext = pos.max(0) - pos.min(0)
        print(f"{name}: extent x={ext[0]:.4f} y={ext[1]:.4f} z={ext[2]:.4f}")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
