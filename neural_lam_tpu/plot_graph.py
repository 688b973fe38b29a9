"""3D graph visualization CLI (ref: neural_lam/plot_graph.py:19-210).

Renders the g2m/m2m/m2g (and up/down) edge sets with mesh levels stacked at
different z heights. The reference uses plotly (unavailable here); this
implementation uses matplotlib's 3D axes and saves to an image file.

Usage: python -m neural_lam_tpu.plot_graph --config_path <cfg> [--graph name]
       [--save out.png] [--show_ids]
"""

from __future__ import annotations

from argparse import ArgumentParser

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from mpl_toolkits.mplot3d.art3d import Line3DCollection  # noqa: E402

MESH_HEIGHT = 0.1
MESH_LEVEL_DIST = 0.2
GRID_HEIGHT = 0


def _edge_segments(pos_send, pos_rec, senders, receivers):
    a = pos_send[np.asarray(senders)]
    b = pos_rec[np.asarray(receivers)]
    return np.stack([a, b], axis=1)  # (M, 2, 3)


def make_graph_figure(graph, grid_xy, mesh_only=False):
    """Build the 3D matplotlib figure for a LoadedGraph + grid positions."""
    scale = float(np.ptp(grid_xy[:, 0]))
    grid_pos = np.concatenate(
        [grid_xy, np.full((grid_xy.shape[0], 1), GRID_HEIGHT)], axis=1
    )

    # mesh level positions (static features are normalized positions;
    # rescale with the grid extent for display)
    pos_max = np.abs(grid_xy).max()
    level_pos = []
    for lev, feat in enumerate(graph.mesh_static_features):
        p = np.asarray(feat) * pos_max
        z = (MESH_HEIGHT + lev * MESH_LEVEL_DIST) * scale
        level_pos.append(
            np.concatenate([p, np.full((p.shape[0], 1), z)], axis=1)
        )

    fig = plt.figure(figsize=(12, 10))
    ax = fig.add_subplot(projection="3d")

    def add_edges(segs, color, lw=0.4, label=None):
        col = Line3DCollection(segs, colors=color, linewidths=lw, label=label)
        ax.add_collection(col)

    for lev, es in enumerate(graph.m2m):
        add_edges(
            _edge_segments(level_pos[lev], level_pos[lev],
                           es.senders, es.receivers),
            "blue", 0.3, label=f"m2m L{lev}" if lev == 0 else None,
        )
    for lev, es in enumerate(graph.up):
        add_edges(
            _edge_segments(level_pos[lev], level_pos[lev + 1],
                           es.senders, es.receivers),
            "green", 0.3, label="up" if lev == 0 else None,
        )
    for lev, es in enumerate(graph.down):
        add_edges(
            _edge_segments(level_pos[lev + 1], level_pos[lev],
                           es.senders, es.receivers),
            "purple", 0.3, label="down" if lev == 0 else None,
        )
    if not mesh_only:
        add_edges(
            _edge_segments(grid_pos, level_pos[0],
                           graph.g2m.senders, graph.g2m.receivers),
            "orange", 0.15, label="g2m",
        )
        add_edges(
            _edge_segments(level_pos[0], grid_pos,
                           graph.m2g.senders, graph.m2g.receivers),
            "red", 0.15, label="m2g",
        )
        ax.scatter(grid_pos[:, 0], grid_pos[:, 1], grid_pos[:, 2],
                   s=1, c="black", alpha=0.3)
    for lev, p in enumerate(level_pos):
        ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=4, label=f"mesh L{lev}")

    all_pts = np.concatenate([grid_pos] + level_pos)
    ax.auto_scale_xyz(all_pts[:, 0], all_pts[:, 1], all_pts[:, 2])
    ax.legend(loc="upper left", fontsize=8)
    ax.set_axis_off()
    return fig


def main(input_args=None):
    import os

    from .config import load_config_and_datastore
    from .graph.storage import load_graph

    parser = ArgumentParser(description="Plot graph")
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--graph", type=str, default="multiscale",
                        help="Graph to plot (default: multiscale)")
    parser.add_argument("--save", type=str, default="graph.png",
                        help="Output image path (default: graph.png)")
    parser.add_argument("--mesh_only", action="store_true",
                        help="Plot only the mesh (no g2m/m2g edges)")
    args = parser.parse_args(input_args)

    _, datastore = load_config_and_datastore(config_path=args.config_path)
    _, graph = load_graph(
        os.path.join(datastore.root_path, "graph", args.graph)
    )
    grid_xy = datastore.get_xy("state")
    fig = make_graph_figure(graph, grid_xy, mesh_only=args.mesh_only)
    fig.savefig(args.save, dpi=200, bbox_inches="tight")
    print(f"Saved graph figure to {args.save}")


if __name__ == "__main__":
    main()
