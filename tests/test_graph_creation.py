"""Graph construction invariants (ref: tests/test_graph_creation.py checks
file manifests/shapes; here we also verify geometric properties)."""

import numpy as np
import pytest

from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graph.build import DM_SCALE, create_graph
from neural_lam_tpu.graph.storage import (
    graph_from_bundle,
    load_graph,
    load_graph_bundle,
)


@pytest.fixture(scope="module")
def xy():
    return DummyDatastore(grid_shape=(30, 28), n_timesteps=5).get_xy(
        "state", stacked=False
    )


@pytest.mark.parametrize("name,hierarchical,levels", [
    ("flat", False, None),
    ("onelevel", False, 1),
    ("hier", True, 2),
])
def test_graph_files_and_shapes(tmp_path, xy, name, hierarchical, levels):
    bundle = create_graph(str(tmp_path / name), xy, n_max_levels=levels,
                          hierarchical=hierarchical)
    assert (tmp_path / name / "graph.npz").exists()
    assert (tmp_path / name / "meta.json").exists()

    n_levels = bundle.n_levels
    if hierarchical:
        assert n_levels == 2
        assert len(bundle.mesh_up_edge_index) == n_levels - 1
        assert len(bundle.mesh_down_edge_index) == n_levels - 1
    else:
        assert n_levels == 1  # flat merges everything into one level

    for lev in range(n_levels):
        e = bundle.m2m_edge_index[lev]
        f = bundle.m2m_features[lev]
        assert e.shape[0] == 2 and f.shape == (e.shape[1], 3)
        assert bundle.mesh_static_features[lev].shape[1] == 2

    # round-trips through disk
    bundle2 = load_graph_bundle(str(tmp_path / name))
    np.testing.assert_array_equal(bundle2.m2m_edge_index[0],
                                  bundle.m2m_edge_index[0])
    hier_flag, graph = load_graph(str(tmp_path / name))
    assert hier_flag == hierarchical


def test_mesh_edges_symmetric_and_bounded(tmp_path, xy):
    bundle = create_graph(str(tmp_path / "g"), xy, n_max_levels=1,
                          hierarchical=False)
    e = bundle.m2m_edge_index[0]
    # both directions present for every edge
    pairs = set(map(tuple, e.T))
    assert all((v, u) in pairs for u, v in pairs)
    # lattice degree bound: 4-neighbour + diagonals = at most 8
    counts = np.bincount(e[1])
    assert counts.max() <= 8
    # no self loops
    assert np.all(e[0] != e[1])


def test_g2m_radius_and_m2g_knn(tmp_path, xy):
    bundle = create_graph(str(tmp_path / "g"), xy, n_max_levels=1,
                          hierarchical=False)
    graph = graph_from_bundle(bundle, dense=False)
    grid_pos = xy.reshape(-1, 2)
    mesh_pos = bundle.g2m_mesh_pos
    n0 = int(round(np.sqrt(mesh_pos.shape[0])))
    dm = np.linalg.norm(mesh_pos[n0] - mesh_pos[0])

    # every g2m edge is within the DM_SCALE radius (ref: create_graph.py:424)
    send = np.asarray(graph.g2m.senders)
    recv = np.asarray(graph.g2m.receivers)
    d = np.linalg.norm(grid_pos[send] - mesh_pos[recv], axis=1)
    assert d.max() <= dm * DM_SCALE + 1e-6

    # m2g: exactly 4 incoming mesh senders per grid node, and they are the
    # 4 nearest (ref: create_graph.py:506-519)
    recv = np.asarray(graph.m2g.receivers)
    counts = np.bincount(recv, minlength=grid_pos.shape[0])
    assert np.all(counts == 4)
    send = np.asarray(graph.m2g.senders)
    g = 7  # arbitrary grid node
    got = sorted(send[recv == g])
    want = sorted(
        np.argsort(np.linalg.norm(mesh_pos - grid_pos[g], axis=1))[:4]
    )
    assert got == want


def test_hierarchical_parent_child(tmp_path, xy):
    bundle = create_graph(str(tmp_path / "h"), xy, n_max_levels=2,
                          hierarchical=True)
    graph = graph_from_bundle(bundle, dense=False)
    # every child has exactly one parent (down in-degree 1)
    down = graph.down[0]
    counts = np.bincount(np.asarray(down.receivers),
                         minlength=graph.level_sizes[0])
    assert np.all(counts == 1)
    # up edges are the inverse of down edges
    up = graph.up[0]
    down_pairs = set(zip(np.asarray(down.senders).tolist(),
                         np.asarray(down.receivers).tolist()))
    up_pairs = set(zip(np.asarray(up.receivers).tolist(),
                       np.asarray(up.senders).tolist()))
    assert down_pairs == up_pairs


def test_edge_feature_normalization(tmp_path, xy):
    bundle = create_graph(str(tmp_path / "g"), xy, n_max_levels=None,
                          hierarchical=False)
    graph = graph_from_bundle(bundle, dense=False)
    # after loading, the longest m2m edge length is exactly 1
    assert np.isclose(
        float(np.asarray(graph.m2m[0].features)[:, 0].max()), 1.0
    )
    # feature columns are [len, vdiff_x, vdiff_y]: len == |vdiff|
    f = np.asarray(graph.g2m.features)
    np.testing.assert_allclose(
        f[:, 0], np.linalg.norm(f[:, 1:], axis=1), rtol=1e-5
    )
