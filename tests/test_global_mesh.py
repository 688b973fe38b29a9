"""Global icosahedral mesh graphs + the prob_model_global configuration.

Covers the BASELINE stretch config: a global probabilistic (ensemble)
model on an icosahedral sphere mesh. Graph invariants, bundle round-trip
through graph.storage, every model family forward, and the probabilistic
(output_std + NLL + ensemble sampling) path on the global graph.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_lam_tpu.config import (
    DatastoreSelection,
    NeuralLAMConfig,
    TrainingConfig,
)
from neural_lam_tpu.datastore.dummy_global import DummyGlobalDatastore
from neural_lam_tpu.graph.global_mesh import (
    _icosahedron,
    build_icosahedral_levels,
    create_global_graph,
    latlon_to_xyz,
)
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs


def test_icosahedral_refinement_invariants():
    verts, faces = _icosahedron()
    assert verts.shape == (12, 3) and faces.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1), 1.0,
                               atol=1e-12)

    verts_per_level, edges_per_level = build_icosahedral_levels(2)
    # finest first: sizes 162, 42, 12 (V_{r+1} = V_r + E_r undirected)
    assert [v.shape[0] for v in verts_per_level] == [162, 42, 12]
    # directed edge counts: 2 * 30 * 4^r
    assert [e.shape[1] for e in edges_per_level] == [960, 240, 60]
    # prefix property: coarser vertices are a prefix of finer
    np.testing.assert_array_equal(verts_per_level[0][:42],
                                  verts_per_level[1])
    # all vertices on the unit sphere
    for v in verts_per_level:
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0,
                                   atol=1e-12)
    # degree 5 at the 12 icosahedron vertices, 6 elsewhere
    deg = np.bincount(edges_per_level[0][1], minlength=162)
    assert (deg[:12] == 5).all() and (deg[12:] == 6).all()


def test_latlon_to_xyz():
    pts = latlon_to_xyz(np.array([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0]]))
    np.testing.assert_allclose(
        pts, [[1, 0, 0], [0, 1, 0], [0, 0, 1]], atol=1e-12
    )


@pytest.fixture(scope="module")
def global_env(tmp_path_factory):
    datastore = DummyGlobalDatastore(n_lon=24, n_lat=12, n_timesteps=20)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata_global",
                                     config_path=""),
        training=TrainingConfig(),
    )
    gd = tmp_path_factory.mktemp("global_graphs")
    latlon = datastore.get_xy("state", stacked=True)
    flat = create_global_graph(str(gd / "flat"), latlon, refinements=2,
                               hierarchical=False)
    hier = create_global_graph(str(gd / "hier"), latlon, refinements=2,
                               n_levels=2, hierarchical=True)
    return datastore, config, flat, hier


def test_global_bundle_invariants(global_env):
    datastore, _, flat, hier = global_env
    n_grid = datastore.num_grid_points

    # multiscale: single merged m2m level over the finest vertex set
    assert not flat.hierarchical and flat.n_levels == 1
    assert flat.level_sizes == [162]
    # merged edges = union of level edge sets (some coarse edges may
    # coincide with fine ones only at r transitions; here they don't)
    assert flat.m2m_edge_index[0].shape[1] >= 960
    # every grid node has exactly 4 m2g edges, offset after mesh nodes
    assert flat.m2g_edge_index.shape[1] == 4 * n_grid
    assert flat.m2g_edge_index[1].min() == 162
    assert flat.m2g_edge_index[1].max() == 162 + n_grid - 1
    # features carry 3D displacements: [len, dx, dy, dz]
    assert flat.m2m_features[0].shape[1] == 4
    assert flat.g2m_features.shape[1] == 4
    # every mesh vertex receives at least one g2m edge at this resolution
    rec_deg = np.bincount(flat.g2m_edge_index[1], minlength=162)
    assert (rec_deg > 0).all()

    # hierarchical: finest-first levels, parent 1-NN up/down edges
    assert hier.hierarchical and hier.n_levels == 2
    assert hier.level_sizes == [162, 42]
    up = hier.mesh_up_edge_index[0]
    assert up.shape == (2, 162)
    assert up[0].min() >= 0 and up[0].max() < 162
    assert up[1].min() >= 162 and up[1].max() < 162 + 42
    down = hier.mesh_down_edge_index[0]
    np.testing.assert_array_equal(down[0], up[1])
    np.testing.assert_array_equal(down[1], up[0])
    # a coarse vertex is its own nearest parent (shared positions).
    # Levels are independently renumbered by locality_order, so match
    # children to parents BY POSITION, not by the old prefix identity.
    child_to_parent = dict(zip(up[0].tolist(), (up[1] - 162).tolist()))
    fine = hier.mesh_static_features[0]
    coarse = hier.mesh_static_features[1]
    for p in range(42):
        matches = np.nonzero(
            (np.abs(fine - coarse[p][None, :]) < 1e-12).all(axis=1)
        )[0]
        assert matches.size == 1
        assert child_to_parent[int(matches[0])] == p


@pytest.mark.parametrize("model_name", ["graph_lam", "hi_lam",
                                        "hi_lam_parallel"])
def test_global_model_forward(global_env, model_name):
    datastore, config, flat, hier = global_env
    bundle = flat if model_name == "graph_lam" else hier
    graph = graph_from_bundle(bundle)
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=1)
    model = MODELS[model_name](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))

    B, n = 2, datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    prevprev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    forcing = jnp.asarray(rng.standard_normal((B, n, d_f)), jnp.float32)
    out, _ = jax.jit(model.predict_step)(params, prev, prevprev, forcing)
    assert out.shape == (B, n, d)
    assert np.all(np.isfinite(np.asarray(out)))


def test_prob_model_global(global_env):
    """The stretch configuration: hierarchical icosahedral mesh + Gaussian
    output head + NLL training grad + ensemble sampling, no LAM boundary."""
    from neural_lam_tpu.dataset import WeatherDataset, collate
    from neural_lam_tpu.ensemble import sample_rollout

    datastore, config, _, hier = global_env
    assert float(np.asarray(datastore.boundary_mask.values).sum()) == 0.0
    graph = graph_from_bundle(hier)
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=1,
                     output_std=True, loss="nll")
    model = MODELS["hi_lam"](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(1))

    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))

    loss, grads = jax.value_and_grad(model.training_loss)(params, batch)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))

    init_states, target_states, forcing, _ = batch
    members = sample_rollout(
        model, params, init_states, forcing, target_states,
        key=jax.random.PRNGKey(2), n_members=3,
    )
    assert members.shape[:2] == (init_states.shape[0], 3)
    assert np.all(np.isfinite(np.asarray(members)))


def test_global_graph_cli(tmp_path):
    """graph build CLI with --mesh global_icosahedral on the registered
    dummydata_global datastore."""
    import yaml

    from neural_lam_tpu.graph.build import cli
    from neural_lam_tpu.graph.storage import load_graph

    ds_cfg = tmp_path / "global.yaml"
    with open(ds_cfg, "w") as f:
        yaml.safe_dump({"n_lon": 16, "n_lat": 8, "n_timesteps": 8,
                        "root": str(tmp_path / "dsroot")}, f)
    cfg = tmp_path / "config.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump({"datastore": {"kind": "dummydata_global",
                                      "config_path": str(ds_cfg)}}, f)
    cli(["--config_path", str(cfg), "--name", "ico",
         "--mesh", "global_icosahedral", "--refinements", "2",
         "--hierarchical", "--levels", "2"])
    hierarchical, graph = load_graph(
        str(tmp_path / "dsroot" / "graph" / "ico")
    )
    assert hierarchical
    assert graph.num_grid_nodes == 16 * 8
    assert graph.level_sizes == (162, 42)


def test_graph_autobuild_global(tmp_path):
    """Auto-build for a GLOBAL datastore must produce an icosahedral
    graph, not a planar lattice over lon/lat degrees."""
    from neural_lam_tpu.datastore.dummy_global import DummyGlobalDatastore
    from neural_lam_tpu.models.ar_model import ModelArgs

    ds = DummyGlobalDatastore(n_lon=24, n_lat=12, n_timesteps=6,
                              root=str(tmp_path / "dsroot"))
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata_global",
                                     config_path=""),
        training=TrainingConfig(),
    )
    args = ModelArgs(hidden_dim=4, hidden_layers=1, processor_layers=1,
                     graph="autoglobal")
    model = MODELS["graph_lam"](args, config, ds)
    # icosahedral refinements=3 finest level: 10*4^3 + 2 = 642 vertices
    assert model.num_mesh_nodes == 642
    assert (tmp_path / "dsroot" / "graph" / "autoglobal" /
            "meta.json").exists()


def test_reorder_invariance(global_env):
    """locality_order renumbering is a graph isomorphism: grid-node
    predictions match the reorder=False build to fp-reassociation
    tolerance for both families (the hierarchical parent assignment uses
    a geometric tie-break, so the up/down topology is numbering-
    invariant too)."""
    import tempfile

    from neural_lam_tpu.graph.global_mesh import locality_order

    datastore, config, flat, hier = global_env
    latlon = datastore.get_xy("state", stacked=True)
    n = datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    pprev = jnp.asarray(rng.standard_normal((2, n, d)), jnp.float32)
    forc = jnp.asarray(rng.standard_normal((2, n, d_f)), jnp.float32)

    # the permutation is a real renumbering of the raw subdivision order
    # (on an already-ordered array it is the identity — idempotent)
    raw_verts = build_icosahedral_levels(2)[0][0]
    perm = locality_order(raw_verts)
    assert not np.array_equal(perm, np.arange(perm.size))
    np.testing.assert_array_equal(locality_order(raw_verts[perm]),
                                  np.arange(perm.size))

    for name, hierarchical in (("graph_lam", False), ("hi_lam", True)):
        outs = []
        for ro in (False, True):
            bundle = create_global_graph(
                tempfile.mkdtemp(), latlon, refinements=2,
                n_levels=2 if hierarchical else None,
                hierarchical=hierarchical, reorder=ro,
            )
            model = MODELS[name](
                ModelArgs(hidden_dim=8, processor_layers=2), config,
                datastore, graph_from_bundle(bundle),
            )
            params = model.init_params(jax.random.PRNGKey(0))
            out, _ = model.predict_step(params, prev, pprev, forc)
            outs.append(np.asarray(out))
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-5, rtol=1e-5)
