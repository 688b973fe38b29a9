"""Spatial sharding correctness: SpatialGraphLAM must reproduce GraphLAM
bit-near-exactly on a ('data','space') mesh, and train end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.config import (
    DatastoreSelection,
    NeuralLAMConfig,
    TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models.ar_model import ModelArgs
from neural_lam_tpu.models.graph_lam import GraphLAM
from neural_lam_tpu.parallel.mesh import make_mesh
from neural_lam_tpu.parallel.spatial import SpatialGraphLAM


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    # 13x11 rectangular grid => padding path exercised (143 % 4 != 0)
    datastore = DummyDatastore(grid_shape=(13, 11), n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    gdir = tmp_path_factory.mktemp("graph")
    bundle = create_graph(str(gdir), datastore.get_xy("state", stacked=False),
                          n_max_levels=None, hierarchical=False)
    graph = graph_from_bundle(bundle)
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    return datastore, config, graph, args


@pytest.mark.parametrize("scheme", ["psum", "rs", "halo"])
def test_spatial_matches_single_device(setup, scheme):
    datastore, config, graph, args = setup
    mesh = make_mesh(n_data=2, n_space=4)

    ref_model = GraphLAM(args, config, datastore, graph)
    sp_model = SpatialGraphLAM(args, config, datastore, graph, mesh=mesh,
                               scheme=scheme)
    params = ref_model.init_params(jax.random.PRNGKey(0))

    ds = WeatherDataset(datastore, split="train", ar_steps=3)
    batch = tuple(jnp.asarray(b) for b in collate([ds[i] for i in range(2)]))
    init_states, target_states, forcing, _ = batch

    out_ref, _ = jax.jit(ref_model.predict_step)(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    out_sp, _ = jax.jit(sp_model.predict_step)(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_sp), atol=2e-5, rtol=1e-5
    )

    # full rollout loss matches
    l_ref = float(jax.jit(ref_model.training_loss)(params, batch))
    l_sp = float(jax.jit(sp_model.training_loss)(params, batch))
    np.testing.assert_allclose(l_ref, l_sp, rtol=1e-5)

    # gradients flow through the sharded step
    g = jax.jit(jax.grad(sp_model.training_loss))(params, batch)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # grads match the single-device model too
    g_ref = jax.jit(jax.grad(ref_model.training_loss))(params, batch)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )


def test_spatial_output_std(setup):
    datastore, config, graph, _ = setup
    args = ModelArgs(hidden_dim=8, processor_layers=1, output_std=True,
                     loss="nll")
    mesh = make_mesh(n_data=1, n_space=8)
    ref_model = GraphLAM(args, config, datastore, graph)
    sp_model = SpatialGraphLAM(args, config, datastore, graph, mesh=mesh)
    params = ref_model.init_params(jax.random.PRNGKey(1))
    ds = WeatherDataset(datastore, split="train", ar_steps=2)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0]]))
    p_ref, t_ref, s_ref, _ = ref_model.common_step(params, batch)
    p_sp, t_sp, s_sp, _ = sp_model.common_step(params, batch)
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_sp),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_sp),
                               atol=2e-5, rtol=1e-5)


def test_halo_plan_invariants():
    """_build_gather_halo / _build_push_halo reproduce exact gathers and
    segment-sums when the exchange is simulated with plain numpy."""
    from neural_lam_tpu.parallel.spatial import (
        _build_gather_halo,
        _build_push_halo,
    )

    rng = np.random.default_rng(0)
    S, blk = 4, 7
    n_rows = S * blk - 3  # ragged last block
    E = 200
    send = rng.integers(0, n_rows, E)
    # destination shards biased to the sender's neighborhood (like real
    # cut edges) plus a few long-range ones
    dst = np.clip(send // blk + rng.integers(-1, 2, E), 0, S - 1)
    dst[:5] = (send[:5] // blk + 2) % S

    # --- gather halo: simulate [owned ++ imports] tables per shard ---
    plan, send_idx, remap = _build_gather_halo(send, dst, blk, S)
    table = rng.standard_normal((S * blk, 3)).astype(np.float32)
    owned = table.reshape(S, blk, 3)
    # simulate the per-offset ppermute rounds
    imports = np.zeros((S, sum(w for _, w in plan), 3), np.float32)
    base = 0
    for d, w in plan:
        for src in range(S):
            t = src + d
            if 0 <= t < S:
                imports[t, base:base + w] = owned[src][
                    send_idx[src, base:base + w]
                ]
        base += w
    ext = np.concatenate([owned, imports], axis=1)  # (S, blk + X, 3)
    for e in range(E):
        s = int(dst[e])
        owner = min(send[e] // blk, S - 1)
        pos = (send[e] - owner * blk if owner == s
               else remap[s][int(send[e])])
        np.testing.assert_array_equal(ext[s, pos], table[send[e]])

    # --- push halo: compact fold == dense segment-sum ---
    recv = rng.integers(0, n_rows, E)
    src_shard = np.clip(recv // blk + rng.integers(-1, 2, E), 0, S - 1)
    plan_p, push_pos, add_pos, y_tot = _build_push_halo(
        recv, src_shard, blk, S
    )
    vals = rng.standard_normal(E).astype(np.float64)
    # per-shard compact accumulation
    compact = np.zeros((S, blk + y_tot), np.float64)
    for e in range(E):
        s = int(src_shard[e])
        owner = min(recv[e] // blk, S - 1)
        pos = (recv[e] - owner * blk if owner == s
               else push_pos[s][int(recv[e])])
        compact[s, pos] += vals[e]
    # simulate the push rounds + fold
    owned_acc = np.zeros((S, blk + 1), np.float64)  # sentinel row blk
    owned_acc[:, :blk] = compact[:, :blk]
    base = 0
    for d, w in plan_p:
        for src in range(S):
            t = src + d
            if 0 <= t < S:
                seg = compact[src, blk + base:blk + base + w]
                np.add.at(owned_acc[t], add_pos[t, base:base + w], seg)
        base += w
    dense = np.zeros(S * blk, np.float64)
    np.add.at(dense, recv, vals)
    np.testing.assert_allclose(
        owned_acc[:, :blk].reshape(-1), dense, atol=1e-12
    )
