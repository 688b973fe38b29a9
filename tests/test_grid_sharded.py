"""Grid-sharded wrapper: every model family matches its unsharded self."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_lam_tpu.config import (
    DatastoreSelection, NeuralLAMConfig, TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs
from neural_lam_tpu.parallel.grid_sharded import spatialize
from neural_lam_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    datastore = DummyDatastore(grid_shape=(30, 28), n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    gd = tmp_path_factory.mktemp("graphs")
    flat = graph_from_bundle(create_graph(
        str(gd / "flat"), datastore.get_xy("state", stacked=False),
        n_max_levels=None, hierarchical=False,
    ))
    hier = graph_from_bundle(create_graph(
        str(gd / "hier"), datastore.get_xy("state", stacked=False),
        n_max_levels=2, hierarchical=True,
    ))
    return datastore, config, flat, hier


@pytest.mark.parametrize("model_name", ["graph_lam", "hi_lam",
                                        "hi_lam_parallel", "graph_lam:rs",
                                        "hi_lam:rs", "hi_lam_parallel:rs",
                                        "graph_lam:halo", "hi_lam:halo",
                                        "hi_lam_parallel:halo"])
def test_grid_sharded_matches(model_name, env):
    datastore, config, flat, hier = env
    model_name, _, variant = model_name.partition(":")
    graph = flat if model_name == "graph_lam" else hier
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=2)
    model = MODELS[model_name](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=2, n_space=4)
    if variant:
        from neural_lam_tpu.parallel.grid_sharded import spatialize_rs

        sp = spatialize_rs(model, mesh, halo=variant == "halo")
    else:
        sp = spatialize(model, mesh)

    ds = WeatherDataset(datastore, split="train", ar_steps=3)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))
    init_states, target_states, forcing, _ = batch

    out_ref, _ = jax.jit(model.predict_step)(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    out_sp, _ = jax.jit(sp.predict_step)(
        params, init_states[:, 1], init_states[:, 0], forcing[:, 0]
    )
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_sp),
                               atol=2e-5, rtol=1e-5)

    l_ref = float(jax.jit(model.training_loss)(params, batch))
    l_sp = float(jax.jit(sp.training_loss)(params, batch))
    np.testing.assert_allclose(l_ref, l_sp, rtol=1e-5)

    g_ref = jax.jit(jax.grad(model.training_loss))(params, batch)
    g_sp = jax.jit(jax.grad(sp.training_loss))(params, batch)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=2e-3)


def test_split_sets_structure(env):
    """Overlap guarantee, structurally: rs/halo builds split every
    receiver-owned edge set into an INTERIOR set whose sender index space
    is exactly the owned block — so the interior edge kernel CANNOT read
    the import collective's output — plus a FRONTIER set carrying the
    remaining edges. Conservation: interior + frontier real edges ==
    original chunk edges. A regression here (e.g. a builder change that
    silently stops splitting) would serialize the collectives again."""
    from neural_lam_tpu.parallel.grid_sharded import build_rs_shard

    datastore, config, flat, hier = env
    S = 4

    def real_count(es, s):
        return int(np.asarray(es.mask[s, :, 0]).sum())

    def max_real_sender(es, s):
        m = np.asarray(es.mask[s, :, 0]) > 0
        snd = np.asarray(es.senders[s])[m]
        return int(snd.max()) if snd.size else -1

    # rs scheme, flat graph: m2m[0] split; frontier indexes the padded
    # all-gathered table
    grid_static = np.zeros((flat.num_grid_nodes, 1), np.float32)
    part = build_rs_shard(flat, S, grid_static)
    m2m0 = part.m2m[0]
    assert m2m0.frontier is not None
    assert m2m0.num_send == part.mblock
    orig = flat.m2m[0]
    orig_real = int(np.asarray(orig.mask[:, 0]).sum()) if orig.dense_k \
        else orig.num_edges
    total = 0
    for s in range(S):
        assert max_real_sender(m2m0, s) < part.mblock
        total += real_count(m2m0, s) + real_count(m2m0.frontier, s)
    assert total == orig_real
    assert m2m0.frontier.num_send == part.mblock * S

    # halo scheme, hierarchical graph: every set with a nonempty plan is
    # split; interior sender space == the sender level's owned block and
    # the frontier indexes the import buffer (width = sum of plan widths)
    part_h = build_rs_shard(hier, S, grid_static, halo=True)
    mblocks = [-(-n // S) for n in hier.level_sizes]
    checked = 0
    for kind, sets, plans, own_of in (
        ("m2m", part_h.m2m, part_h.mm_plans, lambda l: mblocks[l]),
        ("up", part_h.up, part_h.up_plans, lambda l: mblocks[l]),
        ("down", part_h.down, part_h.down_plans,
         lambda l: mblocks[l + 1]),
    ):
        for l, es in enumerate(sets):
            if not plans[l]:
                assert es.frontier is None
                continue
            own = own_of(l)
            width = sum(w for _, w in plans[l])
            assert es.frontier is not None, (kind, l)
            assert es.num_send == own
            assert es.frontier.num_send == width
            for s in range(S):
                assert max_real_sender(es, s) < own
                assert max_real_sender(es.frontier, s) < width
            checked += 1
    assert checked >= 2, "expected split sets in the hierarchical halo"


@pytest.mark.parametrize("model_name", ["graph_efm:halo", "hi_efm:halo",
                                        "graph_efm:grid", "hi_efm:grid",
                                        "graph_efm:rs"])
def test_latent_sharded_matches(model_name, env):
    """Latent-variable families under the sharded schemes: with a FIXED
    eps draw and the per-step target in ctx, the sharded predict output,
    the KL side channel and parameter gradients all match the unsharded
    model (the posterior conditioning runs inside the shard body; eps
    rides the owned level-0 rows under halo, replicated under grid)."""
    from neural_lam_tpu.parallel.grid_sharded import spatialize_rs

    datastore, config, flat, hier = env
    model_name, _, scheme = model_name.partition(":")
    graph = flat if model_name == "graph_efm" else hier
    args = ModelArgs(hidden_dim=8, hidden_layers=1, processor_layers=1,
                     latent_dim=4)
    model = MODELS[model_name](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=2, n_space=4)
    if scheme in ("halo", "rs"):
        sp = spatialize_rs(model, mesh, halo=scheme == "halo")
    else:
        sp = spatialize(model, mesh)

    nm = model.latent_num_nodes
    nm_pad = getattr(sp, "_latent_rows", nm)
    B, n = 2, datastore.num_grid_points
    d = datastore.get_num_data_vars("state")
    d_f = datastore.get_num_data_vars("forcing") * 3
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    pprev = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    forc = jnp.asarray(rng.standard_normal((B, n, d_f)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((B, n, d)), jnp.float32)
    eps_pad = jnp.asarray(
        rng.standard_normal((B, nm_pad, args.latent_dim)), jnp.float32
    )

    def run(m, eps):
        def f(p):
            ctx = m.precompute_rollout_ctx(p)
            ctx_t = {**ctx, "latent_eps": eps, "latent_target": target}
            out, _ = m.predict_step(p, prev, pprev, forc, ctx=ctx_t)
            kl = ctx_t["_latent_kl"][:, :nm]
            return out, kl

        # scalar loss mixing both outputs so grads flow through the
        # prediction AND the KL side channel in one trace
        def loss(p):
            o, k = f(p)
            return (o**2).mean() + k.mean(), (o, k)

        (_, (out, kl)), g = jax.jit(
            jax.value_and_grad(loss, has_aux=True)
        )(params)
        return np.asarray(out), np.asarray(kl), g

    out_u, kl_u, g_u = run(model, eps_pad[:, :nm])
    out_s, kl_s, g_s = run(sp, eps_pad)

    np.testing.assert_allclose(out_u, out_s, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(kl_u, kl_s, atol=2e-5, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_u),
                    jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=2e-3)

    # the full ELBO training loss (scan + per-step rng + KL slicing)
    # composes through the sharded wrapper and stays finite
    T = 2
    batch = (
        jnp.stack([pprev, prev], axis=1),
        jnp.asarray(rng.standard_normal((B, T, n, d)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, T, n, d_f)), jnp.float32),
        jnp.zeros((B, T), jnp.int32),
    )
    l_sp = float(jax.jit(sp.training_loss)(params, batch))
    assert np.isfinite(l_sp)
    g = jax.jit(jax.grad(sp.training_loss))(params, batch)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_compiled_schedule_overlap():
    """The collective/compute overlap is verified from the COMPILED TPU
    schedule, not assumed: AOT-compile the sharded predict step against
    a real v5e-8 topology (no devices needed) and check that XLA's
    latency-hiding scheduler actually hoists the halo ppermute starts
    above the interior compute (docs/SCALING.md round-5 section). Also
    pins the rs finding — its sender all-gathers compile SYNCHRONOUSLY
    on this toolchain (SCHEDULE_ALPHA['rs'] = 0); if a toolchain update
    flips that, this test fails and the scaling model should be
    re-derived."""
    pytest.importorskip("jax.experimental.topologies")
    from neural_lam_tpu.parallel.schedule_check import (
        analyze_collective_overlap,
        compile_sharded_hlo,
    )

    try:
        hlo = compile_sharded_hlo(scheme="halo", grid_shape=(134, 119),
                                  hidden_dim=64, processor_layers=4)
    except Exception as e:  # no libtpu compiler in this environment
        pytest.skip(f"TPU topology AOT compile unavailable: {e}")

    r = analyze_collective_overlap(hlo)
    # every ppermute is async on TPU, and all but a trailing tiny
    # exchange enclose real compute between start and done
    assert r["pairs"] >= 20
    unhidden = [d for d in r["details"] if d["enclosed_ops"] == 0]
    assert len(unhidden) <= 1
    # the byte-model hide estimate saturates for the enclosed pairs
    assert r["hide_mean"] >= 0.9

    hlo_rs = compile_sharded_hlo(scheme="rs", grid_shape=(134, 119),
                                 hidden_dim=64, processor_layers=4)
    assert hlo_rs.count("all-gather(") > 0        # sync all-gathers
    assert hlo_rs.count("all-gather-start(") == 0  # no async pairs
