"""Ensemble sampling + CRPS evaluation on an output_std model."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_lam_tpu.config import (
    DatastoreSelection, NeuralLAMConfig, TrainingConfig,
)
from neural_lam_tpu.dataset import WeatherDataset, collate
from neural_lam_tpu.datastore.dummy import DummyDatastore
from neural_lam_tpu.ensemble import (
    crps_ensemble,
    evaluate_ensemble,
    rank_histogram,
    sample_rollout,
    spread_skill_ratio,
)
from neural_lam_tpu.graph.build import create_graph
from neural_lam_tpu.graph.storage import graph_from_bundle
from neural_lam_tpu.models import MODELS
from neural_lam_tpu.models.ar_model import ModelArgs


def test_ensemble_rollout_and_metrics(tmp_path):
    datastore = DummyDatastore(n_points_1d=10, n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    graph = graph_from_bundle(create_graph(
        str(tmp_path / "g"), datastore.get_xy("state", stacked=False),
        n_max_levels=1, hierarchical=False,
    ))
    args = ModelArgs(hidden_dim=8, processor_layers=1, output_std=True,
                     loss="nll")
    model = MODELS["graph_lam"](args, config, datastore, graph)
    params = model.init_params(jax.random.PRNGKey(0))

    ds = WeatherDataset(datastore, split="train", ar_steps=3)
    batch = tuple(jnp.asarray(b) for b in collate([ds[0], ds[1]]))
    init_states, target_states, forcing, _ = batch
    B, T, N, d = target_states.shape
    m = 4

    ens = sample_rollout(model, params, init_states, forcing, target_states,
                         jax.random.PRNGKey(1), n_members=m)
    assert ens.shape == (B, m, T, N, d)
    assert np.all(np.isfinite(np.asarray(ens)))
    # members differ in the interior
    interior = np.asarray(model.interior_mask_bool())
    spread = np.asarray(ens.std(axis=1))[:, :, interior]
    assert spread.max() > 0
    # boundary members identical (forced)
    boundary_spread = np.asarray(ens.std(axis=1))[:, :, ~interior]
    np.testing.assert_allclose(boundary_spread, 0.0, atol=1e-6)

    out = evaluate_ensemble(model, params, batch, jax.random.PRNGKey(2),
                            n_members=m)
    for k in ("crps", "ens_rmse", "spread", "ens_var", "ens_se", "ssr"):
        assert out[k].shape == (T,)
        assert np.all(np.isfinite(np.asarray(out[k])))
    # rank-histogram counts cover exactly the interior points x vars
    assert out["rank_hist"].shape == (T, m + 1)
    n_interior = int(np.asarray(model.interior_mask_bool()).sum())
    np.testing.assert_allclose(
        np.asarray(out["rank_hist"]).sum(axis=-1), n_interior * d, rtol=1e-6
    )

    # per-sample variant (used by the Trainer to drop padded tail samples)
    # averages back to the default output
    out_ps = evaluate_ensemble(model, params, batch, jax.random.PRNGKey(2),
                               n_members=m, per_sample=True)
    for k in ("crps", "ens_rmse", "spread"):
        assert out_ps[k].shape == (B, T)
        np.testing.assert_allclose(np.asarray(out_ps[k].mean(axis=0)),
                                   np.asarray(out[k]), rtol=1e-5)

    # CRPS of a deterministic (m=1) ensemble equals masked MAE
    one = ens[:, :1]
    crps1 = crps_ensemble(one, target_states,
                          mask=model.interior_mask_bool())
    from neural_lam_tpu.metrics import mae

    mae_val = mae(one[:, 0], target_states, None,
                  mask=model.interior_mask_bool())
    np.testing.assert_allclose(np.asarray(crps1), np.asarray(mae_val),
                               rtol=1e-5)


def test_crps_sorted_matches_pairwise():
    """The O(m log m) sorted spread identity equals the O(m^2) pairwise
    definition sum_{i,j}|x_i - x_j| / (2 m (m-1))."""
    key = jax.random.PRNGKey(3)
    B, m, T, N, d = 2, 6, 2, 30, 3
    k1, k2 = jax.random.split(key)
    ens = jax.random.normal(k1, (B, m, T, N, d))
    target = jax.random.normal(k2, (B, T, N, d))

    got = crps_ensemble(ens, target)
    skill = jnp.abs(ens - target[:, None]).mean(axis=1)
    diffs = jnp.abs(ens[:, :, None] - ens[:, None, :])
    spread = diffs.sum(axis=(1, 2)) / (2.0 * m * (m - 1))
    from neural_lam_tpu.metrics import mask_and_reduce_metric

    want = mask_and_reduce_metric(skill - spread, None, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_rank_histogram_and_ssr_calibrated():
    """Members and target iid from the same Gaussian -> uniform ranks,
    spread-skill ratio ~ 1 (the defining property of both diagnostics)."""
    key = jax.random.PRNGKey(0)
    B, m, T, N, d = 2, 7, 3, 400, 2
    k1, k2 = jax.random.split(key)
    ens = jax.random.normal(k1, (B, m, T, N, d))
    target = jax.random.normal(k2, (B, T, N, d))

    hist = rank_histogram(ens, target)
    assert hist.shape == (B, T, m + 1)
    freq = np.asarray(hist).sum(axis=(0, 1))
    freq = freq / freq.sum()
    # ~4800 counts per bin; uniform to a few percent
    np.testing.assert_allclose(freq, 1.0 / (m + 1), atol=0.02)

    mean = ens.mean(axis=1)
    var = (ens.var(axis=1, ddof=1)).mean()
    se = jnp.square(mean - target).mean()
    ssr = spread_skill_ratio(var, se, m)
    np.testing.assert_allclose(ssr, 1.0, atol=0.05)

    # an under-dispersed ensemble is flagged: shrink members toward their
    # mean -> U-shaped histogram edges and ssr << 1
    shrunk = mean[:, None] + 0.2 * (ens - mean[:, None])
    ssr_lo = spread_skill_ratio(
        shrunk.var(axis=1, ddof=1).mean(),
        jnp.square(shrunk.mean(axis=1) - target).mean(), m,
    )
    assert float(ssr_lo) < 0.5
    h2 = np.asarray(rank_histogram(shrunk, target)).sum(axis=(0, 1))
    assert h2[0] + h2[-1] > 2.5 * (h2.sum() / (m + 1))

    # masking: only masked-in points are counted
    mask = jnp.zeros((N,), bool).at[:100].set(True)
    hm = rank_histogram(ens, target, mask=mask)
    np.testing.assert_allclose(np.asarray(hm).sum(axis=-1), 100 * d)


def test_trainer_ensemble_eval(tmp_path):
    from neural_lam_tpu.dataset import WeatherDataModule
    from neural_lam_tpu.parallel.mesh import make_mesh
    from neural_lam_tpu.train import Trainer, TrainFlags

    datastore = DummyDatastore(n_points_1d=10, n_timesteps=40)
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="dummydata", config_path=""),
        training=TrainingConfig(),
    )
    graph = graph_from_bundle(create_graph(
        str(tmp_path / "g"), datastore.get_xy("state", stacked=False),
        n_max_levels=1, hierarchical=False,
    ))
    args = ModelArgs(hidden_dim=4, processor_layers=1, output_std=True,
                     loss="nll", val_steps_to_log=(1,))
    model = MODELS["graph_lam"](args, config, datastore, graph)
    dm = WeatherDataModule(datastore, ar_steps_eval=2, batch_size=2)
    trainer = Trainer(model, TrainFlags(batch_size=2),
                      run_dir=tmp_path / "run",
                      mesh=make_mesh(n_data=1, n_space=1))
    params, _ = trainer.init_state()
    out = trainer.evaluate_ensemble(dm, params, n_members=3)
    assert "crps" in out and len(out["crps"]) == 2
    assert np.all(np.isfinite(out["crps"]))
    assert len(out["ssr"]) == 2 and np.all(np.isfinite(out["ssr"]))
    freq = np.asarray(out["rank_hist"])  # (T, m+1), normalized
    assert freq.shape == (2, 4)
    np.testing.assert_allclose(freq.sum(axis=-1), 1.0, rtol=1e-6)
    assert (tmp_path / "run" / "ens_rank_hist.npy").exists()
    assert (tmp_path / "run" / "ens_rank_hist.png").exists()
