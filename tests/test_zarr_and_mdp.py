"""Native zarr reader roundtrips + MDP datastore over a synthetic zarr."""

import numpy as np
import pytest

from neural_lam_tpu.dataset import WeatherDataset
from neural_lam_tpu.datastore.mdp import MDPDatastore
from neural_lam_tpu.datastore.zarr_reader import (
    ZarrGroup,
    consolidate_metadata,
    decode_cf_time,
    write_zarr_array,
)

from .mdp_fixture import NX, NY, N_T, N_STATE, make_mdp_dataset


@pytest.mark.parametrize("compressor", [
    None,
    {"id": "zlib", "level": 5},
    {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    {"id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2},
])
def test_zarr_roundtrip(tmp_path, compressor):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(11, 7, 3)).astype(np.float32)
    write_zarr_array(tmp_path, "a", arr, dims=["t", "g", "f"],
                     chunks=[4, 7, 3], compressor=compressor)
    consolidate_metadata(tmp_path)
    g = ZarrGroup(tmp_path)
    out = g["a"].read_full()
    np.testing.assert_array_equal(out, arr)
    assert g["a"].dims == ("t", "g", "f")
    # partial leading-axis reads touch only relevant chunks
    np.testing.assert_array_equal(g["a"].read_slice0(3, 9), arr[3:9])
    np.testing.assert_array_equal(g["a"][5], arr[5])
    np.testing.assert_array_equal(g["a"][2:5], arr[2:5])


def test_zarr_string_and_datetime_roundtrip(tmp_path):
    names = np.array(["alpha", "beta", "gamma"], dtype=object)
    write_zarr_array(tmp_path, "names", names, dims=["f"], compressor=None)
    times = np.datetime64("2021-06-01T03", "ns") + np.arange(
        5
    ) * np.timedelta64(1, "h")
    write_zarr_array(tmp_path, "time", times, dims=["time"])
    consolidate_metadata(tmp_path)
    g = ZarrGroup(tmp_path)
    assert [str(s) for s in g["names"].read_full()] == ["alpha", "beta", "gamma"]
    t = decode_cf_time(g["time"].read_full(), g["time"].attrs["units"])
    np.testing.assert_array_equal(t, times)


@pytest.fixture(scope="module")
def mdp(tmp_path_factory):
    root = tmp_path_factory.mktemp("mdp")
    config_path = make_mdp_dataset(root)
    return MDPDatastore(config_path=config_path, n_boundary_points=2)


def test_mdp_metadata(mdp):
    assert mdp.get_vars_names("state") == [f"state_var_{i}" for i in range(3)]
    assert mdp.get_num_data_vars("forcing") == 2
    assert mdp.step_length == 3
    assert mdp.grid_shape_state.x == NX
    assert mdp.grid_shape_state.y == NY
    assert mdp.num_grid_points == NX * NY
    assert mdp.coords_projection["name"] == "LambertConformal"


def test_mdp_dataarrays_and_splits(mdp):
    da = mdp.get_dataarray("state", "train")
    assert da.dims == ("time", "grid_index", "state_feature")
    assert da.shape == (18, NX * NY, N_STATE)
    da_val = mdp.get_dataarray("state", "val")
    assert da_val.shape[0] == 6
    da_test = mdp.get_dataarray("state", "test")
    assert da_test.shape[0] == 6
    static = mdp.get_dataarray("static", None)
    assert static.dims == ("grid_index", "static_feature")
    # lazy slicing matches full read
    full = np.asarray(da.data[:])
    np.testing.assert_array_equal(da.isel(time=slice(2, 9)).values, full[2:9])


def test_mdp_boundary_and_stats(mdp):
    mask = mdp.boundary_mask.values
    assert mask.shape == (NX * NY,)
    m2 = mask.reshape(NX, NY)
    assert np.all(m2[:2, :] == 1) and np.all(m2[-2:, :] == 1)
    assert np.all(m2[2:-2, 2:-2] == 0)
    stats = mdp.get_standardization_dataarray("state")
    for k in ("state_mean", "state_std", "state_diff_mean", "state_diff_std"):
        assert stats[k].shape == (N_STATE,)
    fstats = mdp.get_standardization_dataarray("forcing")
    assert fstats["forcing_mean"].shape == (2,)


def test_mdp_weather_dataset_and_model(mdp, tmp_path):
    import jax
    import jax.numpy as jnp

    from neural_lam_tpu.config import (
        DatastoreSelection, NeuralLAMConfig, TrainingConfig,
    )
    from neural_lam_tpu.dataset import collate
    from neural_lam_tpu.graph.build import create_graph
    from neural_lam_tpu.graph.storage import graph_from_bundle
    from neural_lam_tpu.models import MODELS
    from neural_lam_tpu.models.ar_model import ModelArgs

    ds = WeatherDataset(mdp, split="train", ar_steps=3)
    init_states, target_states, forcing, times = ds[0]
    assert init_states.shape == (2, NX * NY, N_STATE)
    assert forcing.shape == (3, NX * NY, 2 * 3)

    graph = graph_from_bundle(create_graph(
        str(tmp_path / "g"), mdp.get_xy("state", stacked=False),
        n_max_levels=1, hierarchical=False,
    ))
    config = NeuralLAMConfig(
        datastore=DatastoreSelection(kind="mdp", config_path=""),
        training=TrainingConfig(),
    )
    model = MODELS["graph_lam"](
        ModelArgs(hidden_dim=4, processor_layers=1), config, mdp, graph
    )
    params = model.init_params(jax.random.PRNGKey(0))
    batch = tuple(jnp.asarray(b) for b in collate([ds[0]]))
    assert np.isfinite(float(model.training_loss(params, batch)))


def test_registry_and_config_loading(tmp_path):
    """init_datastore + load_config_and_datastore end-to-end (mdp kind)."""
    import yaml

    from neural_lam_tpu.config import load_config_and_datastore

    config_path = make_mdp_dataset(tmp_path / "store")
    nl_config = {
        "datastore": {"kind": "mdp", "config_path": str(config_path)},
        "training": {
            "state_feature_weighting": {
                "__config_class__": "ManualStateFeatureWeighting",
                "weights": {f"state_var_{i}": 1.0 for i in range(3)},
            }
        },
    }
    nl_path = tmp_path / "config.yaml"
    with open(nl_path, "w") as f:
        yaml.safe_dump(nl_config, f)
    config, datastore = load_config_and_datastore(nl_path)
    assert datastore.SHORT_NAME == "mdp"
    from neural_lam_tpu.loss_weighting import get_state_feature_weighting

    w = get_state_feature_weighting(config, datastore)
    assert w == [1.0, 1.0, 1.0]


def test_native_chunk_decoder(tmp_path):
    """C++ parallel chunk decoder matches Python decode paths."""
    from neural_lam_tpu.native import get_lib

    rng = np.random.default_rng(5)
    arr = rng.normal(size=(32, 16, 4)).astype(np.float32)
    for comp in [None, {"id": "zlib", "level": 5},
                 {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1}]:
        sub = tmp_path / (comp["id"] if comp else "raw")
        sub.mkdir()
        write_zarr_array(sub, "a", arr, dims=["t", "g", "f"],
                         chunks=[4, 16, 4], compressor=comp)
        consolidate_metadata(sub)
        g = ZarrGroup(sub)
        out = g["a"].read_full()  # batch path (8 chunks)
        np.testing.assert_array_equal(out, arr)
    # the native library itself should have built on this machine
    assert get_lib() is not None, "native chunk decoder failed to build"


def test_pooled_loader_matches_sync(mdp):
    """num_workers>1 thread-pool loading (with chunk-cache in-flight dedup)
    yields byte-identical batches in the same order as synchronous."""
    from neural_lam_tpu.dataset import WeatherDataLoader

    wds = WeatherDataset(mdp, split="train", ar_steps=2)
    sync = WeatherDataLoader(wds, batch_size=3, shuffle=True, seed=5,
                             prefetch=0)
    pooled = WeatherDataLoader(wds, batch_size=3, shuffle=True, seed=5,
                               num_workers=4)
    for ep in range(2):
        sync.set_epoch(ep)
        pooled.set_epoch(ep)
        for bs, bp in zip(sync, pooled, strict=True):
            for a, b in zip(bs, bp):
                np.testing.assert_array_equal(a, b)


def test_loader_direct_write_matches_getitem(mdp):
    """The loader's single-copy batch fill (WeatherDataset.write_item into
    preallocated rows) is bit-identical to stacking __getitem__ samples,
    for standardize on/off and serial/pooled iteration."""
    from neural_lam_tpu.dataset import WeatherDataLoader, collate

    for standardize in (True, False):
        wds = WeatherDataset(mdp, split="train", ar_steps=2,
                             standardize=standardize)
        for num_workers in (0, 3):
            loader = WeatherDataLoader(wds, batch_size=3, shuffle=True,
                                       seed=11, num_workers=num_workers)
            for idxs, batch in zip(loader._batch_indices(), loader,
                                   strict=True):
                ref = collate([wds[int(i)] for i in idxs])
                for a, r in zip(batch, ref, strict=True):
                    assert a.dtype == r.dtype
                    np.testing.assert_array_equal(a, r)


def test_chunk_cache_returns_consistent_data(tmp_path):
    """Cached reads equal uncached reads; cache respects its byte budget."""
    from neural_lam_tpu.datastore import zarr_reader

    rng = np.random.default_rng(3)
    arr = rng.normal(size=(16, 40, 3)).astype(np.float32)
    write_zarr_array(tmp_path, "a", arr, dims=["t", "g", "f"],
                     chunks=[2, 40, 3])
    consolidate_metadata(tmp_path)
    old = zarr_reader._chunk_cache
    try:
        zarr_reader._chunk_cache = zarr_reader._ChunkCache(10_000)  # tiny
        g = ZarrGroup(tmp_path)
        np.testing.assert_array_equal(g["a"].read_slice0(3, 11), arr[3:11])
        np.testing.assert_array_equal(g["a"].read_slice0(3, 11), arr[3:11])
        assert zarr_reader._chunk_cache._bytes <= 10_000
        zarr_reader._chunk_cache = zarr_reader._ChunkCache(0)  # disabled
        g2 = ZarrGroup(tmp_path)
        np.testing.assert_array_equal(g2["a"].read_slice0(0, 16), arr)
    finally:
        zarr_reader._chunk_cache = old
