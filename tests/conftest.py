"""Test harness setup.

The test environment boots python with an `axon` TPU PJRT plugin registered
from sitecustomize and `JAX_PLATFORMS=axon` pinned, which (a) grabs the
single real TPU chip and (b) cannot be switched to CPU after interpreter
start. Tests need a *virtual 8-device CPU mesh* (deterministic fp32 numerics
+ multi-device sharding tests without hardware), so `pytest_configure`
re-launches pytest once in a cleaned environment before any test imports
jax. Capture is suspended around the child so its output flows through.
"""

import os
import subprocess
import sys

import pytest

_MARK = "_NLT_CPU_REEXEC"

# Test tiers: everything that costs >~15s on this 4-vcpu box is marked
# `slow` here (one central list instead of scattered decorators), so
# `pytest -m "not slow"` is the fast tier (<5 min, still ~200 tests
# covering every subsystem) and the full suite runs nightly / pre-merge.
# Redundancy rule: a test is only listed if a faster test keeps its
# subsystem covered in the fast tier.
SLOW_TESTS = {
    # interpret-mode Pallas is ~1000x device speed; these run full
    # sharded models through it with grads
    "test_flat_ops.py::test_grid_sharded_flat_matches[rs]",
    "test_flat_ops.py::test_grid_sharded_flat_matches[grid]",
    "test_flat_ops.py::test_hierarchical_flat_predict[hi_lam]",
    "test_flat_ops.py::test_hierarchical_flat_predict[hi_lam_parallel]",
    "test_flat_ops.py::test_graph_lam_flat_predict",
    "test_flat_ops.py::test_decode_fused_gather_matches",
    "test_flat_ops.py::test_analytic_bwd_kernels_match_vjp",
    # hierarchical / latent sharded-vs-unsharded allclose (graph_lam:halo
    # and :rs stay fast — they guard the overlap split path)
    "test_grid_sharded.py::test_grid_sharded_matches[graph_lam]",
    "test_grid_sharded.py::test_grid_sharded_matches[hi_lam]",
    "test_grid_sharded.py::test_grid_sharded_matches[hi_lam:rs]",
    "test_grid_sharded.py::test_grid_sharded_matches[hi_lam:halo]",
    "test_grid_sharded.py::test_grid_sharded_matches[hi_lam_parallel]",
    "test_grid_sharded.py::test_grid_sharded_matches[hi_lam_parallel:rs]",
    "test_grid_sharded.py::test_grid_sharded_matches[hi_lam_parallel:halo]",
    "test_grid_sharded.py::test_latent_sharded_matches[hi_efm:halo]",
    "test_grid_sharded.py::test_latent_sharded_matches[graph_efm:halo]",
    "test_grid_sharded.py::test_latent_sharded_matches[graph_efm:grid]",
    "test_grid_sharded.py::test_latent_sharded_matches[hi_efm:grid]",
    "test_grid_sharded.py::test_latent_sharded_matches[graph_efm:rs]",
    "test_grid_sharded.py::test_compiled_schedule_overlap",
    # multi-process jax.distributed launches
    "test_multihost.py::test_two_process_train_matches_single",
    "test_multihost.py::test_two_process_spatial_halo_matches_single",
    "test_multihost.py::test_zero_eval_batch_host_does_not_deadlock",
    # end-to-end training CLIs / global mesh
    "test_global_mesh.py::test_prob_model_global",
    "test_graph_efm.py::test_train_cli_graph_efm",
    "test_graph_efm.py::test_hi_efm_elbo_and_sampling",
    "test_graph_efm.py::test_elbo_training_loss_and_grads",
    "test_preemption.py::test_sigterm_saves_last_and_resumes",
    "test_cli.py::test_train_cli_spatial_shards",
    # spatial.py demo schemes (halo stays fast)
    "test_spatial.py::test_spatial_matches_single_device[rs]",
    "test_spatial.py::test_spatial_matches_single_device[psum]",
    "test_models.py::test_model_forward_rollout_grad[hi_lam]",
    "test_models.py::test_model_forward_rollout_grad[hi_lam_parallel]",
    "test_models.py::test_graph_lam_predict_interpret_vs_off",
    "test_flat_ops.py::test_precomputed_consts_match",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get(_MARK) != "1":
        return
    for item in items:
        # item.nodeid is like "tests/test_x.py::test_y[param]"
        nid = item.nodeid.split("/")[-1]
        if nid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


def pytest_configure(config):
    if os.environ.get(_MARK) == "1":
        # Child: make numerics deterministic / torch-comparable.
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env[_MARK] = "1"
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    ret = subprocess.call([sys.executable, "-m", "pytest"] + sys.argv[1:], env=env)
    os._exit(ret)
