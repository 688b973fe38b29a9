"""Unit tests for the core numerics kit: MLP, interaction net, segment ops.

The reference has no unit tests for InteractionNet math (SURVEY.md §4); we
add them here, including direct parity checks against the torch formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from neural_lam_tpu.ops import (
    apply_mlp,
    init_mlp,
    EdgeSet,
    init_interaction_net,
    apply_interaction_net,
)
from neural_lam_tpu.ops.segment import (
    build_gather_table,
    gather_sum,
    segment_sum,
    segment_mean,
)


def torch_make_mlp(blueprint, layer_norm=True):
    """The reference's MLP recipe (ref: neural_lam/utils.py:191-214)."""
    hidden_layers = len(blueprint) - 2
    layers = []
    for layer_i, (d1, d2) in enumerate(zip(blueprint[:-1], blueprint[1:])):
        layers.append(nn.Linear(d1, d2))
        if layer_i != hidden_layers:
            layers.append(nn.SiLU())
    if layer_norm:
        layers.append(nn.LayerNorm(blueprint[-1]))
    return nn.Sequential(*layers)


def copy_torch_mlp(tm, params):
    """Copy torch Sequential weights into our MLP pytree."""
    li = 0
    for mod in tm:
        if isinstance(mod, nn.Linear):
            params["layers"][li]["w"] = jnp.asarray(mod.weight.detach().numpy().T)
            params["layers"][li]["b"] = jnp.asarray(mod.bias.detach().numpy())
            li += 1
        elif isinstance(mod, nn.LayerNorm):
            params["ln"]["scale"] = jnp.asarray(mod.weight.detach().numpy())
            params["ln"]["bias"] = jnp.asarray(mod.bias.detach().numpy())
    return params


@pytest.mark.parametrize("blueprint,layer_norm", [
    ([7, 16, 16], True),
    ([5, 8], True),
    ([16, 16, 16, 3], False),
])
def test_mlp_torch_parity(blueprint, layer_norm):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    tm = torch_make_mlp(blueprint, layer_norm)
    params = init_mlp(jax.random.PRNGKey(0), blueprint, layer_norm=layer_norm)
    params = copy_torch_mlp(tm, params)
    x = rng.standard_normal((4, 6, blueprint[0])).astype(np.float32)
    out_t = tm(torch.tensor(x)).detach().numpy()
    out_j = np.asarray(apply_mlp(params, jnp.asarray(x)))
    np.testing.assert_allclose(out_t, out_j, atol=1e-5, rtol=1e-5)


def test_segment_sum_and_gather_table_agree():
    rng = np.random.default_rng(1)
    M, N, d = 57, 13, 8
    receivers = np.sort(rng.integers(0, N, M)).astype(np.int32)
    data = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))
    out_seg = segment_sum(data, jnp.asarray(receivers), N)
    table, _ = build_gather_table(receivers, N)
    out_gather = gather_sum(data, jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(out_seg), np.asarray(out_gather),
                               atol=1e-6)
    # reference numpy
    expect = np.zeros((N, d), np.float32)
    np.add.at(expect, receivers, np.asarray(data))
    np.testing.assert_allclose(np.asarray(out_seg), expect, atol=1e-5)


def test_gather_table_unsorted_receivers():
    rng = np.random.default_rng(2)
    M, N, d = 40, 9, 4
    receivers = rng.integers(0, N, M).astype(np.int32)  # unsorted
    data = rng.standard_normal((M, d)).astype(np.float32)
    table, _ = build_gather_table(receivers, N)
    out = np.asarray(gather_sum(jnp.asarray(data), jnp.asarray(table)))
    expect = np.zeros((N, d), np.float32)
    np.add.at(expect, receivers, data)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_segment_mean():
    receivers = np.array([0, 0, 2], dtype=np.int32)
    data = jnp.asarray([[2.0], [4.0], [5.0]])
    out = np.asarray(segment_mean(data, jnp.asarray(receivers), 3))
    np.testing.assert_allclose(out[:, 0], [3.0, 0.0, 5.0])


class TorchInteractionNet(nn.Module):
    """Reference InteractionNet math without PyG
    (ref: neural_lam/interaction_net.py:86-131)."""

    def __init__(self, d, hidden_layers=1, update_edges=True, aggr="sum"):
        super().__init__()
        self.edge_mlp = torch_make_mlp([3 * d] + [d] * (hidden_layers + 1))
        self.aggr_mlp = torch_make_mlp([2 * d] + [d] * (hidden_layers + 1))
        self.update_edges = update_edges
        self.aggr = aggr

    def forward(self, senders, receivers, n_rec, send_rep, rec_rep, edge_rep):
        x_j = send_rep[..., senders, :]
        x_i = rec_rep[..., receivers, :]
        messages = self.edge_mlp(torch.cat((edge_rep, x_j, x_i), dim=-1))
        aggr = torch.zeros_like(rec_rep)
        idx = torch.tensor(receivers, dtype=torch.int64)
        idx_e = idx[None, :, None].expand(messages.shape[0], -1, messages.shape[-1])
        aggr = aggr.scatter_add(-2, idx_e, messages)
        if self.aggr == "mean":
            counts = torch.zeros(n_rec).scatter_add(
                0, idx, torch.ones(len(receivers))
            ).clamp(min=1.0)
            aggr = aggr / counts[None, :, None]
        rec_diff = self.aggr_mlp(torch.cat((rec_rep, aggr), dim=-1))
        rec_out = rec_rep + rec_diff
        if self.update_edges:
            return rec_out, edge_rep + messages
        return rec_out


@pytest.mark.parametrize("aggr", ["sum", "mean"])
def test_interaction_net_torch_parity(aggr):
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    N_send, N_rec, M, d, B = 11, 9, 50, 16, 2
    senders = rng.integers(0, N_send, M)
    receivers = np.sort(rng.integers(0, N_rec, M))
    feats = rng.standard_normal((M, 3)).astype(np.float32)

    tnet = TorchInteractionNet(d, aggr=aggr)
    params = init_interaction_net(jax.random.PRNGKey(0), d)
    params["edge_mlp"] = copy_torch_mlp(tnet.edge_mlp, params["edge_mlp"])
    params["aggr_mlp"] = copy_torch_mlp(tnet.aggr_mlp, params["aggr_mlp"])

    # edges already receiver-sorted so edge_rep rows align 1:1
    es = EdgeSet.from_local(senders, receivers, feats, N_send, N_rec, sort=False)

    send = rng.standard_normal((B, N_send, d)).astype(np.float32)
    rec = rng.standard_normal((B, N_rec, d)).astype(np.float32)
    er = rng.standard_normal((B, M, d)).astype(np.float32)

    out_t, edge_t = tnet(senders, receivers, N_rec, torch.tensor(send),
                         torch.tensor(rec), torch.tensor(er))
    for use_table in (True, False):
        out_j, edge_j = apply_interaction_net(
            params, es, jnp.asarray(send), jnp.asarray(rec), jnp.asarray(er),
            aggr=aggr, use_gather_table=use_table,
        )
        np.testing.assert_allclose(
            out_t.detach().numpy(), np.asarray(out_j), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            edge_t.detach().numpy(), np.asarray(edge_j), atol=2e-5, rtol=1e-4
        )


def test_interaction_net_jit_and_grad():
    rng = np.random.default_rng(4)
    N, M, d = 12, 30, 8
    es = EdgeSet.from_local(
        rng.integers(0, N, M), np.sort(rng.integers(0, N, M)),
        rng.standard_normal((M, 3)), N, N,
    )
    params = init_interaction_net(jax.random.PRNGKey(1), d)
    x = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((M, d)).astype(np.float32))

    @jax.jit
    def loss(p, x, e):
        out, _ = apply_interaction_net(p, es, x, x, e)
        return jnp.sum(out**2)

    g = jax.grad(loss)(params, x, e)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.all(np.isfinite(np.asarray(a))) for a in flat)


def test_edgeset_from_global_rebase():
    # global indices: senders in [100, 110), receivers in [5, 9)
    edge_index = np.array([[103, 100, 107], [8, 5, 5]])
    feats = np.ones((3, 3), np.float32)
    es = EdgeSet.from_global(edge_index, feats)
    assert es.num_send == 8  # max(senders-100)+1 = 7+1
    assert es.num_rec == 4  # max(receivers-5)+1
    # sorted by receiver
    assert np.asarray(es.receivers).tolist() == [0, 0, 3]
    assert np.asarray(es.senders).tolist() == [0, 7, 3]


def test_pallas_edge_tail_interpret():
    """Fused edge-tail kernel vs XLA reference (interpret mode on CPU)."""
    from neural_lam_tpu.ops.pallas_edge import _tail_reference, edge_tail

    rng = np.random.default_rng(7)
    B, Nv, K, h = 2, 128, 8, 64
    M = Nv * K
    x0 = jnp.asarray(rng.standard_normal((B, M, h)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(h), jnp.float32)
    ls = jnp.asarray(rng.standard_normal(h), jnp.float32)
    lb = jnp.asarray(rng.standard_normal(h), jnp.float32)
    mask = jnp.asarray((rng.random((M, 1)) > 0.3).astype(np.float32))

    ref_msg, ref_virt = _tail_reference(x0, w2, b2, ls, lb, mask, K)
    msg, virt = edge_tail(x0, w2, b2, ls, lb, mask, K, True)
    np.testing.assert_allclose(np.asarray(msg), np.asarray(ref_msg), atol=1e-5)
    np.testing.assert_allclose(np.asarray(virt), np.asarray(ref_virt),
                               atol=1e-4)

    def loss(x0, w2):
        m, v = edge_tail(x0, w2, b2, ls, lb, mask, K, True)
        return (m**2).sum() + (v**2).sum()

    def loss_ref(x0, w2):
        m, v = _tail_reference(x0, w2, b2, ls, lb, mask, K)
        return (m**2).sum() + (v**2).sum()

    g1 = jax.grad(loss, argnums=(0, 1))(x0, w2)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x0, w2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-4)


def test_pallas_edge_tail_sum_interpret():
    """Fully-fused static-edge tail kernel (the g2m/m2g TPU hot path) vs
    its XLA reference, forward + custom VJP."""
    from neural_lam_tpu.ops.pallas_edge import _sum_reference, edge_tail_sum

    rng = np.random.default_rng(11)
    B, Nv, K, h = 2, 128, 8, 64
    M = Nv * K
    gathered = jnp.asarray(rng.standard_normal((B, M, h)), jnp.float32)
    ew = jnp.asarray(rng.standard_normal((M, h)), jnp.float32)
    rec_rows = jnp.asarray(rng.standard_normal((B, Nv, h)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, h)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(h), jnp.float32)
    ls = jnp.asarray(rng.standard_normal(h), jnp.float32)
    lb = jnp.asarray(rng.standard_normal(h), jnp.float32)
    mask = jnp.asarray((rng.random((M, 1)) > 0.3).astype(np.float32))

    ref_msg, ref_virt = _sum_reference(gathered, ew, rec_rows, w2, b2, ls,
                                       lb, mask, K)
    msg, virt = edge_tail_sum(gathered, ew, rec_rows, w2, b2, ls, lb, mask,
                              K, True)
    np.testing.assert_allclose(np.asarray(msg), np.asarray(ref_msg),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(virt), np.asarray(ref_virt),
                               atol=1e-4)

    # with_messages=False returns only the aggregation
    none_msg, virt2 = edge_tail_sum(gathered, ew, rec_rows, w2, b2, ls, lb,
                                    mask, K, True, False)
    assert none_msg is None
    np.testing.assert_allclose(np.asarray(virt2), np.asarray(ref_virt),
                               atol=1e-4)

    def loss(gathered, ew, rec_rows, w2):
        m, v = edge_tail_sum(gathered, ew, rec_rows, w2, b2, ls, lb, mask,
                             K, True)
        return (m**2).sum() + (v**2).sum()

    def loss_ref(gathered, ew, rec_rows, w2):
        m, v = _sum_reference(gathered, ew, rec_rows, w2, b2, ls, lb, mask, K)
        return (m**2).sum() + (v**2).sum()

    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(gathered, ew, rec_rows, w2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(gathered, ew, rec_rows, w2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-4)


def test_dense_interaction_net_with_pallas_interpret(monkeypatch):
    """apply_interaction_net fused path (interpret) == plain dense path."""
    import neural_lam_tpu.ops.message_passing as mp

    rng = np.random.default_rng(9)
    N_send, N_rec, M, d, B = 40, 30, 300, 64, 2
    senders = rng.integers(0, N_send, M)
    receivers = rng.integers(0, N_rec, M)
    feats = rng.standard_normal((M, 3)).astype(np.float32)
    es = EdgeSet.from_local(senders, receivers, feats, N_send, N_rec,
                            dense=True)
    params = init_interaction_net(jax.random.PRNGKey(2), d)
    send = jnp.asarray(rng.standard_normal((B, N_send, d)), jnp.float32)
    rec = jnp.asarray(rng.standard_normal((B, N_rec, d)), jnp.float32)
    er = jnp.asarray(rng.standard_normal((B, es.num_edges, d)), jnp.float32)

    monkeypatch.setattr(mp, "_PALLAS_MODE", "off")
    o_plain, e_plain = apply_interaction_net(params, es, send, rec, er)
    monkeypatch.setattr(mp, "_PALLAS_MODE", "interpret")
    o_fused, e_fused = apply_interaction_net(params, es, send, rec, er)
    monkeypatch.setattr(mp, "_PALLAS_MODE", None)
    np.testing.assert_allclose(np.asarray(o_plain), np.asarray(o_fused),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(e_plain), np.asarray(e_fused),
                               atol=1e-4, rtol=1e-4)
