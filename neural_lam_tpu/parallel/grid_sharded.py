"""Grid-sharded execution of ANY model family (graph_lam / hi_lam /
hi_lam_parallel) over the mesh `space` axis.

Complementary to `parallel/spatial.py` (a hand-optimized GraphLAM with
partitioned m2m edges): here the scheme is *grid-sharded, mesh-replicated* —

- grid nodes live in contiguous blocks per shard; grid-side compute (the
  dominant FLOPs) is fully local;
- g2m edges are partitioned by their sender's grid block; each shard's
  partial aggregation into the (small, replicated) mesh is combined with
  ONE psum per predict step;
- m2g edges are partitioned by their receiver's grid block — local given
  replicated mesh representations;
- mesh-level EDGE work (m2m / up / down at every level — the dominant
  processor FLOPs, ~8 edges/node) is partitioned into balanced per-shard
  edge chunks; each shard's partial aggregation is combined with one psum
  per GNN application (HiLAMParallel: one psum per level per layer). Mesh
  NODE state stays replicated — the aggr-MLP rows are recomputed on every
  shard, bounding the replicated fraction near 1/(1+mean_degree) ≈ 1/9 of
  processor FLOPs (see docs/SCALING.md for the comm-volume model).

`spatialize(model, mesh)` returns a copy of the model whose predict_step
runs under shard_map — rollout, loss, training and eval code paths are
inherited unchanged, and the wrapped model stays numerically identical to
the original (tested allclose incl. gradients).
"""

from __future__ import annotations

import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.storage import LoadedGraph
from ..ops.message_passing import EdgeSet


def _pad_axis(arr, size, axis=0, fill=0):
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, size - arr.shape[axis])
    return np.pad(arr, pad, constant_values=fill)


def _real_edges(es: EdgeSet):
    send = np.asarray(es.senders)
    recv = np.asarray(es.receivers)
    feat = np.asarray(es.features)
    if es.dense_k:
        keep = np.asarray(es.mask)[:, 0] > 0
        return send[keep], recv[keep], feat[keep]
    return send, recv, feat


def _stack_edgesets(sets: list) -> EdgeSet:
    """Stack per-shard dense EdgeSets (padding to common sizes) into one
    EdgeSet pytree with a leading shard axis. A stacked TRANSPOSED layout
    (uniform K across shards) rides along so the scatter-free gather
    backward (gather_send_flat) also engages inside shard_map bodies."""
    K = sets[0].dense_k
    assert all(es.dense_k == K for es in sets), "uniform dense_k required"
    m_max = max(es.num_edges for es in sets)
    v_max = max(es.num_virt for es in sets)
    m_max = max(m_max, v_max * K)
    v_max = m_max // K
    num_rec = sets[0].num_rec
    num_send = sets[0].num_send

    def pad_set(es):
        senders = _pad_axis(np.asarray(es.senders), m_max)
        feats = _pad_axis(np.asarray(es.features), m_max)
        mask = _pad_axis(np.asarray(es.mask), m_max)
        virt = _pad_axis(
            np.asarray(es.virt_to_rec), v_max, fill=num_rec - 1
        )
        recv = np.repeat(virt, K)
        return senders, recv, feats, mask, virt

    padded = [pad_set(es) for es in sets]

    # rebuild each shard's transposed layout against the PADDED slot space
    # with one uniform K_T, then pad/stack those too
    n_real = [int((p[3][:, 0] > 0).sum()) for p in padded]
    k_t = int(min(8, max(1, -(-max(n_real) // max(num_send, 1)))))
    t_sets = []
    for p, nr in zip(padded, n_real):
        real = np.nonzero(p[3][:, 0] > 0)[0]
        t_sets.append(EdgeSet.from_local(
            real.astype(np.int64), p[0][real],
            np.zeros((nr, 0), np.float32), num_send=m_max,
            num_rec=num_send, dense=True, dense_force_k=k_t,
            build_transpose=False,
        ))
    tv_max = max(es.num_virt for es in t_sets)
    t_padded = [
        (
            _pad_axis(np.asarray(es.senders), tv_max * k_t),
            _pad_axis(np.asarray(es.mask), tv_max * k_t),
            _pad_axis(np.asarray(es.virt_to_rec), tv_max,
                      fill=num_send - 1),
        )
        for es in t_sets
    ]
    transposed = EdgeSet(
        senders=jnp.asarray(np.stack([p[0] for p in t_padded])),
        receivers=jnp.asarray(
            np.stack([np.repeat(p[2], k_t) for p in t_padded])
        ),
        features=jnp.zeros((len(sets), tv_max * k_t, 0), jnp.float32),
        gather_table=jnp.zeros((len(sets), 1, 1), jnp.int32),
        mask=jnp.asarray(np.stack([p[1] for p in t_padded])),
        virt_to_rec=jnp.asarray(np.stack([p[2] for p in t_padded])),
        num_send=m_max,
        num_rec=num_send,
        dense_k=k_t,
        num_virt=tv_max,
        virt_identity=False,
    )
    return EdgeSet(
        senders=jnp.asarray(np.stack([p[0] for p in padded])),
        receivers=jnp.asarray(np.stack([p[1] for p in padded])),
        features=jnp.asarray(np.stack([p[2] for p in padded])),
        gather_table=jnp.zeros((len(sets), 1, 1), jnp.int32),  # unused (dense)
        mask=jnp.asarray(np.stack([p[3] for p in padded])),
        virt_to_rec=jnp.asarray(np.stack([p[4] for p in padded])),
        num_send=num_send,
        num_rec=num_rec,
        dense_k=K,
        num_virt=v_max,
        # identity survives stacking when every per-shard set is identity:
        # rows [0, num_rec) stay receiver i == row i and the common-v_max
        # pad rows map to num_rec-1 (the identity pad convention). m2g's
        # exact-4-NN chunks are always identity — keeping it TRUE is what
        # lets the fused grid-decode kernel engage inside sharded bodies
        # (grid_update_applicable requires virt_identity).
        virt_identity=bool(all(es.virt_identity for es in sets)),
        transposed=transposed,
    )


def _unstack_edgeset(es: EdgeSet) -> EdgeSet:
    """Strip the leading shard axis inside the shard_map body."""
    transposed = es.transposed
    if transposed is not None:
        transposed = _unstack_edgeset(transposed)
    frontier = es.frontier
    if frontier is not None:
        frontier = _unstack_edgeset(frontier)
    return dataclasses.replace(
        es,
        senders=es.senders[0],
        receivers=es.receivers[0],
        features=es.features[0],
        gather_table=es.gather_table[0],
        mask=es.mask[0],
        virt_to_rec=es.virt_to_rec[0],
        transposed=transposed,
        frontier=frontier,
    )


def _chunk_edgeset(es: EdgeSet, n_shards: int, num_send=None) -> EdgeSet:
    """Split one mesh-level EdgeSet into n_shards balanced contiguous edge
    chunks (receiver-major order keeps each chunk's receiver range narrow)
    and stack them with a leading shard axis. Node index spaces stay global
    (mesh node state is replicated); dense_min_virt=0 keeps each chunk's
    edge-MLP cost proportional to its own edges. `num_send` widens the
    sender index space (the rs scheme pads sharded levels so senders
    gather from the padded all-gathered table)."""
    send, recv, feat = _real_edges(es)
    E = send.shape[0]
    K = es.dense_k or 8
    bounds = [E * s // n_shards for s in range(n_shards + 1)]
    sets = [
        EdgeSet.from_local(
            send[bounds[s]:bounds[s + 1]], recv[bounds[s]:bounds[s + 1]],
            feat[bounds[s]:bounds[s + 1]],
            num_send=num_send or es.num_send,
            num_rec=es.num_rec, dense=True, dense_force_k=K,
            dense_min_virt=0,
        )
        for s in range(n_shards)
    ]
    return _stack_edgesets(sets)


def _sender_owned_chunk_edgeset(es: EdgeSet, n_shards: int,
                                send_block: int) -> EdgeSet:
    """Partition an EdgeSet by the SENDER's owner shard (contiguous blocks
    of `send_block` sender rows) with LOCAL sender indices: each chunk's
    messages read only the shard's own rows — no sender collective; the
    per-shard partial aggregations over the (replicated) receiver set are
    combined with the edge set's usual psum."""
    send, recv, feat = _real_edges(es)
    shard_of = send // send_block
    K = es.dense_k or 8
    sets = [
        EdgeSet.from_local(
            send[shard_of == s] - s * send_block, recv[shard_of == s],
            feat[shard_of == s], num_send=send_block, num_rec=es.num_rec,
            dense=True, dense_force_k=K, dense_min_virt=0,
        )
        for s in range(n_shards)
    ]
    return _stack_edgesets(sets)


def _owned_chunk_edgeset(es: EdgeSet, n_shards: int, rec_block: int,
                         num_send=None, sender_map=None,
                         split=None) -> EdgeSet:
    """Partition an EdgeSet by the RECEIVER's owner shard (contiguous
    blocks of `rec_block` receiver rows): each chunk holds ALL in-edges of
    its owned receivers in LOCAL receiver indices, so aggregation is
    shard-complete with no collective. `sender_map(s, send_global)`
    optionally rewrites each chunk's sender ids (halo scheme: compact
    [owned ++ imports] positions).

    `split` additionally partitions each chunk into an INTERIOR set
    (senders owned by the shard) and a FRONTIER set (senders imported),
    attached as `.frontier` — the overlap structure `SplitSend` consumes
    (ops/message_passing.py). Modes:
      {"kind": "compact", "own": X} — after sender_map, ids < X are owned
        (kept, num_send=X) and ids >= X index the halo IMPORT buffer
        (rebased by -X, num_send = total - X);
      {"kind": "global", "own_block": blk} — global sender ids; owner
        shard = id // blk; interior rebased to the owned block, frontier
        keeps global ids into the all-gathered table."""
    send, recv, feat = _real_edges(es)
    shard_of = recv // rec_block
    K = es.dense_k or 8
    sets, fr_sets = [], []
    for s in range(n_shards):
        sel = shard_of == s
        snd = send[sel]
        if sender_map is not None:
            snd = sender_map(s, snd)
        rcv = recv[sel] - s * rec_block
        ft = feat[sel]
        if split is None:
            sets.append(EdgeSet.from_local(
                snd, rcv, ft, num_send=num_send or es.num_send,
                num_rec=rec_block, dense=True, dense_force_k=K,
                dense_min_virt=0,
            ))
            continue
        if split["kind"] == "compact":
            own = split["own"]
            interior = snd < own
            in_send, in_num_send = snd[interior], own
            fr_send = snd[~interior] - own
            fr_num_send = (num_send or es.num_send) - own
        else:
            blk = split["own_block"]
            interior = (send[sel] // blk) == s
            in_send = send[sel][interior] - s * blk
            in_num_send = blk
            fr_send = snd[~interior]
            fr_num_send = num_send or es.num_send
        sets.append(EdgeSet.from_local(
            in_send, rcv[interior], ft[interior], num_send=in_num_send,
            num_rec=rec_block, dense=True, dense_force_k=K,
            dense_min_virt=0,
        ))
        fr_sets.append(EdgeSet.from_local(
            fr_send, rcv[~interior], ft[~interior],
            num_send=max(int(fr_num_send), 1), num_rec=rec_block,
            dense=True, dense_force_k=K, dense_min_virt=0,
        ))
    stacked = _stack_edgesets(sets)
    if split is not None:
        stacked = dataclasses.replace(
            stacked, frontier=_stack_edgesets(fr_sets)
        )
    return stacked


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridShard:
    """Per-shard (stacked) spatial structures."""

    g2m: EdgeSet  # sender-local grid block, receivers global bottom mesh
    m2g: EdgeSet  # senders global bottom mesh, receivers local grid block
    m2m: tuple  # per-level stacked edge chunks (global node indices)
    up: tuple
    down: tuple
    grid_static: jax.Array  # (Ng_pad, d_static)
    n_shards: int = dataclasses.field(metadata={"static": True})
    block: int = dataclasses.field(metadata={"static": True})
    num_grid: int = dataclasses.field(metadata={"static": True})


def build_grid_shard(graph: LoadedGraph, n_shards: int,
                     grid_static_features) -> GridShard:
    ng = graph.num_grid_nodes
    nm0 = graph.level_sizes[0]
    block = -(-ng // n_shards)
    ng_pad = block * n_shards

    # g2m by sender grid block
    send, recv, feat = _real_edges(graph.g2m)
    shard_of = send // block
    k_g2m = graph.g2m.dense_k or 8
    g2m_sets = [
        EdgeSet.from_local(
            send[shard_of == s] - s * block, recv[shard_of == s],
            feat[shard_of == s], num_send=block, num_rec=nm0,
            dense=True, dense_force_k=k_g2m,
        )
        for s in range(n_shards)
    ]
    # m2g by receiver grid block
    send, recv, feat = _real_edges(graph.m2g)
    shard_of = recv // block
    k_m2g = graph.m2g.dense_k or 8
    m2g_sets = [
        EdgeSet.from_local(
            send[shard_of == s], recv[shard_of == s] - s * block,
            feat[shard_of == s], num_send=nm0, num_rec=block,
            dense=True, dense_force_k=k_m2g,
        )
        for s in range(n_shards)
    ]
    return GridShard(
        g2m=_stack_edgesets(g2m_sets),
        m2g=_stack_edgesets(m2g_sets),
        m2m=tuple(_chunk_edgeset(es, n_shards) for es in graph.m2m),
        up=tuple(_chunk_edgeset(es, n_shards) for es in graph.up),
        down=tuple(_chunk_edgeset(es, n_shards) for es in graph.down),
        grid_static=jnp.asarray(
            _pad_axis(np.asarray(grid_static_features), ng_pad)
        ),
        n_shards=int(n_shards),
        block=int(block),
        num_grid=int(ng),
    )


def _split_latent_ctx(ctx):
    """Pop the latent leaves out of a rollout ctx — they carry their own
    shardings (the rest of the ctx is stacked per shard) — and report
    whether a KL output is expected (training with a posterior target)."""
    if ctx is None:
        return None, None, None, False
    ctx = dict(ctx)
    eps = ctx.pop("latent_eps", None)
    tgt = ctx.pop("latent_target", None)
    return ctx, eps, tgt, tgt is not None


def _make_shard_fn(outer, base_cls, local_fn, has_eps, has_tgt, with_kl):
    """The shared shard_map body of both sharded predict_steps: rebuild
    the per-shard ctx (re-attaching the latent leaves), run the base
    model's predict_step on the local twin, and emit the KL side channel
    as an explicit output when training a latent model."""
    def shard_fn(params, part, prev_p, prev_prev_p, forcing_p, *rest):
        local = local_fn(outer, part)
        ctx_p = dict(rest[0]) if rest else None
        extra = rest[1:]
        if ctx_p is not None and has_eps:
            ctx_p["latent_eps"] = extra[0]
            extra = extra[1:]
        if ctx_p is not None and has_tgt:
            ctx_p["latent_target"] = extra[0]
        out, std = base_cls.predict_step(
            local, params, prev_p, prev_prev_p, forcing_p, ctx=ctx_p,
        )
        if std is None:
            std = jnp.zeros_like(out)
        if with_kl:
            return out, std, ctx_p["_latent_kl"]
        return out, std
    return shard_fn


def _latent_args_specs(ctx, eps, tgt, padg, eps_spec):
    """(in_specs, args) tail for the ctx + latent leaves; the posterior
    target rides the grid sharding like the other inputs."""
    in_specs, args = (), ()
    if ctx is not None:
        in_specs += (P("space"),)
        args += (ctx,)
        if eps is not None:
            in_specs += (eps_spec,)
            args += (eps,)
        if tgt is not None:
            in_specs += (P("data", "space", None),)
            args += (padg(tgt),)
    return in_specs, args


def spatialize(model, mesh: Mesh):
    """Return a copy of `model` whose predict_step is grid-sharded over the
    mesh's `space` axis (batch stays on `data`)."""
    assert "space" in mesh.axis_names
    assert getattr(model.args, "mesh_aggr", "sum") == "sum", (
        "sharded mesh edge chunks psum partial sums; mean aggregation "
        "would divide by per-shard counts"
    )
    n_space = mesh.shape["space"]

    sp = copy.copy(model)
    base_cls = type(model)
    sp.spatial = build_grid_shard(
        model.graph, n_space, model.statics.grid_static_features
    )
    sp.mesh = mesh
    sp._array_fields = tuple(model._array_fields) + ("spatial",)

    def _local(self, part: GridShard):
        """Per-shard base-class model over the local graph chunks."""
        local = copy.copy(self)
        local.__class__ = base_cls  # restore normal ctx precompute
        # local graph: sharded g2m/m2g + per-shard mesh edge chunks
        local.graph = dataclasses.replace(
            self.graph,
            g2m=_unstack_edgeset(part.g2m),
            m2g=_unstack_edgeset(part.m2g),
            m2m=tuple(_unstack_edgeset(es) for es in part.m2m),
            up=tuple(_unstack_edgeset(es) for es in part.up),
            down=tuple(_unstack_edgeset(es) for es in part.down),
        )
        local.statics = dataclasses.replace(
            self.statics, grid_static_features=part.grid_static
        )
        local._g2m_psum_axis = "space"
        local._mesh_psum_axis = "space"
        return local

    def predict_step(self, params, prev_state, prev_prev_state, forcing,
                     ctx=None):
        part: GridShard = self.spatial
        ng, block = part.num_grid, part.block
        ng_pad = part.n_shards * block
        pad = ng_pad - ng

        def padg(x):
            return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

        # latent ctx leaves: mesh state is REPLICATED in this scheme, so
        # eps is replicated over space; the KL computed inside the bodies
        # is identical on every shard
        orig_ctx = ctx
        ctx, eps, tgt, with_kl = _split_latent_ctx(ctx)
        shard_fn = _make_shard_fn(self, base_cls, _local,
                                  eps is not None, tgt is not None, with_kl)

        part_specs = jax.tree_util.tree_map(lambda _: P("space"), part)
        in_specs = (P(), part_specs, P("data", "space", None),
                    P("data", "space", None), P("data", "space", None))
        args = (params, part, padg(prev_state), padg(prev_prev_state),
                padg(forcing))
        tail_specs, tail_args = _latent_args_specs(
            ctx, eps, tgt, padg, eps_spec=P("data", None, None)
        )
        out_specs = (P("data", "space", None), P("data", "space", None))
        if with_kl:
            out_specs += (P("data", None),)
        outs = shard_map(
            shard_fn, mesh=mesh,
            in_specs=in_specs + tail_specs,
            out_specs=out_specs,
            check_vma=False,
        )(*(args + tail_args))
        new_state, pred_std = outs[:2]
        if with_kl:
            orig_ctx["_latent_kl"] = outs[2]
        new_state = new_state[:, :ng]
        if self.output_std:
            return new_state, pred_std[:, :ng]
        return new_state, None

    def precompute_rollout_ctx(self, params, batch_size=None):
        """Per-shard rollout ctx, computed ONCE under shard_map (stacked
        over the space axis) instead of inside every scan iteration — the
        static edge/node embeddings were previously recomputed per predict
        step inside the sharded body."""
        part: GridShard = self.spatial
        part_specs = jax.tree_util.tree_map(lambda _: P("space"), part)

        def ctx_fn(params, part):
            return base_cls.precompute_rollout_ctx(
                _local(self, part), params, batch_size=batch_size
            )

        return shard_map(
            ctx_fn, mesh=self.mesh, in_specs=(P(), part_specs),
            out_specs=P("space"), check_vma=False,
        )(params, part)

    cls = type(
        "GridSharded" + base_cls.__name__, (base_cls,),
        {"predict_step": predict_step,
         "precompute_rollout_ctx": precompute_rollout_ctx},
    )
    sp.__class__ = cls
    return sp


# --- mesh-node-sharded scheme ("rs") -----------------------------------
#
# Grid nodes sharded as above, but BOTTOM-level mesh NODE state is
# sharded too: level-0 m2m (and down-to-0) edges live with their
# RECEIVER's owner so aggregation is shard-local, the g2m partial is
# reduce-scattered to owners (half a psum's bytes, via
# apply_interaction_net's psum_mode="scatter") and each GNN that reads
# level-0 senders all-gathers only the owned rows (the _mesh_sender_rep /
# _hi_sender_rep hooks). Upper hierarchy levels (tiny payloads) keep the
# scheme-1 treatment: balanced edge chunks + one small psum per GNN.
# Flat (graph_lam): 6 half-psum collectives per step vs 5 full psums,
# with the mesh aggr-MLPs sharded — see docs/SCALING.md. Runs the same
# kernel paths as the grid scheme (flat / fused Pallas inside the
# shard_map body).


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RSShard:
    """Per-shard (stacked) structures for the mesh-node-sharded scheme."""

    g2m: EdgeSet  # sender-local grid block -> global PADDED level-0 rows
    m2g: EdgeSet  # senders global padded level 0 -> receiver-local block
    # level 0: receiver-OWNED chunk (local receivers, global senders);
    # upper levels: balanced chunks, global indices (scheme-1 treatment)
    m2m: tuple
    up: tuple  # up[0] senders live in the PADDED level-0 space
    down: tuple  # down[0] receiver-owned; upper balanced
    grid_static: jax.Array  # (Ng_pad, d_static), row-sharded
    # per-level static features, replicated (level 0 padded to nm_pad)
    mesh_static: tuple
    n_shards: int = dataclasses.field(metadata={"static": True})
    block: int = dataclasses.field(metadata={"static": True})
    num_grid: int = dataclasses.field(metadata={"static": True})
    num_mesh: int = dataclasses.field(metadata={"static": True})
    mblock: int = dataclasses.field(metadata={"static": True})
    # halo variant: EVERY level's node state is receiver-owned and every
    # sender table rides cut-edge exchange plans (per-edge-set send lists
    # + static ppermute plans); the g2m partial push-folds to owners;
    # statics live in each shard's owned/compact layout. See
    # parallel/spatial.py's halo scheme
    mm_send_idx: tuple = ()    # per m2m level: (S, X) owner-local rows
    up_send_idx: tuple = ()    # per up edge set
    down_send_idx: tuple = ()  # per down edge set
    mg_send_idx: jax.Array | None = None  # (S, Xmg)
    g2m_add_pos: jax.Array | None = None  # (S, Yg) owner-local positions
    mesh_static0_c: jax.Array | None = None  # (S, mblock0 + Yg, d)
    mesh_static_own: tuple = ()  # upper levels: (S, mblock_l, d)
    mm_plans: tuple = dataclasses.field(default=(),
                                        metadata={"static": True})
    up_plans: tuple = dataclasses.field(default=(),
                                        metadata={"static": True})
    down_plans: tuple = dataclasses.field(default=(),
                                          metadata={"static": True})
    mg_plan: tuple = dataclasses.field(default=(),
                                       metadata={"static": True})
    g2m_plan: tuple = dataclasses.field(default=(),
                                        metadata={"static": True})
    halo: bool = dataclasses.field(default=False,
                                   metadata={"static": True})


def build_rs_shard(graph: LoadedGraph, n_shards: int,
                   grid_static_features, halo: bool = False) -> RSShard:
    ng = graph.num_grid_nodes
    nm = graph.level_sizes[0]
    block = -(-ng // n_shards)
    ng_pad = block * n_shards
    mblock = -(-nm // n_shards)
    nm_pad = mblock * n_shards

    halo_extra = {}
    mg_sender_map = None
    mg_num_send = nm_pad
    g2m_rec_map = None
    g2m_num_rec = nm_pad
    # per-level owned-block sizes (level 0 == mblock)
    mblocks = [-(-n_l // n_shards) for n_l in graph.level_sizes]
    if halo:
        from .spatial import (
            _build_gather_halo,
            _build_push_halo,
            _remap_to_extended,
        )

        def gather_plan(es, send_blk, rec_blk):
            """Cut-edge exchange plan for one edge set: per-shard send
            lists, static ppermute rounds, a sender-id remapper into the
            [owned ++ imports] compact space, and its width."""
            send, recv, _ = _real_edges(es)
            plan, send_idx, remap = _build_gather_halo(
                send, np.minimum(recv // rec_blk, n_shards - 1),
                send_blk, n_shards,
            )

            def smap(s, gids):
                return _remap_to_extended(gids, s, send_blk, remap,
                                          n_shards)

            num_send = send_blk + sum(w for _, w in plan)
            return plan, jnp.asarray(send_idx), smap, num_send

        # m2m[l]: senders and receivers at level l (owned by mblocks[l])
        mm = [gather_plan(es, mblocks[l], mblocks[l])
              for l, es in enumerate(graph.m2m)]
        # up[l]: level-l senders -> level-(l+1) owned receivers
        up_p = [gather_plan(es, mblocks[l], mblocks[l + 1])
                for l, es in enumerate(graph.up)]
        # down[l]: level-(l+1) senders -> level-l owned receivers
        down_p = [gather_plan(es, mblocks[l + 1], mblocks[l])
                  for l, es in enumerate(graph.down)]

        send, recv, _ = _real_edges(graph.m2g)
        mg_plan, mg_send_idx, mg_remap = _build_gather_halo(
            send, np.minimum(recv // block, n_shards - 1), mblock, n_shards
        )

        def mg_sender_map(s, gids):
            return _remap_to_extended(gids, s, mblock, mg_remap, n_shards)

        mg_num_send = mblock + sum(w for _, w in mg_plan)

        # g2m push halo: aggregate into a compact [owned ++ pushed]
        # layout, ppermute only pushed boundary rows to their owners
        send, recv, _ = _real_edges(graph.g2m)
        g2m_plan, g2m_push_pos, g2m_add_pos, yg = _build_push_halo(
            recv, np.minimum(send // block, n_shards - 1), mblock,
            n_shards,
        )
        g2m_num_rec = mblock + yg

        def g2m_rec_map(s, gids):
            return _remap_to_extended(gids, s, mblock, g2m_push_pos,
                                      n_shards)

        # level-0 statics in each shard's compact layout (rec_t for g2m
        # and the initial mesh embedding are computed on these rows);
        # upper levels carry their OWNED slices only — nothing full-mesh
        # is computed replicated
        ms0 = _pad_axis(
            np.asarray(graph.mesh_static_features[0], np.float32), nm_pad
        )
        ms0_c = np.zeros((n_shards, g2m_num_rec, ms0.shape[1]), np.float32)
        for s in range(n_shards):
            ms0_c[s, :mblock] = ms0[s * mblock:(s + 1) * mblock]
            for gid, pos in g2m_push_pos[s].items():
                ms0_c[s, pos] = ms0[gid]
        ms_own = []
        for l, feat in enumerate(graph.mesh_static_features[1:], start=1):
            f = _pad_axis(np.asarray(feat, np.float32),
                          mblocks[l] * n_shards)
            ms_own.append(jnp.asarray(
                f.reshape(n_shards, mblocks[l], f.shape[1])
            ))

        halo_extra = {
            "mm_send_idx": tuple(p[1] for p in mm),
            "up_send_idx": tuple(p[1] for p in up_p),
            "down_send_idx": tuple(p[1] for p in down_p),
            "mg_send_idx": jnp.asarray(mg_send_idx),
            "g2m_add_pos": jnp.asarray(g2m_add_pos),
            "mesh_static0_c": jnp.asarray(ms0_c),
            "mesh_static_own": tuple(ms_own),
            "mm_plans": tuple(p[0] for p in mm),
            "up_plans": tuple(p[0] for p in up_p),
            "down_plans": tuple(p[0] for p in down_p),
            "mg_plan": mg_plan, "g2m_plan": g2m_plan,
            "halo": True,
        }

    # g2m by sender grid block; receiver space padded so the partial
    # aggregation reduce-scatters evenly to owners ("rs") or remapped to
    # each shard's compact [owned ++ pushed] layout ("halo")
    send, recv, feat = _real_edges(graph.g2m)
    shard_of = send // block
    k_g2m = graph.g2m.dense_k or 8
    g2m_sets = []
    for s in range(n_shards):
        sel = shard_of == s
        rcv = recv[sel]
        if g2m_rec_map is not None:
            rcv = g2m_rec_map(s, rcv)
        g2m_sets.append(EdgeSet.from_local(
            send[sel] - s * block, rcv,
            feat[sel], num_send=block, num_rec=g2m_num_rec,
            dense=True, dense_force_k=k_g2m,
        ))
    # m2g by receiver grid block; senders gather from the all-gathered
    # (B, nm_pad, h) table ("rs") or the compact [owned ++ halo imports]
    # table ("halo" — sender ids remapped here)
    send, recv, feat = _real_edges(graph.m2g)
    shard_of = recv // block
    k_m2g = graph.m2g.dense_k or 8
    m2g_sets = []
    for s in range(n_shards):
        sel = shard_of == s
        snd = send[sel]
        if mg_sender_map is not None:
            snd = mg_sender_map(s, snd)
        m2g_sets.append(EdgeSet.from_local(
            snd, recv[sel] - s * block,
            feat[sel], num_send=mg_num_send, num_rec=block,
            dense=True, dense_force_k=k_m2g,
        ))
    if halo:
        # EVERY level is receiver-owned; interior edges keep owner-local
        # sender ids and frontier edges index the halo IMPORT buffer
        # directly (split sets -> SplitSend overlap, see
        # _owned_chunk_edgeset); sets with an empty plan stay unsplit
        def csplit(plan, own):
            return ({"kind": "compact", "own": own} if plan else None)

        m2m = tuple(
            _owned_chunk_edgeset(es, n_shards, mblocks[l],
                                 num_send=mm[l][3], sender_map=mm[l][2],
                                 split=csplit(mm[l][0], mblocks[l]))
            for l, es in enumerate(graph.m2m)
        )
        up = tuple(
            _owned_chunk_edgeset(es, n_shards, mblocks[l + 1],
                                 num_send=up_p[l][3],
                                 sender_map=up_p[l][2],
                                 split=csplit(up_p[l][0], mblocks[l]))
            for l, es in enumerate(graph.up)
        )
        down = tuple(
            _owned_chunk_edgeset(es, n_shards, mblocks[l],
                                 num_send=down_p[l][3],
                                 sender_map=down_p[l][2],
                                 split=csplit(down_p[l][0],
                                              mblocks[l + 1]))
            for l, es in enumerate(graph.down)
        )
    else:
        # level-0 m2m by receiver OWNER: local receivers, shard-local
        # aggregation, interior/frontier split (frontier gathers from the
        # all-gathered padded table); upper-level edge sets as balanced
        # scheme-1 chunks
        m2m = (_owned_chunk_edgeset(
            graph.m2m[0], n_shards, mblock, num_send=nm_pad,
            split={"kind": "global", "own_block": mblock},
        ),) + tuple(
            _chunk_edgeset(es, n_shards) for es in graph.m2m[1:]
        )
        # up[0] senders are the sharded level-0 rows: partition by SENDER
        # owner so messages read only owned rows (no gather; the level-1
        # partial aggregation is psum'd anyway)
        up = tuple(
            _sender_owned_chunk_edgeset(es, n_shards, mblock) if i == 0
            else _chunk_edgeset(es, n_shards)
            for i, es in enumerate(graph.up)
        )
        down = tuple(
            _owned_chunk_edgeset(es, n_shards, mblock) if i == 0
            else _chunk_edgeset(es, n_shards)
            for i, es in enumerate(graph.down)
        )
    mesh_static = (jnp.asarray(_pad_axis(
        np.asarray(graph.mesh_static_features[0], np.float32), nm_pad
    )),) + tuple(
        jnp.asarray(np.asarray(f, np.float32))
        for f in graph.mesh_static_features[1:]
    )
    return RSShard(
        g2m=_stack_edgesets(g2m_sets),
        m2g=_stack_edgesets(m2g_sets),
        m2m=m2m,
        up=up,
        down=down,
        grid_static=jnp.asarray(
            _pad_axis(np.asarray(grid_static_features), ng_pad)
        ),
        mesh_static=mesh_static,
        n_shards=int(n_shards),
        block=int(block),
        num_grid=int(ng),
        num_mesh=int(nm),
        mblock=int(mblock),
        **halo_extra,
    )


def spatialize_rs(model, mesh: Mesh, halo: bool = False):
    """Mesh-node-sharded copy of a model: level-0 mesh rows live with
    their owner shard (flat graph_lam and the hierarchical families).
    halo=True swaps the full-table sender all-gathers for cut-edge halo
    ppermutes (the sender tables become compact [owned ++ imports]
    layouts; the edge chunks' sender ids are remapped at build time)."""
    assert "space" in mesh.axis_names
    assert getattr(model.args, "mesh_aggr", "sum") == "sum", (
        "scatter mode implements sum aggregation"
    )
    n_space = mesh.shape["space"]

    sp = copy.copy(model)
    base_cls = type(model)
    sp.spatial = build_rs_shard(
        model.graph, n_space, model.statics.grid_static_features,
        halo=halo,
    )
    sp.mesh = mesh
    sp._array_fields = tuple(model._array_fields) + ("spatial",)
    is_latent = getattr(model, "is_latent", False)
    if is_latent:
        # the latent field lives on the (owned) level-0 rows: eps must be
        # drawn over the PADDED row count so it row-shards evenly; KL on
        # the padded tail is sliced off by the mixin's training_loss
        sp._latent_rows = sp.spatial.mblock * n_space

    def _local(self, part: RSShard):
        """Per-shard base-class model with the rs collective hooks."""
        local = copy.copy(self)
        local.__class__ = base_cls

        if part.halo:
            from ..ops.message_passing import SplitSend
            from .spatial import _halo_exchange, _halo_fold

            S = part.n_shards

            def hi_send(rep, kind, idx):
                """Cut-edge halo import for edge set (kind, idx): the
                owned sender rows paired with the rows this shard's edges
                reference on other shards (SplitSend — the interior edge
                kernel overlaps the ppermute)."""
                arrs, plans = {
                    "m2m": (part.mm_send_idx, part.mm_plans),
                    "up": (part.up_send_idx, part.up_plans),
                    "down": (part.down_send_idx, part.down_plans),
                }[kind]
                plan = plans[idx]
                if not plan:
                    return rep
                return SplitSend(
                    rep, _halo_exchange(rep, arrs[idx][0], plan, S)
                )

            def gather0(rep):
                return hi_send(rep, "m2m", 0)

            def gather_m2g(rep):
                # m2g feeds the fused flat-grid decoder, which consumes
                # the full gathered rows per grid node — it stays a
                # concatenated table (unsplit); the exchange is one
                # cut-edge ppermute per predict step
                return jnp.concatenate([
                    rep,
                    _halo_exchange(rep, part.mg_send_idx[0],
                                   part.mg_plan, S),
                ], axis=1)

            def g2m_fold(aggregated, rec_rep, agg_axis, rec_axis):
                return _halo_fold(
                    aggregated, rec_rep, agg_axis, rec_axis,
                    part.g2m_add_pos[0], part.g2m_plan, part.mblock, S,
                )

            local._m2g_sender_rep = gather_m2g
        else:
            from ..ops.message_passing import (
                SplitSendLazy, node_transform_flat,
            )

            def gather_full(rep, axis=1):
                return jax.lax.all_gather(rep, "space", axis=axis,
                                          tiled=True)

            def gather0(rep):
                # owned rows + a DEFERRED all-gather: interior m2m[0]
                # edges read only the owned rows, so the all-gather's
                # sole consumer is the small frontier round (overlap);
                # laziness lets the consumer transform the owned rows
                # first and gather the transformed table (split_send_tf)
                return SplitSendLazy(rep, gather_full)

            # m2g senders index the full padded table (fused decoder
            # consumes all rows): all-gather, but transform the owned
            # rows BEFORE the collective (row-wise identical math)
            local._m2g_sender_rep = gather_full

            def m2g_sender_tf(mesh_rep, w_j, cd):
                tf = node_transform_flat(mesh_rep, w_j, cd)
                if cd is not None:
                    tf = tf.astype(cd)
                return gather_full(tf, axis=0)

            local._m2g_sender_tf = m2g_sender_tf

        mesh_static = part.mesh_static
        if part.halo:
            # level-0 statics in the compact [owned ++ pushed] layout,
            # upper levels owned slices: every level's embedding and the
            # g2m receiver transform are computed per shard on exactly
            # the rows it owns/touches
            mesh_static = ((part.mesh_static0_c[0],)
                           + tuple(m[0] for m in part.mesh_static_own))
        local.graph = dataclasses.replace(
            self.graph,
            g2m=_unstack_edgeset(part.g2m),
            m2g=_unstack_edgeset(part.m2g),
            m2m=tuple(_unstack_edgeset(es) for es in part.m2m),
            up=tuple(_unstack_edgeset(es) for es in part.up),
            down=tuple(_unstack_edgeset(es) for es in part.down),
            mesh_static_features=mesh_static,
        )
        local.statics = dataclasses.replace(
            self.statics, grid_static_features=part.grid_static
        )
        local._g2m_psum_axis = "space"
        local._g2m_psum_mode = g2m_fold if part.halo else "scatter"
        # level 0 is receiver-owned: local aggregation, all-gathered
        # sender tables; upper levels keep the scheme-1 chunk+psum in
        # "rs" and are receiver-owned with halo imports in "halo"
        local._mesh_psum_axis = None
        local._mesh_sender_rep = gather0
        if self.hierarchical:
            if part.halo:
                # every level receiver-owned: no psums at all; every
                # sender table is its edge set's halo import
                local._hi_psum_axis = lambda rec_level: None
                local._hi_sender_rep = hi_send
            else:
                local._hi_psum_axis = (
                    lambda rec_level: None if rec_level == 0 else "space"
                )
                # only m2m[0] reads distributed senders: its
                # receiver-owned chunks gather from the full level-0
                # table. up[0] is sender-owned (local rows), down/up
                # upper levels replicated.
                local._hi_sender_rep = (
                    lambda rep, kind, idx:
                    gather0(rep) if (kind, idx) == ("m2m", 0) else rep
                )
        return local

    def _part_specs(part: RSShard):
        specs = jax.tree_util.tree_map(lambda _: P("space"), part)
        return dataclasses.replace(
            specs,
            mesh_static=jax.tree_util.tree_map(
                lambda _: P(), part.mesh_static
            ),
        )

    def predict_step(self, params, prev_state, prev_prev_state, forcing,
                     ctx=None):
        part: RSShard = self.spatial
        ng, block = part.num_grid, part.block
        pad = part.n_shards * block - ng

        def padg(x):
            return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

        # latent ctx leaves: eps rides the owned level-0 rows (and the
        # batch sharding); the per-step KL written by process_step inside
        # the body is returned through shard_map and put back into the
        # caller's ctx dict (matching the unsharded side channel)
        orig_ctx = ctx
        ctx, eps, tgt, with_kl = _split_latent_ctx(ctx)
        shard_fn = _make_shard_fn(self, base_cls, _local,
                                  eps is not None, tgt is not None, with_kl)

        in_specs = (P(), _part_specs(part), P("data", "space", None),
                    P("data", "space", None), P("data", "space", None))
        args = (params, part, padg(prev_state), padg(prev_prev_state),
                padg(forcing))
        tail_specs, tail_args = _latent_args_specs(
            ctx, eps, tgt, padg, eps_spec=P("data", "space", None)
        )
        out_specs = (P("data", "space", None), P("data", "space", None))
        if with_kl:
            out_specs += (P("data", "space"),)
        outs = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=in_specs + tail_specs,
            out_specs=out_specs,
            check_vma=False,
        )(*(args + tail_args))
        new_state, pred_std = outs[:2]
        if with_kl:
            orig_ctx["_latent_kl"] = outs[2]
        new_state = new_state[:, :ng]
        if self.output_std:
            return new_state, pred_std[:, :ng]
        return new_state, None

    def precompute_rollout_ctx(self, params, batch_size=None):
        """Per-shard rollout ctx, computed ONCE under shard_map (stacked
        over the space axis) instead of inside every scan iteration."""
        part: RSShard = self.spatial

        def ctx_fn(params, part):
            return base_cls.precompute_rollout_ctx(
                _local(self, part), params, batch_size=batch_size
            )

        return shard_map(
            ctx_fn, mesh=self.mesh, in_specs=(P(), _part_specs(part)),
            out_specs=P("space"), check_vma=False,
        )(params, part)

    cls = type(
        "RSSharded" + base_cls.__name__, (base_cls,),
        {"predict_step": predict_step,
         "precompute_rollout_ctx": precompute_rollout_ctx},
    )
    sp.__class__ = cls
    return sp
