"""Multi-chip IVF: distributed k-means build + sharded cell scan.

New surface vs the reference (single-process, SURVEY §2.7): the database is
row-sharded over a 1-D mesh and both phases run SPMD:

  * **build** — Lloyd iterations under ``shard_map``: every device assigns
    its rows to the replicated centroids (local GEMM argmin), computes
    partial ``segment_sum`` sums/counts, and one ``psum`` over ICI yields
    identical updated centroids everywhere. This is the k-means engine
    (``models/kmeans.py``) distributed the way the scaling-book recipe
    says: shard data, replicate parameters, let the collective do the sum.
  * **query** — routing is replicated (same centroids ⇒ same probe lists,
    built once on host); each device runs the cluster-major scan over its
    *local* cells; per-shard top-k results are ``all_gather``-ed and
    log-merged. Cells exist per shard (each device clusters only its rows),
    so no cross-device data movement happens during the scan — only the
    [nq, k] merge rides ICI.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models.base import as_f32_matrix
from ..models.kmeans import build_cells, _dsq_seed_init, _random_init
from ..ops.ivf_scan import build_probe_lists, ivf_cluster_scan
from ..ops.topk import topk_smallest
from ..utils.dist import Dist, normalise, parse_ann_dist, sq_norms
from .mesh import DB_AXIS, make_mesh

__all__ = ["train_centroids_sharded", "ShardedIvfIndex"]


def train_centroids_sharded(
    x_sharded: jax.Array,   # [n_pad, d] row-sharded over mesh
    init_centroids: jax.Array,  # [k, d] replicated
    n_valid: int,
    mesh,
    iters: int = 15,
) -> jax.Array:
    """Distributed Lloyd: local assign + psum'd segment-sum update."""
    k = init_centroids.shape[0]
    shard_rows = x_sharded.shape[0] // mesh.devices.size

    @functools.partial(
        _shard_map,
        mesh=mesh,
        in_specs=(P(DB_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(x_shard, c0):
        my = jax.lax.axis_index(DB_AXIS)
        base = my * shard_rows
        row_valid = (
            base + jax.lax.broadcasted_iota(jnp.int32, (shard_rows, 1), 0)[:, 0]
        ) < n_valid
        xs = sq_norms(x_shard)

        def body(_, c):
            d = (
                xs[:, None]
                + sq_norms(c)[None, :]
                - 2.0
                * jax.lax.dot_general(
                    x_shard, c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            a = jnp.argmin(d, axis=1)
            w = row_valid.astype(jnp.float32)
            sums = jax.ops.segment_sum(x_shard * w[:, None], a, num_segments=k)
            counts = jax.ops.segment_sum(w, a, num_segments=k)
            sums = jax.lax.psum(sums, DB_AXIS)
            counts = jax.lax.psum(counts, DB_AXIS)
            return jnp.where(
                counts[:, None] > 0,
                sums / jnp.maximum(counts, 1.0)[:, None],
                c,
            )

        return jax.lax.fori_loop(0, iters, body, c0)

    return run(x_sharded, init_centroids)


class ShardedIvfIndex:
    """IVF index with database and cells sharded over a device mesh."""

    def __init__(
        self,
        mat,
        metric: str = "euclidean",
        nlist: int | None = None,
        max_iters: int = 15,
        seed: int = 42,
        mesh=None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        ndev = self.mesh.devices.size
        arr = as_f32_matrix(mat)
        self.metric = parse_ann_dist(metric)
        self.n, self.dim = arr.shape
        if nlist is None:
            nlist = max(1, int(math.isqrt(self.n)))
        self.nlist = min(nlist, self.n)

        x = jnp.asarray(arr)
        if self.metric == Dist.COSINE:
            x = normalise(x)

        # pad rows to a shard multiple, shard
        pad = (-self.n) % ndev
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, self.dim), x.dtype)])
        self.shard_rows = x.shape[0] // ndev

        # init on a host-side sample, then distributed Lloyd
        key = jax.random.key(seed)
        m = min(self.n, min(256 * self.nlist, 250_000))
        key, ks, ki = jax.random.split(key, 3)
        idx = jax.random.choice(ks, self.n, (m,), replace=False)
        sample = x[idx]
        if self.nlist <= 200:
            init = _dsq_seed_init(ki, sample, self.nlist)
        else:
            init = _random_init(ki, sample, self.nlist)

        x_sharded = jax.device_put(x, NamedSharding(self.mesh, P(DB_AXIS)))
        self.centroids = train_centroids_sharded(
            x_sharded, init, self.n, self.mesh, iters=max_iters
        )

        # per-shard cells (host-side layout, like the single-chip path)
        x_np = np.asarray(x)
        c_np = np.asarray(self.centroids)
        storages, offsets, counts, orig = [], [], [], []
        cell_cap = 1
        for s in range(ndev):
            lo, hi = s * self.shard_rows, (s + 1) * self.shard_rows
            xs = x_np[lo:hi]
            valid = min(self.shard_rows, max(0, self.n - lo))
            d = (
                (xs**2).sum(1)[:, None]
                + (c_np**2).sum(1)[None, :]
                - 2.0 * xs @ c_np.T
            )
            a = np.argmin(d, axis=1)
            a[valid:] = 0  # padding rows parked in cell 0 but masked below
            members, cnt, order = build_cells(a[:valid], self.nlist)
            cell_cap = max(cell_cap, members.shape[1])
            sorted_x = np.zeros_like(xs)
            sorted_x[:valid] = xs[order]
            storages.append(sorted_x)
            counts.append(cnt)
            offsets.append(
                np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int32)
            )
            om = np.zeros(self.shard_rows, np.int32)
            om[:valid] = order + lo
            orig.append(om)
        self.cell_cap = cell_cap

        # sharded device arrays: leading dim = device axis
        def put(parts, spec):
            return jax.device_put(
                jnp.asarray(np.stack(parts)), NamedSharding(self.mesh, spec)
            )

        # storage is padded with cell_cap rows per shard for static slices
        pads = np.zeros((ndev, cell_cap, self.dim), np.float32)
        self.storage = put(
            [np.concatenate([s, p]) for s, p in zip(storages, pads)],
            P(DB_AXIS, None, None),
        )
        self.store_sqnorms = put(
            [np.concatenate([(s**2).sum(1), np.zeros(cell_cap, np.float32)]) for s in storages],
            P(DB_AXIS, None),
        )
        self.offsets = put(offsets, P(DB_AXIS, None))
        self.counts = put(counts, P(DB_AXIS, None))
        self.original_ids = put(orig, P(DB_AXIS, None))

    def default_nprobe(self) -> int:
        return max(1, int(math.isqrt(self.nlist)))

    def query(self, query_mat, k: int, nprobe: int | None = None):
        q = jnp.asarray(as_f32_matrix(query_mat))
        if self.metric == Dist.COSINE:
            q = normalise(q)
        k = max(1, min(k, self.n))
        nprobe = self.default_nprobe() if nprobe is None else nprobe
        nprobe = max(1, min(nprobe, self.nlist))
        nq = q.shape[0]

        # replicated routing → shared probe lists
        dots = q @ self.centroids.T
        if self.metric == Dist.COSINE:
            cd = 1.0 - dots
        else:
            cd = (
                sq_norms(q)[:, None]
                + sq_norms(self.centroids)[None, :]
                - 2.0 * dots
            )
        _, probes = topk_smallest(cd, nprobe)
        cluster_ids, lists, ords, t_slots = build_probe_lists(
            np.asarray(probes), self.nlist, nq
        )
        cluster_ids = jnp.asarray(cluster_ids)
        lists = jnp.asarray(lists)
        ords = jnp.asarray(ords)

        metric = self.metric
        cap = self.cell_cap
        nlist = self.nlist

        @functools.partial(
            _shard_map,
            mesh=self.mesh,
            in_specs=(
                P(), P(), P(), P(),
                P(DB_AXIS, None, None), P(DB_AXIS, None),
                P(DB_AXIS, None), P(DB_AXIS, None), P(DB_AXIS, None), P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def run(qq, cids, plists, pords, storage, sqn, offs, cnts, oids, cents):
            d, i = ivf_cluster_scan(
                qq, cids, plists, pords, storage[0], sqn[0], offs[0], cnts[0],
                cents, k, metric, cap, "f32", t_slots,
            )
            d, i = d[:nq], i[:nq]
            gids = oids[0][jnp.clip(i, 0, oids.shape[1] - 1)]
            dg = jax.lax.all_gather(d, DB_AXIS, axis=1, tiled=True)
            ig = jax.lax.all_gather(gids, DB_AXIS, axis=1, tiled=True)
            md, pos = topk_smallest(dg, k)
            return md, jnp.take_along_axis(ig, pos, axis=-1)

        d, ids = run(
            q, cluster_ids, lists, ords, self.storage, self.store_sqnorms,
            self.offsets, self.counts, self.original_ids, self.centroids,
        )
        return np.asarray(ids), np.asarray(d)
