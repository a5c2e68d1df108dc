import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from annsearch_tpu.models.quantised.quantisers import ProductQuantiser
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise

N, D, NC = 1_000_000, 128, 100
x, _ = generate_clustered_data(N, D, NC, seed=42)
q = subsample_with_noise(x, 500, seed=42)  # matches first 500 of the 10k GT? no — recompute GT here
ti = np.load("/tmp/gt_1m_128d.npz")["ti"][:500]

# quick kmeans-lite: use the data's own structure — instead, approximate the
# index ceiling: train PQ on residuals to 1024 random "centroids"? Too rough.
# Proper: recompute with the same pipeline but measure exact-scored recon recall.
import jax.numpy as jnp
from annsearch_tpu.models.kmeans import train_centroids, assign_clusters
from annsearch_tpu.utils.dist import Dist
xj = jnp.asarray(x)
cent = train_centroids(xj, 1024, Dist.EUCLIDEAN, max_iters=30, seed=42)
assign, _ = assign_clusters(xj, cent, Dist.EUCLIDEAN)
cent_np = np.asarray(cent); a_np = np.asarray(assign)
res = x - cent_np[a_np]

for m in (64, 128):
    pq = ProductQuantiser.train(jnp.asarray(res[:250_000]), m, seed=42, max_iters=25)
    codes = np.asarray(pq.encode(jnp.asarray(res)))
    recon = np.asarray(pq.decode(jnp.asarray(codes))) + cent_np[a_np]
    err = np.linalg.norm(recon - x) / np.linalg.norm(x)
    # exact f64 scoring of 500 queries vs recon
    d = ((q[:, None, :].astype(np.float64) - recon[None, :, :].astype(np.float64))**2).sum(-1) if False else None
    # memory-light: chunked
    best = np.zeros((500, 10), np.int64)
    import heapq
    CH = 100_000
    alld = np.zeros((500, N), np.float32)
    for s in range(0, N, CH):
        blk = recon[s:s+CH]
        alld[:, s:s+CH] = ((q[:, None, :] - blk[None, :, :])**2).sum(-1)
    bi = np.argsort(alld, axis=1)[:, :10]
    rec = np.mean([len(np.intersect1d(ti[i], bi[i]))/10 for i in range(500)])
    print(f"m={m}: recon_err {err:.4f} exact-scored ceiling recall {rec:.4f}", flush=True)
    del alld
