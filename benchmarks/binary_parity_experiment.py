"""Generator-parity / recall-ceiling experiment for pca-256b (VERDICT r2 #6).

Pure numpy replication of the reference pipeline
(examples/gridsearch_binary.rs + commons/mod.rs):
  data  = generate_clustered_data_high_dim(50_000, 256, 25, rho=0.5, seed)
  query = subsample_with_noise(data, 5_000, seed+1)
  bits  = sign(PCA_loadings^T (x - mean))      [256 bits]
  pool  = top (k*rf) by hamming; rerank exact; recall@15 vs exact GT.

The rerank recall EQUALS |pool cap GT|/k, so we can compute the ceiling
without implementing the rerank.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from annsearch_tpu.utils.data import (
    generate_clustered_data_high_dim, subsample_with_noise)

N, D, K, NQ = 50_000, 256, 15, 5_000
RFS = (10, 20)

for seed in (42, 7, 123):
    x, _ = generate_clustered_data_high_dim(N, D, 25, 0.5, seed=seed)
    q = subsample_with_noise(x, NQ, seed=seed + 1)

    # singular spectrum of the centred data (generator signature)
    mean = x.mean(0)
    xc = (x - mean).astype(np.float64)
    sv = np.linalg.svd(xc[:20000], compute_uv=False)
    ev = sv**2 / np.sum(sv**2)
    eff_rank = float(np.exp(-np.sum(ev * np.log(ev + 1e-30))))
    top8 = ", ".join(f"{v:.3f}" for v in ev[:8])
    print(f"seed {seed}: var-share top8 = [{top8}] eff_rank={eff_rank:.1f}",
          flush=True)

    # PCA binarisation (256 bits = full rotation)
    _, _, vh = np.linalg.svd(xc, full_matrices=False)
    bits_x = ((x - mean) @ vh.T > 0)
    bits_q = ((q - mean) @ vh.T > 0)
    sx = np.where(bits_x, 1.0, -1.0).astype(np.float32)
    sq = np.where(bits_q, 1.0, -1.0).astype(np.float32)

    # exact GT (chunked)
    xn = (x.astype(np.float64)**2).sum(1)
    gt = np.zeros((NQ, K), np.int64)
    for i in range(0, NQ, 500):
        qq = q[i:i+500].astype(np.float64)
        d2 = xn[None, :] - 2.0 * (qq @ x.T.astype(np.float64))
        gt[i:i+500] = np.argpartition(d2, K, axis=1)[:, :K]

    # hamming pool recall for each rf
    dots = sq @ sx.T  # [NQ, N]; hamming = (D - dots)/2, monotone in -dots
    for rf in RFS:
        pool_sz = K * rf
        pool = np.argpartition(-dots, pool_sz, axis=1)[:, :pool_sz]
        hits = np.zeros(NQ)
        for i in range(NQ):
            hits[i] = len(set(pool[i]) & set(gt[i]))
        print(f"seed {seed}: pca-256b rf{rf} rerank recall ceiling = "
              f"{hits.mean()/K:.4f}", flush=True)
print("DONE", flush=True)
