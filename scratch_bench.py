import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
import annsearch_tpu as ann
from annsearch_tpu.models.quantised import IvfPqIndex
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall

N, D, NC, NQ, K = 1_000_000, 128, 100, 10_000, 10
x, _ = generate_clustered_data(N, D, NC, seed=42)
q = subsample_with_noise(x, NQ, seed=42)
ti = np.load("/tmp/gt_1m_128d.npz")["ti"]

for seg in (2048, 4096):
    t0=time.time()
    idx = IvfPqIndex(x, "euclidean", nlist=1024, m=128, seed=42, seg_size=seg)
    print(f"seg={seg} build {time.time()-t0:.1f}s", flush=True)
    for npb in (16,):
        ai, _ = idx.query(q, K, nprobe=npb, approx=True)
        rec = calculate_recall(ti, ai, K)
        t0=time.time(); idx.query(q, K, nprobe=npb, approx=True); dt=time.time()-t0
        print(f"seg={seg} np={npb}: recall {rec:.4f} {NQ/dt:.0f} QPS", flush=True)
    del idx
