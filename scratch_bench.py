import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall

N, D, NC, NQ, K = 1_000_000, 128, 100, 10_000, 10
x, _ = generate_clustered_data(N, D, NC, seed=42)
q = subsample_with_noise(x, NQ, seed=42)
ti = np.load("/tmp/gt_1m_128d.npz")["ti"]

t0=time.time()
idx = ann.build_ivf_pq_index(x, nlist=1024, m=128, seed=42)
print(f"build {time.time()-t0:.1f}s", flush=True)
for npb in (8, 16, 32):
    ai, _ = idx.query(q, K, nprobe=npb, approx=True)
    rec = calculate_recall(ti, ai, K)
    ts=[]
    for _ in range(3):
        t0=time.time(); idx.query(q, K, nprobe=npb, approx=True); ts.append(time.time()-t0)
    print(f"np={npb}: recall {rec:.4f} {NQ/min(ts):.0f} QPS (runs {[f'{t:.2f}' for t in ts]})", flush=True)
