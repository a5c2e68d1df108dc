import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall

x, _ = generate_clustered_data(150_000, 32, 25, seed=42)
q = subsample_with_noise(x, 15_000, seed=42)
exact = ann.build_exhaustive_index(x, "euclidean")
t0 = time.time(); ti, _ = ann.query_exhaustive_index(q, exact, 15, return_dist=True)
print(f"exact gt: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
g = ann.build_nndescent_index(x, k=15, seed=42, verbose=True)
print(f"graph build (incl compile): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
g2 = ann.build_nndescent_index(x, k=15, seed=43)
print(f"graph build (warm): {time.time()-t0:.1f}s", flush=True)

for beam, iters in [(32,16),(48,24),(64,48)]:
    t0 = time.time()
    ai, _ = ann.query_nndescent_index(q, g2, 15, beam=beam, iters=iters, return_dist=True)
    dt = time.time()-t0
    print(f"query beam={beam} iters={iters}: {dt*1000:.0f} ms recall {calculate_recall(ti, ai, 15):.4f}", flush=True)

gi, _ = g2.generate_knn(15, mode="graph")
si, _ = exact.generate_knn(16)
print("knn-graph recall (150k):", calculate_recall(si[:,1:16], gi, 15), flush=True)
