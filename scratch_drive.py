import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
import numpy as np
import annsearch_tpu as ann
from annsearch_tpu.utils.data import generate_clustered_data, subsample_with_noise
from annsearch_tpu.utils.metrics import calculate_recall

x, _ = generate_clustered_data(20000, 32, 10, seed=0)
q = subsample_with_noise(x, 300, seed=0)
exact = ann.build_exhaustive_index(x)
ti, _ = ann.query_exhaustive_index(q, exact, 10, return_dist=True)

def check(name, build, query):
    t0 = time.time(); idx = build(); bt = time.time()-t0
    t0 = time.time(); ai, ad = query(idx); qt = time.time()-t0
    rec = calculate_recall(ti, ai, 10)
    print(f"{name:<28} build {bt:6.1f}s query {qt:6.2f}s recall {rec:.4f}", flush=True)

check("kmknn (exact)",
      lambda: ann.build_kmknn_index(x, seed=0),
      lambda i: ann.query_kmknn_index(q, i, 10, return_dist=True))
check("annoy nt16",
      lambda: ann.build_annoy_index(x, n_trees=16, seed=0),
      lambda i: ann.query_annoy_index(q, i, 10, return_dist=True))
check("kdtree nt16",
      lambda: ann.build_kd_tree_index(x, n_trees=16, seed=0),
      lambda i: ann.query_kd_tree_index(q, i, 10, return_dist=True))
check("balltree b0.05",
      lambda: ann.build_balltree_index(x, seed=0),
      lambda i: ann.query_balltree_index(q, i, 10, return_dist=True))
check("lsh t8 b12 p4",
      lambda: ann.build_lsh_index(x, num_tables=8, bits_per_hash=12, seed=0),
      lambda i: ann.query_lsh_index(q, i, 10, return_dist=True))
check("hnsw m16 ef100",
      lambda: ann.build_hnsw_index(x, m=16, seed=0),
      lambda i: ann.query_hnsw_index(q, i, 10, ef_search=100, return_dist=True))
check("vamana r32",
      lambda: ann.build_vamana_index(x, r_degree=32, seed=0),
      lambda i: ann.query_vamana_index(q, i, 10, return_dist=True))
check("nndescent k10 (brute path)",
      lambda: ann.build_nndescent_index(x, k=10, seed=0),
      lambda i: ann.query_nndescent_index(q, i, 10, return_dist=True))
check("ivf-sq8 nl141 np24",
      lambda: ann.build_ivf_sq8_index(x, nlist=141, seed=0),
      lambda i: ann.query_ivf_sq8_index(q, i, 10, nprobe=24, return_dist=True))
check("ivf-opq nl141 m16 np24",
      lambda: ann.build_ivf_opq_index(x, nlist=141, m=16, seed=0),
      lambda i: ann.query_ivf_opq_index(q, i, 10, nprobe=24, return_dist=True))
