"""Stage-level profiling harness for the 1M north-star pipeline.

Usage: python exp_prof1m.py <stage> [stage...]
  stages: prep neighbors wnn leiden umap mofa

`prep` computes (and disk-caches) the per-modality reps so downstream
stage experiments skip the ~190s preprocessing. Other stages load the rep
cache and run with MUON_TPU_PROFILE=1 so ops-internal `stage()` timers
print. Not part of the shipped package — a perf lab notebook.
"""

from __future__ import annotations

import os
import sys
import time

os.environ["MUON_TPU_PROFILE"] = "1"


def _cache_cfg():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_cache_cfg()

import numpy as np
from scipy import sparse as sp

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

N = 1_000_000
SYNTH = f"/tmp/muon_e2e_synth_{N}_20000_25000_120.npz"
REPS = f"/tmp/muon_reps_{N}.npz"
GRAPH = f"/tmp/muon_graphs_{N}.npz"


class T:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        print(f"[T] {self.name}: {time.perf_counter() - self.t0:.2f}s",
              flush=True)


def prep():
    import muon_tpu as mu
    from muon_tpu import atac as ac
    from muon_tpu import prot as pt
    from muon_tpu.ops.linalg import pca as _pca
    from muon_tpu.ops import sparse as dsp
    import jax.numpy as jnp

    z = np.load(SYNTH)
    rna_X = sp.csr_matrix((z["rd"], z["ri"], z["rp"]), shape=(N, 20000))
    atac_X = sp.csr_matrix((z["ad"], z["ai"], z["ap"]), shape=(N, 25000))
    prot_X, labels = z["prot"], z["labels"]

    atac = mu.AnnData(atac_X)
    with T("tfidf+lsi"):
        ac.pp.tfidf(atac)
        ac.tl.lsi(atac, n_comps=50)
    with T("rna.norm+pca"):
        dX = dsp.from_scipy(rna_X)
        rs = dsp.row_sums(dX)
        inv = 1e4 / jnp.maximum(rs, 1.0)
        vals = jnp.log1p(dsp.scale_rows_data(dX, inv))
        rna_norm = dsp.to_scipy_data(rna_X.tocsr(), vals, device_X=dX)
        scores, _, _, _ = _pca(rna_norm, n_comps=50)
        rna_pca = np.asarray(scores)
    with T("prot.clr+pca"):
        prot = mu.AnnData(prot_X)
        pt.pp.clr(prot)
        scores, _, _, _ = _pca(np.asarray(prot.X), n_comps=30)
        prot_pca = np.asarray(scores)
    with T("hvg"):
        def topvar_dense(X_csr, dn=256):
            Xd = dsp.from_scipy(X_csr)
            cs = np.asarray(dsp.col_sums(Xd))
            c2 = np.asarray(dsp.col_sums(Xd._replace(data=Xd.data**2)))
            n = X_csr.shape[0]
            var = c2 / n - (cs / n) ** 2
            sel = np.argsort(-var)[:dn]
            return np.asarray(X_csr[:, sel].todense(), np.float32)

        Y_rna = topvar_dense(rna_X)
        Y_atac = topvar_dense(atac_X)
    np.savez(
        REPS,
        rna_pca=rna_pca, atac_lsi=atac.obsm["X_lsi"].astype(np.float32),
        prot_pca=prot_pca, Y_rna=Y_rna, Y_atac=Y_atac, labels=labels,
    )
    print("reps cached", flush=True)


def _load_mdata(with_graphs=True):
    import muon_tpu as mu

    z = np.load(REPS)
    rna = mu.AnnData(X=None, shape=(N, 1))
    atac = mu.AnnData(X=None, shape=(N, 1))
    prot = mu.AnnData(X=None, shape=(N, 1))
    rna.obsm["X_pca"] = z["rna_pca"]
    atac.obsm["X_lsi"] = z["atac_lsi"]
    prot.obsm["X_pca"] = z["prot_pca"]
    md = mu.MuData({"rna": rna, "atac": atac, "prot": prot})
    if with_graphs and os.path.exists(GRAPH):
        g = np.load(GRAPH, allow_pickle=False)
        for mod, ad, rep in (("rna", rna, "X_pca"), ("atac", atac, "X_lsi"),
                             ("prot", prot, "X_pca")):
            dm = sp.csr_matrix(
                (g[f"{mod}_dd"], g[f"{mod}_di"], g[f"{mod}_dp"]), shape=(N, N))
            cn = sp.csr_matrix(
                (g[f"{mod}_cd"], g[f"{mod}_ci"], g[f"{mod}_cp"]), shape=(N, N))
            ad.obsp["distances"] = dm
            ad.obsp["connectivities"] = cn
            ad.uns["neighbors"] = {
                "connectivities_key": "connectivities",
                "distances_key": "distances",
                "params": {"n_neighbors": 20, "method": "umap",
                           "random_state": 0, "metric": "euclidean",
                           "use_rep": rep, "n_pcs": -1},
            }
    return md, z["labels"]


def neighbors():
    import muon_tpu as mu

    md, _ = _load_mdata(with_graphs=False)
    out = {}
    for mod, rep in (("rna", "X_pca"), ("atac", "X_lsi"), ("prot", "X_pca")):
        with T(f"neighbors.{mod}"):
            mu.pp.neighbors(md.mod[mod], n_neighbors=20, use_rep=rep)
        dm = md.mod[mod].obsp["distances"].tocsr()
        cn = md.mod[mod].obsp["connectivities"].tocsr()
        out[f"{mod}_dd"], out[f"{mod}_di"], out[f"{mod}_dp"] = (
            dm.data.astype(np.float32), dm.indices.astype(np.int32), dm.indptr)
        out[f"{mod}_cd"], out[f"{mod}_ci"], out[f"{mod}_cp"] = (
            cn.data.astype(np.float32), cn.indices.astype(np.int32), cn.indptr)
    np.savez(GRAPH, **out)
    print("graphs cached", flush=True)


def wnn():
    import muon_tpu as mu

    md, _ = _load_mdata()
    with T("wnn.total"):
        mu.pp.neighbors(md)
    # cache fused graph for leiden/umap experiments
    dm = md.obsp["distances"].tocsr()
    cn = md.obsp["connectivities"].tocsr()
    np.savez(
        f"/tmp/muon_fused_{N}.npz",
        dd=dm.data.astype(np.float32), di=dm.indices.astype(np.int32),
        dp=dm.indptr,
        cd=cn.data.astype(np.float32), ci=cn.indices.astype(np.int32),
        cp=cn.indptr,
    )


def _load_fused(md):
    g = np.load(f"/tmp/muon_fused_{N}.npz")
    md.obsp["distances"] = sp.csr_matrix(
        (g["dd"], g["di"], g["dp"]), shape=(N, N))
    md.obsp["connectivities"] = sp.csr_matrix(
        (g["cd"], g["ci"], g["cp"]), shape=(N, N))
    md.uns["neighbors"] = {
        "connectivities_key": "connectivities", "distances_key": "distances",
        "params": {"n_neighbors": 20, "method": "umap", "random_state": 42,
                   "metric": "euclidean", "use_rep": {}, "n_pcs": {}},
    }


def leiden():
    import muon_tpu as mu
    from sklearn.metrics import adjusted_rand_score

    md, labels = _load_mdata()
    _load_fused(md)
    with T("leiden.total"):
        mu.tl.leiden(md, resolution=1.0)
    print("ARI:", adjusted_rand_score(labels, md.obs["leiden"].to_numpy()),
          flush=True)


def umap():
    import muon_tpu as mu

    md, _ = _load_mdata()
    _load_fused(md)
    with T("umap.total"):
        mu.tl.umap(md)


def mofa():
    from muon_tpu.models.mofa import MOFAConfig, fit_mofa

    z = np.load(REPS)
    cfg = MOFAConfig(n_factors=15, likelihoods=["gaussian"] * 2)
    with T("mofa.svi.100it"):
        fit_mofa(
            [z["Y_rna"], z["Y_atac"]], cfg,
            n_iterations=100, min_iterations=20,
            svi_mode=True, svi_batch_fraction=min(50_000 / N, 1.0),
            elbo_every=5,
        )


if __name__ == "__main__":
    for s in sys.argv[1:]:
        globals()[s]()
