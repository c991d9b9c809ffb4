"""ATAC tools (``ac.tl``): LSI, peak annotation, fragments, QC, motifs.

TPU-native reimplementation of reference muon/_atac/tools.py. LSI runs as
a randomized truncated SVD on device (replacing ARPACK svds at
muon/_atac/tools.py:53); fragment-level tools stream through the
pure-native bgzf/tabix engine (muon_tpu/native/fragments.cpp, replacing
pysam) into device aggregation kernels (muon_tpu.ops.pileup).
"""

from __future__ import annotations

import os

from typing import Optional, Union
from warnings import warn

import numpy as np
import pandas as pd

from .._core.anndata import AnnData
from .._core.mudata import MuData
from . import utils

__all__ = [
    "lsi",
    "add_peak_annotation",
    "add_peak_annotation_gene_names",
    "add_genes_peaks_groups",
    "rank_peaks_groups",
    "locate_file",
    "locate_genome",
    "locate_fragments",
    "initialise_default_files",
    "count_fragments_features",
    "tss_enrichment",
    "nucleosome_signal",
    "fetch_regions_to_df",
    "scan_sequences",
    "get_sequences",
]


def _get_atac(data):
    if isinstance(data, AnnData):
        return data
    if isinstance(data, MuData) and "atac" in data.mod:
        return data.mod["atac"]
    raise TypeError("Expected AnnData or MuData object with 'atac' modality")


def lsi(
    data: Union[AnnData, MuData],
    scale_embeddings: bool = True,
    n_comps: int = 50,
    n_iter: int = 7,
    random_state: int = 0,
    mesh=None,
):
    """Latent Semantic Indexing via randomized truncated SVD on TPU
    (semantics of reference muon/_atac/tools.py:29-71: components in
    descending order, embeddings optionally z-scored, stdev = s/√(n−1)).

    ``mesh`` (or the ``mu.set_options(mesh=...)`` global): run the SVD as
    the SPMD program parallel/pipeline.sharded_rsvd over the "cells"
    mesh axis; a sparse X carrying device shards from a sharded
    ``ac.pp.tfidf`` is reused without re-upload.

    Writes ``obsm["X_lsi"]``, ``varm["LSI"]``, ``uns["lsi"]["stdev"]``.
    """
    adata = _get_atac(data)
    from .._core.config import current_mesh

    mesh = current_mesh(mesh)
    n_comps = min(n_comps, adata.X.shape[1])
    if mesh is not None:
        from scipy.sparse import csr_matrix, issparse

        from ..parallel.pipeline import (
            _mesh_of, shard_rows, sharded_rsvd,
        )

        X = adata.X
        Xs = getattr(X, "_muon_tpu_sharded", None)
        if (
            Xs is None
            or Xs.shape != X.shape
            or _mesh_of(Xs) is not mesh
        ):
            Xc = X.tocsr() if issparse(X) else csr_matrix(np.asarray(X))
            Xs = shard_rows(Xc, mesh)
        U, s, Vt = sharded_rsvd(
            Xs, k=n_comps, n_iter=n_iter, seed=random_state
        )
    else:
        from ..ops.linalg import randomized_svd

        U, s, Vt = randomized_svd(
            adata.X, k=n_comps, n_iter=n_iter, seed=random_state
        )
    U = np.asarray(U)
    s = np.asarray(s)
    Vt = np.asarray(Vt)

    # reference stores the (unit-norm) left singular vectors, then z-scores
    cell_embeddings = U
    if scale_embeddings:
        cell_embeddings = (
            cell_embeddings - cell_embeddings.mean(axis=0)
        ) / cell_embeddings.std(axis=0)

    stdev = s / np.sqrt(adata.X.shape[0] - 1)

    adata.obsm["X_lsi"] = cell_embeddings
    adata.uns["lsi"] = {"stdev": stdev}
    adata.varm["LSI"] = Vt.T
    return None


# ---------------------------------------------------------------------------
# Peak annotation (host-side pandas bookkeeping; reference
# muon/_atac/tools.py:83-373)
# ---------------------------------------------------------------------------


def _region_from_underscored(token: str) -> str:
    """``chr1_840000_840700`` → ``chr1:840000-840700`` (split at the first
    two underscores only; anything after stays inside the end field)."""
    seqname, _, span = token.partition("_")
    lo, _, hi = span.partition("_")
    return f"{seqname}:{lo}-{hi}"


def _split_field(cell) -> list:
    """Fan one table cell out into its ``;``-separated parts (a non-string
    cell, e.g. an already-numeric distance, is a single part)."""
    if isinstance(cell, str):
        return cell.split(";")
    return [cell]


def _to_nullable_int(parts: list):
    """Parse distance tokens to a nullable-Int64 array; blanks and NaN/None
    become ``pd.NA``. Falls back to the raw objects if any token is not an
    integer literal (matching the tolerant reference behavior)."""
    vals = []
    for p in parts:
        if p is None or (isinstance(p, float) and np.isnan(p)) or p is pd.NA:
            vals.append(pd.NA)
        elif isinstance(p, str):
            vals.append(pd.NA if p.strip() == "" else p)
        else:
            vals.append(p)
    try:
        return pd.array(
            [pd.NA if v is pd.NA else int(v) for v in vals], dtype="Int64"
        )
    except (ValueError, TypeError):
        return np.asarray(vals, dtype=object)


def add_peak_annotation(
    data: Union[AnnData, MuData],
    annotation,
    sep: str = "\t",
    return_annotation: bool = False,
):
    """Parse a CellRanger ``peak_annotation.tsv`` table into
    ``uns["atac"]["peak_annotation"]``.

    Behavioral contract (reference muon/_atac/tools.py:83-165): one output
    row per (peak, gene) pair — ``;``-separated gene/distance/peak_type
    records fan out into individual rows; peak ids are normalized to
    ``chrom:start-end``; distances are nullable Int64 with missing values
    as ``pd.NA``; the result is indexed by gene.
    """
    adata = _get_atac(data)

    table = (
        annotation.copy()
        if isinstance(annotation, pd.DataFrame)
        else pd.read_csv(annotation, sep=sep)
    )

    # -- normalize peak identifiers ------------------------------------
    if "peak" in table.columns:
        peak_ids = [
            _region_from_underscored(p) if isinstance(p, str) else p
            for p in table["peak"]
        ]
    elif {"chrom", "start", "end"}.issubset(table.columns):
        peak_ids = [
            f"{c}:{s}-{e}"
            for c, s, e in zip(table["chrom"], table["start"], table["end"])
        ]
    else:
        raise AttributeError(
            "Peak annotation does not contain neither peak column nor "
            "chrom, start, and end columns."
        )

    # -- fan multi-entry records out row by row ------------------------
    out_peak: list = []
    out_gene: list = []
    out_dist: list = []
    out_type: list = []
    genes_in = table["gene"] if "gene" in table.columns else [""] * len(table)
    dists_in = (
        table["distance"] if "distance" in table.columns else [pd.NA] * len(table)
    )
    types_in = (
        table["peak_type"] if "peak_type" in table.columns else [""] * len(table)
    )
    for pid, g, d, t in zip(peak_ids, genes_in, dists_in, types_in):
        gs, ds, ts = _split_field(g), _split_field(d), _split_field(t)
        width = max(len(gs), len(ds), len(ts))
        if len(gs) == 1 and width > 1:
            gs = gs * width
        if len(ds) == 1 and width > 1:
            ds = ds * width
        if len(ts) == 1 and width > 1:
            ts = ts * width
        out_peak.extend([pid] * width)
        out_gene.extend(gs)
        out_dist.extend(ds)
        out_type.extend(ts)

    def _clean_str(xs):
        return np.asarray(
            [
                ""
                if x is None or x is pd.NA or (isinstance(x, float) and np.isnan(x))
                else x
                for x in xs
            ],
            dtype=object,
        )

    result = pd.DataFrame(
        {
            "peak": _clean_str(out_peak),
            "distance": _to_nullable_int(out_dist),
            "peak_type": _clean_str(out_type),
        },
        index=pd.Index(_clean_str(out_gene), name="gene"),
    )

    adata.uns.setdefault("atac", dict())["peak_annotation"] = result
    if return_annotation:
        return result


def add_peak_annotation_gene_names(
    data: Union[AnnData, MuData],
    gene_names: Optional[pd.DataFrame] = None,
    join_on: Optional[str] = None,
    return_annotation: bool = False,
):
    """Join gene names from the rna modality's var into the peak annotation
    (reference muon/_atac/tools.py:168-247)."""
    if isinstance(data, AnnData):
        adata = data
    elif isinstance(data, MuData) and "atac" in data.mod:
        adata = data.mod["atac"]
        if gene_names is None:
            if "rna" in data.mod:
                gene_names = data.mod["rna"].var
            else:
                raise ValueError(
                    "There is no .mod['rna'] modality. Provide `gene_names` "
                    "as a pd.DataFrame."
                )
    else:
        raise TypeError("Expected AnnData or MuData object with 'atac' modality")

    if "atac" not in adata.uns or "peak_annotation" not in adata.uns["atac"]:
        raise KeyError(
            "There is no peak annotation yet. Run "
            "muon_tpu.atac.tl.add_peak_annotation first."
        )

    ann = adata.uns["atac"]["peak_annotation"]

    if join_on is None:
        join_on = "gene_ids"

    # Does the annotation index actually hold gene IDs? If it already holds
    # display names there is nothing to translate — just fix the axis label.
    known_ids = set(map(str, gene_names[join_on].to_numpy()))
    hits_ids = any(str(g) in known_ids for g in ann.index)
    if not hits_ids:
        if ann.index.isin(gene_names.index).any():
            ann = ann.rename_axis("gene_name")
            adata.uns["atac"]["peak_annotation"] = ann
        return ann if return_annotation else None

    # id → display-name lookup; a left merge keeps annotation row order and
    # (like the reference's index join) duplicates rows for duplicated ids
    lookup = pd.DataFrame(
        {
            join_on: gene_names[join_on].to_numpy(),
            "gene_name": gene_names.index.to_numpy(),
        }
    )
    flat = ann.reset_index()
    flat = flat.rename(columns={flat.columns[0]: join_on})
    translated = flat.merge(lookup, on=join_on, how="left")
    translated["gene_name"] = translated["gene_name"].fillna("")
    translated = translated.set_index("gene_name")
    adata.uns["atac"]["peak_annotation"] = translated

    if return_annotation:
        return translated


def add_genes_peaks_groups(
    data: Union[AnnData, MuData],
    add_peak_type: bool = False,
    add_distance: bool = False,
):
    """Attach gene names (and optionally peak_type/distance) to ranked peaks
    in ``uns["rank_genes_groups"]`` (reference muon/_atac/tools.py:251-334)."""
    adata = _get_atac(data)

    if "rank_genes_groups" not in adata.uns:
        raise KeyError(
            "There is no .uns['rank_genes_groups'] yet. Run "
            "muon_tpu.tl.rank_genes_groups first."
        )
    if "atac" not in adata.uns or "peak_annotation" not in adata.uns["atac"]:
        raise KeyError(
            "There is no peak annotation yet. Run "
            "muon_tpu.atac.pp.add_peak_annotation first."
        )

    annotation = adata.uns["atac"]["peak_annotation"]
    if "peak" not in annotation.columns:
        raise KeyError("Peak annotation has to contain 'peak' column.")

    index_name = annotation.index.name
    columns = [index_name]
    if add_peak_type:
        if "peak_type" not in annotation.columns:
            raise KeyError("Peak annotation has to contain 'peak_type' column.")
        columns.append("peak_type")
        adata.uns["rank_genes_groups"]["peak_type"] = {}
    if add_distance:
        if "distance" not in annotation.columns:
            raise KeyError("Peak annotation has to contain 'distance' column.")
        columns.append("distance")
        adata.uns["rank_genes_groups"]["distance"] = {}
        annotation = annotation.copy()
        annotation["distance"] = annotation["distance"].astype(str)
    peaks_genes = (
        annotation.reset_index(drop=False)
        .loc[:, ["peak", *columns]]
        .set_index("peak")
    )

    adata.uns["rank_genes_groups"]["genes"] = {}
    for i in adata.uns["rank_genes_groups"]["names"].dtype.names:
        ann_ordered = (
            pd.DataFrame(adata.uns["rank_genes_groups"]["names"][i])
            .rename({0: "peak"}, axis=1)
            .join(peaks_genes, on="peak", how="inner", sort=False)
            .groupby("peak", sort=False)
            .agg(lambda s: ", ".join(map(str, s)))
        )
        adata.uns["rank_genes_groups"]["genes"][i] = ann_ordered[index_name].values
        if add_peak_type:
            adata.uns["rank_genes_groups"]["peak_type"][i] = (
                ann_ordered["peak_type"].values
            )
        if add_distance:
            adata.uns["rank_genes_groups"]["distance"][i] = (
                ann_ordered["distance"].values
            )

    adata.uns["rank_genes_groups"]["genes"] = pd.DataFrame(
        adata.uns["rank_genes_groups"]["genes"]
    ).to_records(index=False)


def rank_peaks_groups(
    data: Union[AnnData, MuData],
    groupby: str,
    add_peak_type: bool = False,
    add_distance: bool = False,
    **kwargs,
):
    """Rank peaks per cluster then annotate with gene names — device-side
    differential accessibility (muon_tpu.tl.rank_genes_groups) followed by
    add_genes_peaks_groups (reference muon/_atac/tools.py:337-373, which
    delegates ranking to scanpy)."""
    adata = _get_atac(data)

    from .._core.tools_de import rank_genes_groups

    rank_genes_groups(adata, groupby, **kwargs)
    add_genes_peaks_groups(
        adata, add_peak_type=add_peak_type, add_distance=add_distance
    )


# ---------------------------------------------------------------------------
# File registry (reference muon/_atac/tools.py:569-743)
# ---------------------------------------------------------------------------


def locate_file(data: Union[AnnData, MuData], key: str, file: str):
    """Register an existing file path under ``uns["files"][key]``
    (reference muon/_atac/tools.py:569-596)."""
    adata = _get_atac(data)
    if not os.path.exists(file):
        raise FileNotFoundError(f"File {file} does not exist")
    if "files" not in adata.uns:
        adata.uns["files"] = dict()
    adata.uns["files"][key] = file


def locate_genome(data: Union[AnnData, MuData], fasta_file: str):
    """Register the genome FASTA under ``uns["files"]["genome"]``
    (reference muon/_atac/tools.py:599-618)."""
    if not isinstance(data, AnnData) and not (
        isinstance(data, MuData) and "atac" in data.mod
    ):
        raise TypeError("Expected AnnData or MuData object with 'atac' modality")
    locate_file(data, "genome", fasta_file)


def locate_fragments(
    data: Union[AnnData, MuData], fragments: str, return_fragments: bool = False
):
    """Validate a tabix-indexed fragments file and register it under
    ``uns["files"]["fragments"]`` (reference muon/_atac/tools.py:640-690 —
    connection opened with the native engine instead of pysam)."""
    frag = None
    try:
        adata = _get_atac(data)

        from .fragments import TabixFragments

        frag = TabixFragments(fragments)

        if "files" not in adata.uns:
            adata.uns["files"] = dict()
        adata.uns["files"]["fragments"] = fragments

        if return_fragments:
            return frag
    except Exception as e:
        print(e)
    finally:
        if frag is not None and not return_fragments:
            frag.close()


def initialise_default_files(data: Union[AnnData, MuData], path):
    """Auto-locate CellRanger sidecar files next to the count matrix
    (reference muon/_atac/tools.py:693-743)."""
    adata = _get_atac(data)

    default_annotation = os.path.join(
        os.path.dirname(str(path)), "atac_peak_annotation.tsv"
    )
    if os.path.exists(default_annotation):
        try:
            add_peak_annotation(adata, default_annotation)
            print(
                f"Added peak annotation from {default_annotation} to "
                ".uns['atac']['peak_annotation']"
            )
            if isinstance(data, MuData):
                try:
                    add_peak_annotation_gene_names(data)
                    print(
                        "Added gene names to peak annotation in "
                        ".uns['atac']['peak_annotation']"
                    )
                except Exception:
                    pass
        except AttributeError:
            warn(
                f"Peak annotation from {default_annotation} could not be "
                "added. Please check the annotation file is formatted "
                "correctly."
            )

    default_fragments = os.path.join(
        os.path.dirname(str(path)), "atac_fragments.tsv.gz"
    )
    if os.path.exists(default_fragments):
        print(f"Located fragments file: {default_fragments}")
        locate_fragments(adata, default_fragments)


# ---------------------------------------------------------------------------
# Fragment aggregation + QC (reference muon/_atac/tools.py:746-1263); the
# per-record Python loops become native batch fetches + device kernels.
# ---------------------------------------------------------------------------


def _open_fragments(adata, barcodes: Optional[str] = None):
    if "files" not in adata.uns or "fragments" not in adata.uns["files"]:
        raise KeyError(
            "There is no fragments file located yet. Run "
            "muon_tpu.atac.tl.locate_fragments first."
        )
    from .fragments import TabixFragments

    if barcodes and barcodes in adata.obs.columns:
        bcs = adata.obs[barcodes].astype(str).tolist()
    else:
        bcs = adata.obs.index.astype(str).tolist()
    return TabixFragments(adata.uns["files"]["fragments"], barcodes=bcs)


def _resolve_features(data, features):
    if features is not None:
        return features
    if (
        isinstance(data, MuData)
        and "rna" in data.mod
        and "interval" in data.mod["rna"].var.columns
    ):
        from ..rna.utils import get_gene_annotation_from_rna

        return get_gene_annotation_from_rna(data)
    raise ValueError(
        "Argument `features` is required. It should be a BED-like DataFrame "
        "with gene coordinates and names."
    )


def count_fragments_features(
    data: Union[AnnData, MuData],
    features: Optional[pd.DataFrame] = None,
    stranded: bool = False,
    extend_upstream: int = 2000,
    extend_downstream: int = 0,
    count_reads: bool = True,
) -> AnnData:
    """Count fragments overlapping features → cells × features AnnData
    (reference muon/_atac/tools.py:746-891). Promoter extension is strand-
    aware when ``stranded=True``; ``count_reads`` accumulates the per-
    fragment read support (score column) instead of 1."""
    from scipy import sparse as sp

    adata = _get_atac(data)
    features = _resolve_features(data, features)

    f_cols = np.array([c.lower() for c in features.columns.values])
    for col in ("start", "end"):
        if col not in f_cols:
            raise ValueError(f"No column with feature {col}s could be found")
    chrom_col = None
    for col in ("chromosome", "chrom", "chr"):
        if col in f_cols:
            chrom_col = col
            break
    if chrom_col is None:
        raise ValueError("No column with chromosome for features could be found")

    start_col = features.columns.values[np.where(f_cols == "start")[0][0]]
    end_col = features.columns.values[np.where(f_cols == "end")[0][0]]
    chr_col = features.columns.values[np.where(f_cols == chrom_col)[0][0]]
    strand_col = None
    if stranded:
        if "strand" not in f_cols:
            raise ValueError("No column with strand for features could be found")
        strand_col = features.columns.values[np.where(f_cols == "strand")[0][0]]

    if count_reads:
        warn(
            "From v0.2, by default, unique fragments will be counted instead "
            "of reads.",
            FutureWarning,
            stacklevel=2,
        )

    n = adata.n_obs
    n_features = features.shape[0]

    with _open_fragments(adata) as frags:
        starts = features[start_col].to_numpy().astype(np.int64)
        ends = features[end_col].to_numpy().astype(np.int64)
        chroms = features[chr_col].astype(str).to_numpy()
        if stranded:
            minus = (features[strand_col].astype(str) == "-").to_numpy()
            f_from = np.where(
                minus, starts - extend_downstream, starts - extend_upstream
            )
            f_to = np.where(
                minus, ends + extend_upstream, ends + extend_downstream
            )
        else:
            f_from = starts - extend_upstream
            f_to = ends + extend_downstream
        # one native call for all features (the reference's per-feature
        # fetch loop is its hot I/O path, muon/_atac/tools.py:859-878)
        res = frags.fetch_many(chroms, f_from, f_to)

    offs = res["region_offsets"]
    rows = np.repeat(
        np.arange(n_features, dtype=np.int64), np.diff(offs)
    )
    cells = res["cells"]
    keep = cells >= 0
    vals = (
        res["scores"][keep]
        if count_reads
        else np.ones(int(keep.sum()), np.int64)
    )
    mx = sp.coo_matrix(
        (vals, (rows[keep], cells[keep])),
        shape=(n_features, n),
        dtype=np.int64,
    ).tocsr()

    return AnnData(X=mx.transpose().tocsr(), obs=adata.obs.copy(), var=features)


def tss_enrichment(
    data: Union[AnnData, MuData],
    features: Optional[pd.DataFrame] = None,
    extend_upstream: int = 1000,
    extend_downstream: int = 1000,
    n_tss: int = 2000,
    return_tss: bool = True,
    random_state=None,
    barcodes: Optional[str] = None,
):
    """ENCODE TSS enrichment: pile up fragment coverage around ≤ n_tss
    sampled TSS, score = center mean / flank mean; writes
    ``obs["tss_score"]`` (reference muon/_atac/tools.py:894-984). The
    per-fragment pileup runs as a device scatter+cumsum kernel
    (muon_tpu.ops.pileup)."""
    adata = _get_atac(data)
    features = _resolve_features(data, features)

    if features.shape[0] > n_tss:
        features = features.sample(n=n_tss, random_state=random_state)

    tss_pileup = _tss_pileup(
        adata,
        features,
        extend_upstream=extend_upstream,
        extend_downstream=extend_downstream,
        barcodes=barcodes,
    )

    flank_means, center_means = _calculate_tss_score(data=tss_pileup)
    tss_pileup.X = tss_pileup.X / flank_means[:, None]
    tss_scores = center_means / flank_means

    adata.obs["tss_score"] = tss_scores
    tss_pileup.obs["tss_score"] = tss_scores

    if return_tss:
        return tss_pileup


def _tss_pileup(
    adata: AnnData,
    features: pd.DataFrame,
    extend_upstream: int = 1000,
    extend_downstream: int = 1000,
    barcodes: Optional[str] = None,
) -> AnnData:
    """Pile up fragments around TSS into a cells × positions AnnData
    (reference muon/_atac/tools.py:987-1068)."""
    n = adata.n_obs
    n_pos = extend_downstream + extend_upstream + 1

    with _open_fragments(adata, barcodes=barcodes) as frags:
        chromosomes = set(frags.contigs)
        features = features[features["Chromosome"].isin(chromosomes)]
        f_chr = features["Chromosome"].astype(str).to_numpy()
        f_start = features["Start"].to_numpy().astype(np.int64)
        res = frags.fetch_many(
            f_chr, f_start - extend_upstream, f_start + extend_downstream
        )

    from ..ops.pileup import interval_pileup

    if len(res["starts"]):
        offs = res["region_offsets"]
        tss_start = np.repeat(f_start - extend_upstream, np.diff(offs))
        mx = interval_pileup(
            res["cells"],
            res["starts"] - tss_start,
            res["ends"] - tss_start,
            res["scores"],
            n_cells=n,
            n_pos=n_pos,
        )
    else:
        mx = np.zeros((n, n_pos), np.int32)

    anno = pd.DataFrame(
        {"TSS_position": range(-extend_upstream, extend_downstream + 1)}
    )
    anno.index = anno.index.astype(str)
    return AnnData(X=mx, obs=adata.obs.copy(), var=anno)


def _calculate_tss_score(data: AnnData, flank_size: int = 100, center_size: int = 1001):
    """ENCODE TSS score: center mean / flank mean per cell (reference
    muon/_atac/tools.py:1071-1106)."""
    region_size = data.X.shape[1]
    if center_size > region_size:
        raise ValueError(
            f"`center_size` ({center_size}) must smaller than the piled up "
            f"region ({region_size})."
        )
    if center_size % 2 == 0:
        raise ValueError(
            f"`center_size` must be an uneven number, but is {center_size}."
        )

    X = np.asarray(data.X, dtype=np.float64)
    flanks = np.hstack((X[:, :flank_size], X[:, -flank_size:]))
    flank_means = flanks.mean(axis=1)
    flank_means[flank_means == 0] = flank_means.mean()

    center_dist = (region_size - center_size) // 2
    centers = X[:, center_dist:-center_dist] if center_dist else X
    center_means = centers.mean(axis=1)
    return flank_means, center_means


def nucleosome_signal(
    data: Union[AnnData, MuData],
    n: Optional[Union[int, float]] = None,
    nucleosome_free_upper_bound: int = 147,
    mononuleosomal_upper_bound: int = 294,
    barcodes: Optional[str] = None,
):
    """Per-cell ratio of mono-nucleosomal (147–294 bp) to nucleosome-free
    (<147 bp) fragments over the first n records → ``obs["nucleosome_signal"]``
    (reference muon/_atac/tools.py:1109-1201). The record scan runs in the
    native engine; the binning is one vectorized pass."""
    adata = _get_atac(data)

    with _open_fragments(adata, barcodes=barcodes) as frags:
        if n is None:
            n = int(adata.n_obs * 1e4)
        res = frags.stream(int(n))

    cells = res["cells"]
    lengths = res["ends"] - res["starts"]
    keep = cells >= 0
    cells, lengths = cells[keep], lengths[keep]

    nf = np.bincount(
        cells[lengths < nucleosome_free_upper_bound], minlength=adata.n_obs
    )
    mono = np.bincount(
        cells[
            (lengths >= nucleosome_free_upper_bound)
            & (lengths < mononuleosomal_upper_bound)
        ],
        minlength=adata.n_obs,
    )
    mat = np.stack([nf, mono], axis=1)
    mat[mat[:, 0] == 0, :] += 1  # prevent division by 0 (reference :1185)
    adata.obs["nucleosome_signal"] = mat[:, 1] / mat[:, 0]
    return None


def fetch_regions_to_df(
    fragment_path: str,
    features: Union[pd.DataFrame, str],
    extend_upstream: int = 0,
    extend_downstream: int = 0,
    relative_coordinates: bool = False,
) -> pd.DataFrame:
    """Fetch fragments over regions into a tidy DataFrame (reference
    muon/_atac/tools.py:1204-1263)."""
    from .fragments import TabixFragments

    if isinstance(features, str):
        features = utils.parse_region_string(features)

    dfs = []
    with TabixFragments(fragment_path) as frags:
        for i in range(features.shape[0]):
            f = features.iloc[i]
            res = frags.fetch(
                str(f.Chromosome),
                int(f.Start) - extend_upstream,
                int(f.End) + extend_downstream,
                names=True,
            )
            if len(res["starts"]) == 0:
                continue
            df = pd.DataFrame(
                {
                    "Chromosome": str(f.Chromosome),
                    "Start": res["starts"],
                    "End": res["ends"],
                    "Cell": res["names"],
                    "Score": res["scores"],
                }
            )
            df["Feature"] = f"{f.Chromosome}_{f.Start}_{f.End}"
            if relative_coordinates:
                middle = int(f.Start + (f.End - f.Start) / 2)
                df["Start"] = df["Start"] - middle
                df["End"] = df["End"] - middle
            dfs.append(df)

    return pd.concat(dfs, axis=0, ignore_index=True)


# ---------------------------------------------------------------------------
# Motifs (separate milestone: muon_tpu/atac/motifs.py)
# ---------------------------------------------------------------------------


def scan_sequences(*args, **kwargs):
    """PWM motif scanning over sequences (reference muon/_atac/tools.py:446-517)
    as a batched one-hot log-odds convolution on device."""
    from .motifs import scan_sequences as _impl

    return _impl(*args, **kwargs)


def get_sequences(*args, **kwargs):
    """Extract peak sequences from an indexed genome FASTA (reference
    muon/_atac/tools.py:520-566) via the in-repo FASTA reader."""
    from .motifs import get_sequences as _impl

    return _impl(*args, **kwargs)
