"""ATAC plotting (``ac.pl``) — lands with the plotting milestone."""


def embedding(*args, **kwargs):
    raise NotImplementedError


def pca(*args, **kwargs):
    raise NotImplementedError


def lsi(*args, **kwargs):
    raise NotImplementedError


def umap(*args, **kwargs):
    raise NotImplementedError


def mofa(*args, **kwargs):
    raise NotImplementedError


def dotplot(*args, **kwargs):
    raise NotImplementedError


def tss_enrichment(*args, **kwargs):
    raise NotImplementedError


def fragment_histogram(*args, **kwargs):
    raise NotImplementedError
