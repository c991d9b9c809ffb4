"""mu.pl plotting (implemented in the plotting milestone)."""


def scatter(*args, **kwargs):
    raise NotImplementedError


def embedding(*args, **kwargs):
    raise NotImplementedError


def mofa(*args, **kwargs):
    raise NotImplementedError


def umap(*args, **kwargs):
    raise NotImplementedError


def histogram(*args, **kwargs):
    raise NotImplementedError


def mofa_loadings(*args, **kwargs):
    raise NotImplementedError
