"""mu.tl graph tools: snf, leiden, louvain, umap (implemented with ops layer)."""


def snf(*args, **kwargs):
    raise NotImplementedError("snf lands with the graph milestone")


def leiden(*args, **kwargs):
    raise NotImplementedError("leiden lands with the clustering milestone")


def louvain(*args, **kwargs):
    raise NotImplementedError("louvain lands with the clustering milestone")


def umap(*args, **kwargs):
    raise NotImplementedError("umap lands with the embedding milestone")
