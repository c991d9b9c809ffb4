"""mu.tl.mofa — JAX VB engine bridge (implemented in muon_tpu.models.mofa)."""


def mofa(*args, **kwargs):
    raise NotImplementedError("mofa lands with the models.mofa milestone")
