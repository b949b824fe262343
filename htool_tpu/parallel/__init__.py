from .distributed import DistributedHMatrix, build_distributed_hmatrix, default_mesh

__all__ = ["DistributedHMatrix", "build_distributed_hmatrix", "default_mesh"]
