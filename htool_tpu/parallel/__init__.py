from .distributed import (
    DistributedHMatrix,
    build_distributed_from_local_hmatrices,
    build_distributed_hmatrix,
    default_mesh,
)
from .info import distributed_hmatrix_info, print_distributed_hmatrix_information

__all__ = ["DistributedHMatrix", "build_distributed_hmatrix", "build_distributed_from_local_hmatrices", "default_mesh", "distributed_hmatrix_info", "print_distributed_hmatrix_information"]
