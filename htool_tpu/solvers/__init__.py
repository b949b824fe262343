from .ddm import DDMSolver, SchwarzPreconditioner, build_geometric_overlap
from .geneo import GeneoCoarseSpace, build_geneo_coarse_space
from .krylov import KrylovResult, cg, gmres

__all__ = [
    "DDMSolver",
    "SchwarzPreconditioner",
    "build_geometric_overlap",
    "GeneoCoarseSpace",
    "build_geneo_coarse_space",
    "KrylovResult",
    "cg",
    "gmres",
]
