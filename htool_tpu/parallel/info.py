"""Distributed H-matrix information — min/mean/max reductions over
partitions plus the global compression ratio, mirroring
``get_distributed_hmatrix_information`` / ``print_distributed_hmatrix_
information`` (``hmatrix/hmatrix_distributed_output.hpp:31-225``)."""

from __future__ import annotations

import numpy as np

from .distributed import DistributedHMatrix

__all__ = ["distributed_hmatrix_info", "print_distributed_hmatrix_information"]


def distributed_hmatrix_info(d: DistributedHMatrix) -> dict:
    M, N = d.shape
    Pn = d.n_partitions

    per_part = {p: dict(dense=0.0, lr=0.0, nblocks_d=0, nblocks_l=0, ranks=[]) for p in range(Pn)}
    # bucket rows are stacked per partition along axis 0
    for b in d.dense_buckets:
        t = np.asarray(b.t_sizes, np.float64)
        s = np.asarray(b.s_sizes, np.float64)
        for p in range(Pn):
            per_part[p]["dense"] += float(np.sum(t[p] * s[p]))
            per_part[p]["nblocks_d"] += int(np.sum(t[p] > 0))
    for b in d.lr_buckets:
        t = np.asarray(b.t_sizes, np.float64)
        s = np.asarray(b.s_sizes, np.float64)
        r = np.asarray(b.ranks, np.float64)
        for p in range(Pn):
            per_part[p]["lr"] += float(np.sum(r[p] * (t[p] + s[p])))
            per_part[p]["nblocks_l"] += int(np.sum(r[p] > 0))
            per_part[p]["ranks"].extend(r[p][r[p] > 0].tolist())

    local_generated = np.array(
        [per_part[p]["dense"] + per_part[p]["lr"] for p in range(Pn)]
    )
    local_sizes = d.part_sizes.astype(np.float64)
    local_totals = local_sizes * N
    local_ratio = np.where(local_generated > 0, local_totals / np.maximum(local_generated, 1), np.inf)
    all_ranks = [x for p in range(Pn) for x in per_part[p]["ranks"]]

    def mmm(v):
        v = np.asarray(v, np.float64)
        return dict(min=float(v.min()), mean=float(v.mean()), max=float(v.max()))

    info = dict(
        target_size=M,
        source_size=N,
        n_partitions=Pn,
        # global reductions (the MPI_Reduce of the reference)
        compression_ratio=float(M) * N / float(local_generated.sum()),
        space_saving=1.0 - float(local_generated.sum()) / (float(M) * N),
        local_compression_ratio=mmm(local_ratio),
        local_n_dense_blocks=mmm([per_part[p]["nblocks_d"] for p in range(Pn)]),
        local_n_low_rank_blocks=mmm([per_part[p]["nblocks_l"] for p in range(Pn)]),
        rank=mmm(all_ranks) if all_ranks else dict(min=0, mean=0.0, max=0),
    )
    # timing reductions from the per-partition build infos, when present
    local_infos = d.info.get("local_infos")
    if local_infos:
        for key in ("assembly_walltime", "block_tree_walltime"):
            vals = [li[key] for li in local_infos if key in li]
            if vals:
                info[key] = mmm(vals)
    return info


def print_distributed_hmatrix_information(d: DistributedHMatrix) -> str:
    info = distributed_hmatrix_info(d)
    lines = ["Distributed HMatrix information:"]
    for k in sorted(info):
        v = info[k]
        if isinstance(v, dict):
            lines.append(
                f"  {k:<28} min {v['min']:.6g} | mean {v['mean']:.6g} | max {v['max']:.6g}"
            )
        else:
            lines.append(f"  {k:<28} {v}")
    s = "\n".join(lines)
    print(s)
    return s
