"""Straight-line numpy oracles for the vectorised TPU kernels.

These implement the documented canonical semantics (see module docstrings in
icet_tpu.ops) in the most obvious scalar way, as independent checks on the
dense/segmented JAX formulations.  Test-only code.
"""

import numpy as np


def cluster_oracle(radii_by_spike, min_pts, gap, buffer):
    """First radial run with >= min_pts points whose consecutive gaps are all
    <= gap; bounds padded by +-buffer (clamped at 0).  Returns (inner, outer)
    or None."""
    out = {}
    for spike, rads in radii_by_spike.items():
        rads = np.sort(np.asarray(rads))
        run_start = 0
        found = None
        for i in range(1, len(rads) + 1):
            broke = i == len(rads) or (rads[i] - rads[i - 1]) > gap
            if broke:
                if i - run_start >= min_pts:
                    found = (max(rads[run_start] - buffer, 0.0), rads[i - 1] + buffer)
                    break
                run_start = i
        out[spike] = found
    return out


def moments_oracle(points, vid, member, n_voxels):
    """Per-voxel count/mean/sample-covariance via float64 groupby."""
    points = np.asarray(points, np.float64)
    count = np.zeros(n_voxels + 1)
    mean = np.zeros((n_voxels + 1, 3))
    cov = np.zeros((n_voxels + 1, 3, 3))
    for v in range(n_voxels + 1):
        sel = member & (vid == v)
        n = sel.sum()
        count[v] = n
        if n:
            p = points[sel]
            mean[v] = p.mean(axis=0)
            if n > 1:
                c = p - mean[v]
                cov[v] = c.T @ c / (n - 1)
    return count, mean, cov
