"""Oracle harness: run the UNMODIFIED reference python ICET on a scan pair.

Usage (cwd must be /root/reference/python so its relative paths resolve):

    cd /root/reference/python && python /root/repo/tools/oracle/run_refpy.py \
        <scan1.npy> <scan2.npy> <fid> <niter> <RM 0|1> <n_trials>

Environment shims (no reference code is copied or edited):
- tfp/vedo/vtk/ipyvtklink stubs in ./stubs (only tfp.stats.find_bins has
  real logic; vedo's star-import must also expose numpy math names because
  the reference's utils.py uses bare cos/sin in R_tf);
- tf.scatter_nd patched to drop out-of-range indices, reproducing the GPU
  kernel semantics the reference was developed on (modern CPU ScatterNd
  raises InvalidArgument on the -1 pad indices its sigma-point test emits,
  ICET_spherical.py:563-580).

Measured golden values (2026-08-18, this image, tf 2.x CPU):
  frame_804/805, fid=75 (75 theta x 24 phi over [3pi/8, 7pi/8]), niter=12,
  RM=True, 6 seeds:
    X mean  = [-0.0259, -0.1014, 0.0321, -0.0126, -0.0098, -0.0282]
    spread ~= 1e-3 per component (cloud-shuffle + 25-pt voxel subsample RNG)
    pred_stds ~= [3.2e-4, 4.2e-4, 1.6e-4, 2.8e-5, 2.1e-5, 3.7e-5]
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, "stubs"))
sys.path.insert(1, "/root/reference/python")
import numpy as np
import tensorflow as tf

_orig_scatter_nd = tf.scatter_nd


def _gpu_like_scatter_nd(indices, updates, shape, name=None):
    indices = tf.convert_to_tensor(indices)
    updates = tf.convert_to_tensor(updates)
    lim = tf.cast(shape[0], indices.dtype)
    ok = tf.logical_and(indices[:, 0] >= 0, indices[:, 0] < lim)
    return _orig_scatter_nd(tf.boolean_mask(indices, ok),
                            tf.boolean_mask(updates, ok), shape, name)


tf.scatter_nd = _gpu_like_scatter_nd

_orig_gather = tf.gather


def _gpu_like_gather(params, indices, *a, **k):
    """GPU GatherV2 zero-fills out-of-range rows; CPU raises.  The
    reference feeds NaN-cast garbage spike ids for points outside its phi
    band (find_bins NaN -> int32 cast), so GPU semantics are load-bearing
    on clouds that are not fully inside the grid (e.g. sample_pc_1/2)."""
    if k.get("axis") not in (None, 0) or (a and a[0] is not None):
        return _orig_gather(params, indices, *a, **k)
    try:
        idx = tf.convert_to_tensor(indices)
        if not idx.dtype.is_integer:
            return _orig_gather(params, indices, *a, **k)
        n = tf.shape(params)[0]
        valid = tf.logical_and(idx >= 0, idx < tf.cast(n, idx.dtype))
        safe = tf.where(valid, idx, tf.zeros_like(idx))
        out = _orig_gather(params, safe, *a, **k)
        mask_shape = tf.concat(
            [tf.shape(idx), tf.ones_like(tf.shape(out)[tf.rank(idx):])],
            axis=0,
        )
        mask = tf.reshape(tf.cast(valid, out.dtype), mask_shape)
        return out * mask
    except Exception:
        return _orig_gather(params, indices, *a, **k)


tf.gather = _gpu_like_gather

from ICET_spherical import ICET  # noqa: E402


def main():
    f1, f2 = sys.argv[1], sys.argv[2]
    fid = int(sys.argv[3])
    niter = int(sys.argv[4])
    rm = sys.argv[5] == "1"
    trials = int(sys.argv[6])
    s1 = np.load(f1).astype(np.float32)
    s2 = np.load(f2).astype(np.float32)
    for trial in range(trials):
        tf.random.set_seed(trial)
        it = ICET(cloud1=s1, cloud2=s2, fid=fid, niter=niter, draw=False,
                  RM=rm, DNN_filter=False)
        print("refpy X:", np.round(np.asarray(it.X), 5).tolist(), flush=True)


if __name__ == "__main__":
    main()
