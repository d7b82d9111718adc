"""Example 3: full pipeline with GT-depth lifting and XM^2
(reference 3_test_colmap_glomap.py).

Two arms, matching the reference driver's flow (3_test:134-262):

* ``python examples/03_full_pipeline.py`` — a synthetic scene stands in for
  the front end (the GLOMAP gtest pattern) so the full solver-side pipeline
  runs self-contained;
* ``python examples/03_full_pipeline.py TEMPDATA_DIR DEPTH_DIR`` — consume a
  real GLOMAP export (``output.txt``/``filename.txt``/``relative_pose.txt``
  written by ``python -m xmtpu mapper`` or the reference's modified glomap
  binary) plus per-frame depth: ``DEPTH_DIR/K.txt`` (3x3 intrinsics) and
  ``DEPTH_DIR/<image_name>.depth.npy`` (+ optional ``.conf.npy``) for every
  exported frame — GT depth (3_test:212-262) or any saved monodepth output
  (the learned-depth adapter flow lives in
  ``xmtpu.pipeline.features.run_frontend(depth_model=...)``).  Optional
  ``DEPTH_DIR/gt_poses.npz`` (``R_gt`` (N,3,3) c2w rotations, ``t_gt`` (N,3)
  camera centers — the ``pipeline.synthetic`` scene convention) adds the
  ATE/RPE metric block (3_test:383-427).
"""

# run directly from anywhere: the repo root is not on sys.path when the
# script dir is examples/ (python examples/01_....py)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys

import numpy as np

from xmtpu.pipeline import metrics
from xmtpu.pipeline.synthetic import make_scene
from xmtpu.pipeline.xm2 import xm2_solve


def _report(out, R_gt, t_gt):
    """ATE/RPE vs GT (w2c convention), mapping solved frames through the
    cleanup's original-index map."""
    live = out.indices_all > -1
    order = out.indices_all[live]
    R_gt_w2c = np.concatenate([R.T for R in R_gt[live]], axis=1)
    t_w2c = -np.einsum("nba,nb->na", R_gt[live], t_gt[live]).T
    N2 = out.s_real.shape[0]
    Rb = out.R_real.reshape(3, N2, 3).transpose(1, 0, 2)[order]
    m = metrics.evaluate(Rb.transpose(1, 0, 2).reshape(3, -1),
                         out.t_est[:, order], R_gt_w2c, t_w2c)
    return {k: round(float(v), 5) for k, v in m.items()}


def run_real_export(tempdata_dir: str, depth_dir: str, max_rank: int = 5,
                    tol: float = 1e-3, border_margin: int = 0,
                    depth_clip_pct=None, verbose: bool = True):
    """The reference driver's real-data flow (3_test_colmap_glomap.py:
    134-262): parse the GLOMAP export, lift 2-D observations with per-frame
    depth, run the XM^2 two-pass solve.  Returns ``(XM2Result, metrics or
    None)``."""
    from xmtpu.pipeline.frontend import (build_view_graph, lift_dataset,
                                         parse_glomap_tempdata)

    export = parse_glomap_tempdata(tempdata_dir)
    vg = build_view_graph(export.matches, N=export.N, M=export.M)
    K = np.loadtxt(os.path.join(depth_dir, "K.txt")).reshape(3, 3)

    def depth_for_frame(i):
        name = export.filenames[i] or f"frame{i}"
        d = np.load(os.path.join(depth_dir, f"{name}.depth.npy"))
        cpath = os.path.join(depth_dir, f"{name}.conf.npy")
        conf = np.load(cpath) if os.path.exists(cpath) else np.ones_like(d)
        return d, conf

    edges, weights, landmarks = lift_dataset(
        vg, depth_for_frame, lambda i: K,
        border_margin=border_margin, depth_clip_pct=depth_clip_pct)
    rgbs = np.zeros((len(landmarks), 3))
    out = xm2_solve(edges, weights, landmarks, rgbs, vg.N, vg.M,
                    max_rank=max_rank, tol=tol, verbose=verbose)

    m = None
    gt_path = os.path.join(depth_dir, "gt_poses.npz")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
        m = _report(out, np.asarray(gt["R_gt"]), np.asarray(gt["t_gt"]))
    if verbose:
        print(f"[ex3] frames={vg.N} tracks={vg.M} obs={len(edges)} "
              f"scales mean={out.s_real.mean():.4f} "
              f"std={out.s_real.std():.4f}")
        if m is not None:
            print(m)
    return out, m


def run_synthetic(verbose: bool = True):
    scene = make_scene(n_cameras=12, n_points=80, obs_per_camera=40,
                       noise=5e-3, seed=0)
    rng = np.random.default_rng(0)
    bad = rng.choice(len(scene.edges), size=len(scene.edges) // 25,
                     replace=False)
    landmarks = scene.landmarks.copy()
    landmarks[bad] += rng.normal(size=(len(bad), 3)) * 3.0

    out = xm2_solve(scene.edges, scene.weights, landmarks, scene.rgbs,
                    scene.N, scene.M, max_rank=5, tol=1e-6, verbose=verbose)
    m = _report(out, scene.R_gt, scene.t_gt)
    if verbose:
        print(m)
    return out, m


if __name__ == "__main__":
    if len(sys.argv) > 2:
        run_real_export(sys.argv[1], sys.argv[2])
    elif len(sys.argv) > 1:
        raise SystemExit(__doc__)
    else:
        run_synthetic()
