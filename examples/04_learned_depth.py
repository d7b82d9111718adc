"""Example 4: learned-depth pipeline (reference 4_test_unidepth.py).

Images -> SIFT/match/tracks -> MONOCULAR DEPTH MODEL -> lift -> XM^2 solve.

The depth model is pluggable through the one-method adapter
``infer(rgb) -> (depth, confidence)`` (xmtpu.pipeline.depth):

* ``--unidepth``: real UniDepthV2 inference (external package + checkpoint,
  exactly as the reference clones it into deps/; 4_test_unidepth.py:202-224);
* default: the noisy ground-truth stand-in (depth-proportional error,
  confidence anti-correlated with depth) on a rendered textured-plane scene
  — the same solver-side statistics without the 600 MB checkpoint.

Solver-side driver-4 semantics reproduced in either case:

* weights = confidence^2, border margin + percentile depth clipping in the
  lifting step (4_test:234-245);
* XM^2 residuals divided by observation depth (``relative=True``,
  4_test:321) — absolute depth error grows with distance for monocular nets;
* tol = 1e-3 operating point (4_test:293).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from xmtpu.pipeline import metrics
from xmtpu.pipeline.depth import NoisyDepthModel, UniDepthModel
from xmtpu.pipeline.features import run_frontend
from xmtpu.pipeline.xm2 import xm2_solve


def render_scene(n_views: int = 8, size: int = 192, seed: int = 5):
    """Views of a textured 3-D plane with analytic depth + GT poses (the
    rendered-pixel scene of tests/test_images_end_to_end.py)."""
    rng = np.random.default_rng(seed)
    f = 0.9 * size
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1.0]])
    tex = (rng.random((64, 64)) > 0.5).astype(np.float64)
    tex = np.kron(tex, np.ones((8, 8)))  # blocky texture, SIFT-friendly
    images, depths, R_gt, t_gt = [], [], [], []
    n_plane = np.array([0.0, 0.0, 1.0])
    for i in range(n_views):
        ang = 0.15 * (i - n_views / 2) / n_views
        ca, sa = np.cos(ang), np.sin(ang)
        R = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
        t = np.array([0.4 * i / n_views, 0.05 * np.sin(i), -2.5 - 0.1 * i])
        uu, vv = np.meshgrid(np.arange(size), np.arange(size))
        rays = np.linalg.inv(K) @ np.stack(
            [uu.ravel(), vv.ravel(), np.ones(size * size)])
        rays_w = R @ rays
        nc = n_plane @ rays_w
        d0 = n_plane @ (np.zeros(3) - t)
        z = np.where(np.abs(nc) > 1e-9, d0 / nc, 0.0)
        pw = t[:, None] + rays_w * z
        ok = (z.reshape(size, size) > 0)
        px = np.clip(((pw[0] + 3) * 80).astype(int) % 512, 0, 511)
        py = np.clip(((pw[1] + 3) * 80).astype(int) % 512, 0, 511)
        img = np.where(ok.ravel(),
                       tex[py % tex.shape[0], px % tex.shape[1]], 0.0)
        img8 = (img.reshape(size, size) * 255).astype(np.uint8)
        images.append(np.stack([img8] * 3, axis=-1))
        depth = z.reshape(size, size).copy()
        depth[~ok] = 0.0
        depths.append(depth)
        R_gt.append(R)
        t_gt.append(t)
    return images, depths, np.stack(R_gt), np.stack(t_gt), K


def main():
    images, depths, R_gt, t_gt, K = render_scene()
    if "--unidepth" in sys.argv:
        model = UniDepthModel()          # real monocular net (external)
    else:
        model = NoisyDepthModel(images, depths, rel_sigma=0.01, seed=4)

    edges, weights, landmarks, relposes = run_frontend(
        images, K, depth_model=model, max_features=1500, border_margin=3,
        depth_clip_pct=98.0)
    N = int(edges[:, 0].max())
    M = int(edges[:, 1].max())
    print(f"[frontend] {len(images)} images -> {len(edges)} observations, "
          f"N={N} M={M}")

    out = xm2_solve(edges, weights, landmarks, np.zeros((len(edges), 3)),
                    N, M, max_rank=3, tol=1e-3, relative=True,
                    percentile=90.0)

    live = out.indices_all > -1
    order = out.indices_all[live]
    R_gt_w2c = np.concatenate([R.T for R in R_gt[live]], axis=1)
    t_w2c = -np.einsum("nba,nb->na", R_gt[live], t_gt[live]).T
    N2 = out.s_real.shape[0]
    Rb = out.R_real.reshape(3, N2, 3).transpose(1, 0, 2)[order]
    m = metrics.evaluate(Rb.transpose(1, 0, 2).reshape(3, -1),
                         out.t_est[:, order], R_gt_w2c, t_w2c, robust=False)
    print({k: round(float(v), 5) for k, v in m.items()})


if __name__ == "__main__":
    main()
