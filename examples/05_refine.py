"""Example 5: relpose outlier filter + XM + LM bundle refinement
(reference 5_test_ceres.py, with the JAX LM refiner replacing pyceres).

Runs self-contained on a synthetic scene: plant outliers, filter them with
pairwise relative poses, solve with XM^2, then refine poses/points against
the normalized 2-D reprojections.
"""

# run directly from anywhere: the repo root is not on sys.path when the
# script dir is examples/ (python examples/01_....py)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from xmtpu.pipeline.refine import refine_bundle
from xmtpu.pipeline.relpose_filter import relpose_filter
from xmtpu.pipeline.synthetic import make_scene
from xmtpu.pipeline.xm2 import xm2_solve

scene = make_scene(n_cameras=10, n_points=60, obs_per_camera=40, noise=2e-3,
                   seed=1)
rng = np.random.default_rng(1)
bad = rng.choice(len(scene.edges), size=len(scene.edges) // 30, replace=False)
landmarks = scene.landmarks.copy()
landmarks[bad] += rng.normal(size=(len(bad), 3)) * 5.0

# pairwise relative poses (in production: the GLOMAP two-view export)
relposes = {}
for i in range(scene.N):
    for j in range(i + 1, scene.N):
        relposes[(i + 1, j + 1)] = (scene.R_gt[j].T @ scene.R_gt[i], np.zeros(3))

edges, weights, landmarks, rgbs = relpose_filter(
    scene.edges, scene.weights, landmarks, scene.rgbs, relposes)

out = xm2_solve(edges, weights, landmarks, rgbs, scene.N, scene.M,
                max_rank=5, tol=1e-6)

# normalized 2-D observations for refinement (x/z, y/z of the lifted points)
obs2d = out.landmarks[:, :2] / out.landmarks[:, 2:3]
res = refine_bundle(out.edges, obs2d, out.R_real, out.t_est, out.p_est,
                    verbose=True)
print(f"refined in {res.iterations} iterations, final cost {res.final_cost:.3e}")
