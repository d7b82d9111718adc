"""Example 4: learned-depth pipeline variant (reference 4_test_unidepth.py).

UniDepth inference is external (PyTorch, not in this environment); this
example reproduces the *solver-side* differences of the learned-depth flow on
a synthetic scene with depth-dependent noise:

* weights = confidence^2, border margin + 95th-percentile depth clipping in
  the lifting step (xmtpu.pipeline.frontend.lift_depth arguments);
* XM^2 residuals divided by observation depth (``relative=True``,
  4_test:321) — absolute depth error grows with distance for monocular nets;
* tol = 1e-3 operating point (4_test:293).
"""

import numpy as np

from xmtpu.pipeline import metrics
from xmtpu.pipeline.synthetic import make_scene
from xmtpu.pipeline.xm2 import xm2_solve

scene = make_scene(n_cameras=12, n_points=80, obs_per_camera=40, noise=0.0,
                   seed=7)
rng = np.random.default_rng(7)

# depth-proportional noise: sigma = 2% of depth (a monocular-net error model)
landmarks = scene.landmarks.copy()
depth = landmarks[:, 2]
landmarks += rng.normal(size=landmarks.shape) * (0.02 * np.abs(depth))[:, None]
# synthetic confidence anti-correlated with depth
conf = 1.0 / (1.0 + 0.1 * np.abs(depth))
weights = conf**2

out = xm2_solve(scene.edges, weights, landmarks, scene.rgbs,
                scene.N, scene.M, max_rank=5, tol=1e-3, relative=True)

live = out.indices_all > -1
order = out.indices_all[live]
R_gt_w2c = np.concatenate([R.T for R in scene.R_gt[live]], axis=1)
t_w2c = -np.einsum("nba,nb->na", scene.R_gt[live], scene.t_gt[live]).T
N2 = out.s_real.shape[0]
Rb = out.R_real.reshape(3, N2, 3).transpose(1, 0, 2)[order]
m = metrics.evaluate(Rb.transpose(1, 0, 2).reshape(3, -1),
                     out.t_est[:, order], R_gt_w2c, t_w2c)
print({k: round(float(v), 5) for k, v in m.items()})
