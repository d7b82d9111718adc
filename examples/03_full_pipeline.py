"""Example 3: full pipeline with GT-depth lifting and XM^2
(reference 3_test_colmap_glomap.py).

The COLMAP/GLOMAP front end is external tooling; this example consumes its
export (``tempdata/`` txt files) or a synthetic scene, lifts 2-D features
with depth, and runs the XM^2 two-pass solve.

With no arguments a synthetic scene stands in for the front end (the GLOMAP
gtest pattern) so the full solver-side pipeline runs self-contained.
"""

# run directly from anywhere: the repo root is not on sys.path when the
# script dir is examples/ (python examples/01_....py)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

from xmtpu.pipeline import metrics
from xmtpu.pipeline.synthetic import make_scene
from xmtpu.pipeline.xm2 import xm2_solve

if len(sys.argv) > 1:
    # consume a real GLOMAP export + per-frame depth (user-provided hooks)
    from xmtpu.pipeline.frontend import parse_glomap_tempdata, build_view_graph
    export = parse_glomap_tempdata(sys.argv[1])
    vg = build_view_graph(export.matches)
    raise SystemExit("wire depth maps via xmtpu.pipeline.frontend.lift_dataset")

scene = make_scene(n_cameras=12, n_points=80, obs_per_camera=40, noise=5e-3,
                   seed=0)
rng = np.random.default_rng(0)
bad = rng.choice(len(scene.edges), size=len(scene.edges) // 25, replace=False)
landmarks = scene.landmarks.copy()
landmarks[bad] += rng.normal(size=(len(bad), 3)) * 3.0

out = xm2_solve(scene.edges, scene.weights, landmarks, scene.rgbs,
                scene.N, scene.M, max_rank=5, tol=1e-6)

# accuracy vs GT (w2c convention)
live = out.indices_all > -1
order = out.indices_all[live]
R_gt_w2c = np.concatenate([R.T for R in scene.R_gt[live]], axis=1)
t_w2c = -np.einsum("nba,nb->na", scene.R_gt[live], scene.t_gt[live]).T
N2 = out.s_real.shape[0]
Rb = out.R_real.reshape(3, N2, 3).transpose(1, 0, 2)[order]
m = metrics.evaluate(Rb.transpose(1, 0, 2).reshape(3, -1),
                     out.t_est[:, order], R_gt_w2c, t_w2c)
print({k: round(float(v), 5) for k, v in m.items()})
