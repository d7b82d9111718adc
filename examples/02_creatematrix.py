"""Example 2: Q assembly from view-graph + 3-D observations, then solve
(reference 2_test_creatematrix.py on the SIMPLE2 / BAL fixtures).

Flow: load observations -> dedupe edges -> clean/anchor/largest-component ->
assemble (C, Abar) -> staircase solve -> recover poses -> accuracy vs GT.
"""

# run directly from anywhere: the repo root is not on sys.path when the
# script dir is examples/ (python examples/01_....py)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

import xmtpu
from xmtpu.pipeline import metrics
from xmtpu.pipeline.datasets import load_BAL_gt
from xmtpu.pipeline.graph import checklandmarks
from xmtpu.pipeline.recover import recover_XM

dataset_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/assets/SIMPLE2"

data, _ = xmtpu.load_matrix_from_bin(dataset_path + "/landmark.bin")

# dedupe duplicate edges in the view graph
edges = data[:, :2].astype(int)
_, uniq = np.unique(edges, axis=0, return_index=True)
edges, data = edges[uniq], data[uniq]
weights, landmarks = data[:, 5], data[:, 2:5]
rgbs = np.zeros((len(edges), 3))
N, M = int(edges[:, 0].max()), int(edges[:, 1].max())

edges, landmarks, weights, rgbs, indices_all = checklandmarks(
    edges, landmarks, weights, rgbs, N, M, frame_min_obs=0)

lam = 0.0
C, Abar = xmtpu.create_matrix_arrays(weights, edges, landmarks)
res = xmtpu.solve_arrays(C, max_rank=5, tol=1e-1, lam=lam, max_time=1000)
R_real, s_real, p_est, t_est = recover_XM(C, res.R, res.s_ex, Abar, lam)
N = s_real.shape[0]

# accuracy vs the BAL ground truth (gtR.bin / gtt.bin)
try:
    gt = load_BAL_gt(dataset_path)
except FileNotFoundError:
    gt = None
if gt is not None:
    t_gt = np.zeros((3, N))
    R_gt = np.zeros((3, 3 * N))
    for i in range(N):
        i_index = int(np.where(indices_all == i)[0][0])
        t_gt[:, i] = gt[i_index]["t"]
        R_gt[:, 3 * i:3 * i + 3] = gt[i_index]["R"]
    m = metrics.evaluate(R_real, t_est, R_gt, t_gt)
    print({k: round(v, 5) for k, v in m.items()})
