"""Coverage for config, logging, datasets, CLI, distributed single-host."""

import os

import numpy as np
import pytest


def test_config_defaults():
    from xmtpu.config import PipelineConfig

    cfg = PipelineConfig()
    assert cfg.graph.frame_min_obs == 10       # checkconnection.py:18
    assert cfg.xm2.percentile == 90.0          # 3_test:321
    assert cfg.solver.max_time == 1000.0
    assert PipelineConfig.adaptive_lam(500, 10) == 50.0   # lam = |E|/N


def test_tee_logger(tmp_path, capsys):
    from xmtpu.utils.logging import tee_stdout

    log = tmp_path / "log.txt"
    with tee_stdout(str(log)):
        print("hello tee")
    assert "hello tee" in log.read_text()
    assert "hello tee" in capsys.readouterr().out


def test_bal_gt_loader():
    from xmtpu.pipeline.datasets import load_BAL_gt

    path = "/root/reference/assets/SIMPLE2"
    if not os.path.exists(os.path.join(path, "gtR.bin")):
        pytest.skip("SIMPLE2 fixture unavailable")
    gt = load_BAL_gt(path)
    assert len(gt) == 93
    R = gt[0]["R"]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def test_colmap_text_parsers(tmp_path):
    from xmtpu.pipeline.datasets import load_colmap_camera, load_colmap_gt

    sparse = tmp_path / "sparse"
    sparse.mkdir()
    (sparse / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500 501 320 240\n")
    (sparse / "images.txt").write_text(
        "# comment\n1 1 0 0 0 0.1 0.2 0.3 1 img1.jpg\n0 0 0\n")
    cams = load_colmap_camera(str(tmp_path))
    assert cams[1]["params"] == [500, 501, 320, 240]
    gt = load_colmap_gt(str(tmp_path))
    np.testing.assert_allclose(gt["img1.jpg"]["R"], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(gt["img1.jpg"]["t"], [0.1, 0.2, 0.3])


def test_replica_loader(tmp_path):
    from xmtpu.pipeline.datasets import load_replica_gt

    pose = np.eye(4).reshape(1, 16)
    np.savetxt(tmp_path / "traj.txt", pose)
    gt = load_replica_gt(str(tmp_path))
    assert "frame000000.jpg" in gt
    np.testing.assert_allclose(gt["frame000000.jpg"]["R"], np.eye(3))


def test_cli_info(tmp_path, capsys):
    from xmtpu.__main__ import main
    from xmtpu.io.bin_format import save_matrix_to_bin

    p = tmp_path / "m.bin"
    save_matrix_to_bin(p, np.zeros((6, 4)))
    assert main(["info", str(p)]) == 0
    assert "6 x 4" in capsys.readouterr().out


def test_init_distributed_noop():
    from xmtpu.parallel.distributed import init_distributed

    # without a coordinator address this must be a no-op
    init_distributed()


def test_timer():
    from xmtpu.utils.timer import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()
