"""Segment-rotating frame pools (train/device_data.py SegmentedFramePool):
the spill tier between "pool fits in HBM" and the per-iteration host feed
(ref hot-loop cost: dataset.py:811-821)."""

import os
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(__file__))

from deepgraphpose_tpu.train import device_data as dd  # noqa: E402
from deepgraphpose_tpu.train.fit import (fit_dgp, fit_dlc,  # noqa: E402
                                         resolve_project)


def _make_proj(tmp_path, name):
    from conftest import make_synthetic_project

    root = str(tmp_path / name)
    make_synthetic_project(root, n_frames=12, n_labeled=3, hw=(48, 64))
    cfg_path = Path(root, "dlc-models/iteration-0/"
                    "SynthJan1-trainset95shuffle1", "train", "pose_cfg.yaml")
    raw = yaml.safe_load(cfg_path.read_text())
    raw["net_type"] = "mobilenet_v2_0.35"
    raw["multi_step"] = [[0.002, 100000]]
    cfg_path.write_text(yaml.safe_dump(raw))
    return root


def _dataset(tmp_path, name):
    from deepgraphpose_tpu.data.batcher import MultiDataset
    from deepgraphpose_tpu.train.fit import dgp_video_sets

    root = _make_proj(tmp_path, name)
    proj, cfg, _ = resolve_project(root, 1)
    mds = MultiDataset(proj, cfg, dgp_video_sets(proj, root), ns=2,
                       n_max_frames=10)
    return root, mds


def test_segmented_pool_partition_and_gather(tmp_path):
    """Every window's frames resolve inside its assigned segment, and the
    segment gather reproduces the host frames exactly."""
    _, mds = _dataset(tmp_path, "part")
    d = mds.datasets[0]
    frames_all = np.unique(np.concatenate(
        [d.visible_frames, d.hidden_frames, d.chunk]))
    windows = [frames_all[i:i + 3] for i in range(0, len(frames_all) - 2, 2)]
    frame_bytes = d.nx_in * d.ny_in * 3
    capacity = (len(np.unique(d.visible_frames)) + 3) * frame_bytes
    pool = dd.SegmentedFramePool(d, windows, capacity)
    assert pool.n_segments > 1  # budget actually forced a split
    assert len(pool.window_segment) == len(windows)
    for w, frames in enumerate(windows):
        k = pool.window_segment[w]
        seg = pool.host_segment(k)
        got = seg[pool.rows(frames, k)]
        np.testing.assert_array_equal(got, d.get_frames(frames))
    # all segment arrays share one shape (single compiled program)
    shapes = {pool.host_segment(k).shape for k in range(pool.n_segments)}
    assert len(shapes) == 1
    # padding (-1) maps to row 0
    assert pool.rows([-1], 0)[0] == 0


def test_segmented_pool_rejects_impossible_window(tmp_path):
    _, mds = _dataset(tmp_path, "rej")
    d = mds.datasets[0]
    hid = np.asarray(d.hidden_frames)[:4]
    try:
        dd.SegmentedFramePool(d, [hid], d.nx_in * d.ny_in * 3)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "segment budget" in str(e)


def test_plan_spill_runs_covers_schedule(tmp_path):
    """The regrouped runs visit every schedule position exactly once and
    stay within their run's (dataset, segment)."""
    _, mds = _dataset(tmp_path, "plan")
    d = mds.datasets[0]
    frames_all = np.unique(np.concatenate(
        [d.visible_frames, d.hidden_frames, d.chunk]))
    schedule = [(0, frames_all[i:i + 3])
                for i in range(0, len(frames_all) - 2, 1)]
    frame_bytes = d.nx_in * d.ny_in * 3
    cap = (len(np.unique(d.visible_frames)) + 4) * frame_bytes
    pools, runs = dd.plan_spill_runs(schedule, mds.datasets, cap,
                                     np.random.default_rng(0))
    seen = []
    for ds_i, k, positions in runs:
        assert ds_i == 0 and 0 <= k < pools[0].n_segments
        seen.extend(positions)
    assert sorted(seen) == list(range(len(schedule)))


def test_fit_dgp_spill_smoke(tmp_path, monkeypatch, capsys):
    """Over-budget pools train via rotating segments (not the host feed)
    and produce a final snapshot."""
    root = _make_proj(tmp_path, "e2e")
    fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
            bn_train=False, jitter=False)
    fit_dgp(dlcpath=root, batch_size=3, maxiters=6, displayiters=2,
            saveiters=100, ns=2, n_max_frames=10, nepoch=1, wt=0.0,
            aug=False, bn_train=False, snapshot="snapshot-step0-final--0")
    # hand the same fit an over-budget pool: 48x64 frames, ~17 in the
    # universe -> est ~157 KB; 120 KB budget forces >= 2 segments while a
    # 60 KB segment still holds pinned(3) + 3-frame windows
    monkeypatch.setattr(dd, "DEFAULT_POOL_BUDGET_BYTES", 120_000)
    snap = fit_dgp(dlcpath=root, batch_size=3, maxiters=6, displayiters=2,
                   saveiters=100, ns=2, n_max_frames=10, nepoch=1, wt=0.0,
                   aug=False, bn_train=False, debug="_spill",
                   snapshot="snapshot-step0-final--0")
    out = capsys.readouterr().out
    assert "segment-rotating frame pools" in out
    assert snap is not None and snap.exists()


def test_fit_dgp_spill_device_flow(tmp_path, monkeypatch, capsys):
    """wt > 0 + device_flow also rides the spill tier (LK flow from the
    gathered segment window, no host Farneback)."""
    root = _make_proj(tmp_path, "flow")
    fit_dlc(dlcpath=root, maxiters=2, displayiters=1, saveiters=100,
            bn_train=False, jitter=False)
    monkeypatch.setattr(dd, "DEFAULT_POOL_BUDGET_BYTES", 120_000)
    snap = fit_dgp(dlcpath=root, batch_size=3, maxiters=4, displayiters=2,
                   saveiters=100, ns=2, n_max_frames=10, nepoch=1, wt=1.0,
                   aug=False, bn_train=False, device_flow=True,
                   snapshot="snapshot-step0-final--0")
    out = capsys.readouterr().out
    assert "segment-rotating frame pools" in out
    assert "LK flow" in out
    assert snap is not None and snap.exists()


def test_iter_spill_segments_propagates_producer_errors():
    """A producer-thread failure (corrupt frame, device OOM) must raise on
    the consumer instead of stranding it on q.get() forever."""
    import pytest

    class BoomPool:
        def host_segment(self, k):
            raise RuntimeError("decode exploded")

    runs = [(0, 0, [0, 1])]
    with pytest.raises(RuntimeError, match="decode exploded"):
        for _ in dd.iter_spill_segments([BoomPool()], runs):
            pass
