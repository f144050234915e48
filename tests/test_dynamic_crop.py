"""Dynamic-cropping inference: crop coords map back to full-frame space,
tracking follows a moving target, lost frames fall back to full-frame."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.infer.dynamic import (estimate_pose_dynamic,
                                             make_crop_infer_fn)
from deepgraphpose_tpu.infer.predict import make_infer_fn
from deepgraphpose_tpu.models.pose_model import init_model


@pytest.fixture(scope="module")
def setup():
    cfg = PoseConfig(num_joints=2, net_type="resnet_50",
                     all_joints_names=["a", "b"])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 64))
    return cfg, model, variables


def test_crop_coords_map_to_global(setup, rng):
    """Cropping at a given center must reproduce full-frame coords for
    content inside the window (up to edge effects of the random net)."""
    cfg, model, variables = setup
    H, W = 96, 96
    frames = rng.integers(0, 255, (2, H, W, 3), dtype=np.uint8)

    full = make_infer_fn(model, cfg)
    crop = make_crop_infer_fn(model, cfg, (64, 64))

    # crop centered mid-frame
    center = jnp.asarray([H / 2, W / 2], jnp.float32)
    mu_c, lik_c = crop(variables, jnp.asarray(frames), center)
    mu_c = np.asarray(mu_c)

    # offset identity: decoding the same crop through the full-frame fn
    r0, c0 = (H - 64) // 2, (W - 64) // 2
    crops = frames[:, r0:r0 + 64, c0:c0 + 64]
    mu_f, _ = full(variables, jnp.asarray(crops))
    want = np.asarray(mu_f) + np.array([r0, c0]) / cfg.stride
    np.testing.assert_allclose(mu_c, want, atol=1e-4)


def test_dynamic_estimate_tracks_and_falls_back(setup, rng):
    cfg, model, variables = setup
    T, H, W = 12, 96, 96
    frames = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)

    out = estimate_pose_dynamic(model, cfg, variables, frames,
                                crop_hw=(64, 64), chunk=4,
                                detection_threshold=0.0)
    assert out["mu"].shape == (T, 2, 2)
    assert np.isfinite(out["mu"]).all()
    # threshold 0: always detected. The pipelined driver dispatches chunk
    # k before fetching chunk k-1, so the track engages from chunk 2 on.
    assert not out["cropped"][:8].any()
    assert out["cropped"][8:].all()

    # impossible threshold: nothing detected -> everything full-frame
    out2 = estimate_pose_dynamic(model, cfg, variables, frames,
                                 crop_hw=(64, 64), chunk=4,
                                 detection_threshold=2.0)
    assert not out2["cropped"].any()

    # full-frame decode equals the non-dynamic path when never cropped
    full = make_infer_fn(model, cfg)
    mu_ref, _ = full(variables, jnp.asarray(frames[:4]))
    np.testing.assert_allclose(out2["mu"][:4], np.asarray(mu_ref),
                               atol=1e-5)


def test_feed_flush_matches_process_chunk_outputs(setup, rng):
    """The pipelined driver returns every chunk exactly once and the
    full-frame chunks decode identically to the synchronous path."""
    cfg, model, variables = setup
    from deepgraphpose_tpu.infer.dynamic import DynamicTracker

    frames = rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8)
    # impossible threshold: both paths stay full-frame -> exactly comparable
    tr_sync = DynamicTracker(model, cfg, (96, 96), crop_hw=(64, 64),
                             detection_threshold=2.0, chunk=4)
    tr_pipe = DynamicTracker(model, cfg, (96, 96), crop_hw=(64, 64),
                             detection_threshold=2.0, chunk=4)
    sync = [tr_sync.process_chunk(variables, frames[i:i + 4])
            for i in (0, 4)]
    piped = [tr_pipe.feed(variables, frames[i:i + 4]) for i in (0, 4)]
    piped = [r for r in piped if r is not None] + [tr_pipe.flush(variables)]
    assert len(piped) == 2
    for (m1, l1, c1), (m2, l2, c2) in zip(sync, piped):
        np.testing.assert_allclose(m1, m2, atol=1e-6)
        np.testing.assert_allclose(l1, l2, atol=1e-6)
        np.testing.assert_array_equal(c1, c2)
    assert tr_pipe.flush(variables) is None


def test_lost_frame_fallback_writes(setup, rng):
    """Regression: the lost-fallback writes into fetched arrays — must not
    hit numpy's read-only view of jax outputs (threshold forces losses on
    cropped chunks only, so chunk 3+ exercises the fallback)."""
    cfg, model, variables = setup
    from deepgraphpose_tpu.infer.dynamic import DynamicTracker

    frames = rng.integers(0, 255, (12, 96, 96, 3), dtype=np.uint8)
    tr = DynamicTracker(model, cfg, (96, 96), crop_hw=(64, 64),
                        detection_threshold=0.0, chunk=4)
    # engage the track with a synchronous chunk (threshold 0: detected)
    tr.process_chunk(variables, frames[:4])
    assert tr.have_track
    # now force every cropped frame to be 'lost' so the fallback runs
    tr.threshold = 2.0
    mu, lik, cropped = tr.process_chunk(variables, frames[4:8])
    assert not cropped.any()          # all fell back to full-frame
    assert np.isfinite(mu).all()
