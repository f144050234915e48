"""Time-sharded streaming inference on the virtual 8-device CPU mesh:
halo-exact temporal displacement and exact cross-shard EWMA smoothing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgraphpose_tpu.parallel.mesh import make_mesh
from deepgraphpose_tpu.parallel.streaming import (ewma_reference,
                                                  make_time_sharded_infer_fn,
                                                  make_time_sharded_smoother)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(8)


def test_smoother_matches_sequential_reference(mesh8, rng):
    T, nj = 64, 4
    mu = rng.standard_normal((T, nj, 2)) * 10 + 50
    lik = rng.uniform(0, 1, (T, nj))
    lik[0] = 0.9  # confident start

    smooth = make_time_sharded_smoother(mesh8, alpha=0.6, pcutoff=0.4)
    got = np.asarray(smooth(jnp.asarray(mu), jnp.asarray(lik)))
    want = ewma_reference(mu, lik, alpha=0.6, pcutoff=0.4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_smoother_constant_track_is_fixed_point(mesh8):
    T, nj = 32, 2
    mu = np.tile(np.array([[3.0, 7.0], [1.0, 2.0]])[None], (T, 1, 1))
    lik = np.full((T, nj), 0.99)
    smooth = make_time_sharded_smoother(mesh8)
    got = np.asarray(smooth(jnp.asarray(mu), jnp.asarray(lik)))
    np.testing.assert_allclose(got, mu, rtol=1e-6)


def test_time_sharded_infer_matches_unsharded(mesh8, rng):
    from deepgraphpose_tpu.core.config import PoseConfig
    from deepgraphpose_tpu.infer.predict import make_infer_fn
    from deepgraphpose_tpu.models.pose_model import init_model

    nj, hw = 3, (32, 32)
    cfg = PoseConfig(num_joints=nj, net_type="resnet_50",
                     all_joints_names=[f"bp{i}" for i in range(nj)])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), hw)

    T = 16  # 2 frames per device
    frames = rng.integers(0, 255, (T, *hw, 3), dtype=np.uint8)

    sharded = make_time_sharded_infer_fn(model, cfg, mesh8)
    mu_s, lik_s, disp = sharded(variables, jnp.asarray(frames))
    mu_s, lik_s, disp = map(np.asarray, (mu_s, lik_s, disp))

    mu_u, lik_u = make_infer_fn(model, cfg)(variables, jnp.asarray(frames))
    mu_u, lik_u = np.asarray(mu_u), np.asarray(lik_u)

    np.testing.assert_allclose(mu_s, mu_u, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(lik_s, lik_u, rtol=1e-4, atol=1e-4)

    # displacement: exact across the 8 shard boundaries
    want = np.zeros((T, nj))
    want[1:] = np.linalg.norm(mu_u[1:] - mu_u[:-1], axis=-1)
    np.testing.assert_allclose(disp, want, rtol=1e-3, atol=1e-3)
    assert disp[0].max() == 0.0


def test_estimate_pose_multichip(mesh8, synthetic_project, tmp_path):
    """Full-video multichip inference over the synthetic project on the
    8-device CPU mesh, with export + smoothing."""
    import jax.numpy as jnp
    from pathlib import Path

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.parallel.streaming import estimate_pose_multichip
    from deepgraphpose_tpu.train.fit import resolve_project

    root, _, _ = synthetic_project
    root = Path(root)
    _, cfg, train_dir = resolve_project(root, 1)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 80))
    snap = ckpt_lib.save_snapshot(train_dir, 2, "mc--0", variables)

    out = estimate_pose_multichip(
        root / "config.yaml", snap, root / "videos" / "synthvid.avi",
        tmp_path, mesh=mesh8, frames_per_device=2, max_frames=20,
        smooth=True, compute_dtype=jnp.float32)
    assert out["x"].shape == (20, 3)
    assert np.isfinite(out["x"]).all()
    assert out["displacement"].shape == (20, 3)
    assert out["displacement"][0].max() == 0.0
    assert (tmp_path / "synthvid.csv").exists()
    assert (tmp_path / "synthvid.h5").exists()


def test_smoother_carry_across_super_batches(mesh8, rng):
    """Streaming a track through the smoother in two halves with carry
    threading equals smoothing the whole track at once."""
    import jax.numpy as jnp

    T, nj = 64, 3
    mu = rng.standard_normal((T, nj, 2)) * 10 + 40
    lik = rng.uniform(0, 1, (T, nj))
    lik[0] = 0.9

    smooth = make_time_sharded_smoother(mesh8, alpha=0.6, pcutoff=0.4)
    whole = np.asarray(smooth(jnp.asarray(mu), jnp.asarray(lik)))

    first = smooth(jnp.asarray(mu[:32]), jnp.asarray(lik[:32]))
    carry = first[31]
    second = smooth(jnp.asarray(mu[32:]), jnp.asarray(lik[32:]),
                    carry, jnp.ones((1,)))
    streamed = np.concatenate([np.asarray(first), np.asarray(second)])
    np.testing.assert_allclose(streamed, whole, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(whole, ewma_reference(mu, lik, 0.6, 0.4),
                               rtol=1e-5, atol=1e-5)


def test_estimate_pose_multichip_int8(mesh8, synthetic_project, tmp_path):
    """The int8 backbone composes with time sharding: qvariables replicate,
    frames shard, same ppermute halo."""
    import jax.numpy as jnp
    from pathlib import Path

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.parallel.streaming import estimate_pose_multichip
    from deepgraphpose_tpu.train.fit import resolve_project

    root, _, _ = synthetic_project
    root = Path(root)
    _, cfg, train_dir = resolve_project(root, 1)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (64, 80))
    snap = ckpt_lib.save_snapshot(train_dir, 2, "mcq--0", variables)

    out = estimate_pose_multichip(
        root / "config.yaml", snap, root / "videos" / "synthvid.avi",
        tmp_path, mesh=mesh8, frames_per_device=2, max_frames=16,
        compute_dtype=jnp.float32, quantize=True, save_pose=False)
    assert out["x"].shape == (16, 3)
    assert np.isfinite(out["x"]).all()
