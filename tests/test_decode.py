"""DLC-style argmax/locref and top-k decoders vs numpy references."""

import numpy as np

import jax.numpy as jnp

from deepgraphpose_tpu.ops.decode import (argmax_pose_decode,
                                          extract_cnn_output,
                                          get_top_values, multi_pose_decode)


def _np_argmax_decode(part_pred, locref, stride, locref_stdev):
    """Direct port of the reference loop (predict.py:62-77) for one image."""
    scmap = 1 / (1 + np.exp(-part_pred))
    h, w, nj = scmap.shape
    off = (locref.reshape(h, w, nj, 2) * locref_stdev
           if locref is not None else None)
    out = []
    for j in range(nj):
        r, c = np.unravel_index(np.argmax(scmap[:, :, j]), (h, w))
        o = off[r, c, j][::-1] if off is not None else np.zeros(2)
        pos = np.array([r, c], float) * stride + 0.5 * stride + o
        out.append([pos[1], pos[0], scmap[r, c, j]])
    return np.array(out)


def test_argmax_decode_matches_reference_loop(rng):
    b, h, w, nj = 3, 10, 14, 4
    part = rng.standard_normal((b, h, w, nj)).astype(np.float32) * 3
    locref = rng.standard_normal((b, h, w, 2 * nj)).astype(np.float32)
    got = np.asarray(argmax_pose_decode(jnp.asarray(part),
                                        jnp.asarray(locref),
                                        stride=8.0, locref_stdev=7.2801))
    for i in range(b):
        want = _np_argmax_decode(part[i], locref[i], 8.0, 7.2801)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_argmax_decode_without_locref(rng):
    part = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(argmax_pose_decode(jnp.asarray(part), None, stride=4.0))
    for i in range(2):
        want = _np_argmax_decode(part[i], None, 4.0, 0.0)
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_extract_cnn_output_scaling(rng):
    part = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    locref = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    scmap, off = extract_cnn_output(jnp.asarray(part), jnp.asarray(locref),
                                    locref_stdev=7.2801)
    np.testing.assert_allclose(np.asarray(scmap),
                               1 / (1 + np.exp(-part)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(off),
                               locref.reshape(1, 4, 4, 2, 2) * 7.2801,
                               rtol=1e-5)


def test_get_top_values_order(rng):
    scmap = np.zeros((1, 6, 6, 1), np.float32)
    scmap[0, 2, 3, 0] = 5.0
    scmap[0, 4, 1, 0] = 3.0
    scmap[0, 0, 5, 0] = 1.0
    Y, X = get_top_values(jnp.asarray(scmap), 3)
    assert (np.asarray(Y)[0, :, 0].tolist(),
            np.asarray(X)[0, :, 0].tolist()) == ([2, 4, 0], [3, 1, 5])


def test_multi_pose_decode_first_peak_equals_argmax(rng):
    b, h, w, nj = 2, 9, 11, 3
    part = rng.standard_normal((b, h, w, nj)).astype(np.float32) * 3
    locref = rng.standard_normal((b, h, w, 2 * nj)).astype(np.float32)
    multi = np.asarray(multi_pose_decode(jnp.asarray(part),
                                         jnp.asarray(locref), 3))
    single = np.asarray(argmax_pose_decode(jnp.asarray(part),
                                           jnp.asarray(locref)))
    assert multi.shape == (b, nj, 3, 3)
    # first peak = argmax decode, except multi applies offsets unreversed
    # like the reference's multi_pose_predict (x += locref_x there as well);
    # likelihoods must match exactly and be descending per joint
    np.testing.assert_allclose(multi[:, :, 0, 2], single[:, :, 2], rtol=1e-5)
    assert (np.diff(multi[..., 2], axis=2) <= 1e-6).all()


def test_make_multi_infer_fn_and_export(tmp_path, rng):
    import jax

    from deepgraphpose_tpu.core.config import PoseConfig
    from deepgraphpose_tpu.infer.export import export_multi_pose_like_dlc
    from deepgraphpose_tpu.infer.predict import make_multi_infer_fn
    from deepgraphpose_tpu.models.pose_model import init_model

    cfg = PoseConfig(num_joints=2, net_type="resnet_50",
                     all_joints_names=["a", "b"])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    frames = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    infer = make_multi_infer_fn(model, cfg, num_outputs=2)
    pose = np.asarray(infer(variables, jnp.asarray(frames)))
    assert pose.shape == (3, 2, 2, 3)
    assert (np.diff(pose[..., 2], axis=2) <= 1e-6).all()  # peaks descending

    export_multi_pose_like_dlc(pose, "scorer", ["a", "b"],
                               str(tmp_path / "multi"))
    lines = (tmp_path / "multi.csv").read_text().splitlines()
    assert lines[2].split(",")[1:7] == ["x", "y", "likelihood",
                                        "x2", "y2", "likelihood2"]
    assert len(lines) == 3 + 3
    import h5py

    with h5py.File(tmp_path / "multi.h5") as f:
        assert f["df_with_missing"].attrs["num_outputs"] == 2
        assert f["df_with_missing"]["data"].shape == (3, 12)
