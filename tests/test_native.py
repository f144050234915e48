"""Native C++ batch JPEG decoder vs the OpenCV path."""

import time

import numpy as np
import pytest

from deepgraphpose_tpu import native


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(0)
    frames = []
    bufs = []
    for i in range(24):
        # smooth-ish content so JPEG round-trips closely
        base = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
        frame = cv2.resize(base, (160, 120),
                           interpolation=cv2.INTER_CUBIC)
        frames.append(frame)
        ok, buf = cv2.imencode(
            ".jpg", frame[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 95])
        assert ok
        bufs.append(buf.tobytes())
    return frames, bufs


def test_native_decode_matches_opencv(jpegs):
    import cv2

    frames, bufs = jpegs
    out = native.decode_jpeg_batch(bufs, 120, 160)
    if out is None:
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    assert out.shape == (24, 120, 160, 3) and out.dtype == np.uint8
    for i, buf in enumerate(bufs):
        ocv = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
        ocv = cv2.cvtColor(ocv, cv2.COLOR_BGR2RGB)
        # different libjpeg builds may differ by a couple of IDCT LSBs
        diff = np.abs(out[i].astype(int) - ocv.astype(int))
        assert diff.max() <= 3, f"frame {i}: max diff {diff.max()}"


def test_native_decode_rejects_wrong_dims(jpegs):
    _, bufs = jpegs
    if native.load_framecache_lib() is None:
        pytest.skip("native decoder unavailable")
    assert native.decode_jpeg_batch(bufs[:2], 64, 64) is None
    assert native.decode_jpeg_batch([b"notajpeg"], 120, 160) is None


def test_framecache_get_batch_uses_native(tmp_path):
    import cv2

    from deepgraphpose_tpu.data.video import FrameCache, VideoReader

    path = tmp_path / "v.avi"
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 20.0,
                         (64, 48))
    rng = np.random.default_rng(1)
    truth = []
    for i in range(12):
        f = np.full((48, 64, 3), i * 20, np.uint8)
        f[:, :8] = rng.integers(0, 255, (48, 8, 3), dtype=np.uint8)
        truth.append(f)
        wr.write(f)
    wr.release()

    reader = VideoReader(path)
    cache = FrameCache(reader, indices=range(0, 12, 2))
    batch = cache.get_batch([0, 2, 4, 10])
    assert batch.shape == (4, 48, 64, 3)
    # JPEG round trip keeps flat regions close to the original
    assert np.abs(batch[0, :, 20:, :].astype(int) - 0).max() <= 12
    reader.close()


def test_native_throughput_informational(jpegs):
    """Times native vs cv2 decode. No perf assertion: the CI container has
    a single CPU (os.cpu_count()==1), so the thread pool cannot win there —
    the parallel path pays off on multi-core TPU hosts. Asserts only that
    the native path completes and is not pathologically slow."""
    import cv2

    frames, bufs = jpegs
    if native.load_framecache_lib() is None:
        pytest.skip("native decoder unavailable")
    big = bufs * 20  # 480 frames

    native.decode_jpeg_batch(big[:8], 120, 160)  # warm the thread path
    t0 = time.perf_counter()
    out = native.decode_jpeg_batch(big, 120, 160)
    t_native = time.perf_counter() - t0
    assert out is not None

    t0 = time.perf_counter()
    for buf in big:
        cv2.cvtColor(cv2.imdecode(np.frombuffer(buf, np.uint8),
                                  cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    t_cv2 = time.perf_counter() - t0
    print(f"native {t_native * 1e3:.1f} ms vs cv2 {t_cv2 * 1e3:.1f} ms "
          f"({t_cv2 / t_native:.1f}x)")
    assert t_native < t_cv2 * 20.0  # pathology check only (see docstring)
