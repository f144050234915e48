"""Device-resident training-data pools + pooled train steps.

TPU-first redesign of the per-iteration host feed. The reference feeds ~12
full-resolution tensors per ``sess.run`` (ref: fitdgp.py:801-815); the
round-1 trainer already cut that to one uint8 image tensor + small masks,
but on PCIe- or tunnel-attached hosts the image H2D still dominates the
step. The training sets are small enough to live in HBM outright (Reaching:
52 labeled canvases ~ 97 MB; DGP window pools are capped at
``n_max_frames`` ~ a few GB uint8), so:

* the whole labeled image set (step 0) / per-video frame pool (steps 1-2)
  is uploaded ONCE as a uint8 array;
* every iteration sends only sample indices (bytes);
* the batch is gathered on device inside the jitted train step and
  augmented there (ops/augment_device.py), so aug also stops being host
  work on the critical path.

Falls back transparently (``fits()``) when a pool would exceed the HBM
budget or when the temporal clique needs host-side optical flow (wt > 0,
ref: fitdgp_util.py:454-467 — Farneback runs on host exactly like the
reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.ops.augment_device import (DeviceAugmentConfig,
                                                  augment_batch)
from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams, dgp_loss
from deepgraphpose_tpu.train.steps import _apply_model, dlc_supervised_loss

# pools larger than this stay on the host path (v5e HBM is 16 GB; leave
# room for params, optimizer state, and activations)
DEFAULT_POOL_BUDGET_BYTES = 6 * 1024**3


def pool_fits(n: int, h: int, w: int,
              budget: int = DEFAULT_POOL_BUDGET_BYTES) -> bool:
    return n * h * w * 3 <= budget


class LabeledImagePool:
    """Step-0 labeled set in HBM: canvases, coords, presence, content dims.

    Canvases come from ``_TrainLabeledImages._place`` at ``global_scale``
    with no jitter (one shared placement implementation — the per-sample
    scale *jitter* and any further augmentation happen on device per
    batch).
    """

    def __init__(self, data, cfg: PoseConfig):
        """``data``: a train.fit._TrainLabeledImages instance."""
        ch, cw = data.canvas_hw
        n = len(data)
        nj = cfg.num_joints
        images = np.zeros((n, ch, cw, 3), np.uint8)
        coords = np.zeros((n, nj, 2), np.float32)
        present = np.zeros((n, nj), np.float32)
        content = np.zeros((n, 2), np.float32)
        s = cfg.global_scale
        for i, (img, c) in enumerate(data._get(j) for j in range(n)):
            canvas, cc = data._place(img, c, s, None)
            images[i] = canvas
            present[i] = (~np.isnan(cc[:, 0])).astype(np.float32)
            coords[i] = np.nan_to_num(cc)
            content[i] = (min(max(int(round(img.shape[1] * s)), 1), cw),
                          min(max(int(round(img.shape[0] * s)), 1), ch))

        self.n = n
        self.canvas_hw = data.canvas_hw
        self.images = jax.device_put(images)
        self.coords = jax.device_put(coords)
        self.present = jax.device_put(present)
        self.content_wh = jax.device_put(content)

    @property
    def nbytes(self) -> int:
        return int(self.images.size) * self.images.dtype.itemsize


def _make_dlc_pool_body(model, cfg: PoseConfig,
                        tx: optax.GradientTransformation,
                        aug_cfg: DeviceAugmentConfig | None,
                        bn_train: bool):
    """One pooled step-0 update as a pure traceable function (shared by the
    per-iteration jit and the lax.scan superstep)."""

    def body(variables, opt_state, pool_images, pool_coords, pool_present,
             pool_content, idxs, key):
        images = jnp.take(pool_images, idxs, axis=0)
        coords = jnp.take(pool_coords, idxs, axis=0)
        present = jnp.take(pool_present, idxs, axis=0)
        if aug_cfg is not None:
            content = jnp.take(pool_content, idxs, axis=0)
            images, coords, present = augment_batch(
                key, images, coords, present, aug_cfg, content_wh=content)

        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            heads, updated = _apply_model(model, p, rest, images, bn_train)
            out = dlc_supervised_loss(heads, coords, present, cfg)
            return out["total_loss"], (out, updated)

        grads, (out, updated) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params, **rest}
        if updated is not None:
            new_vars["batch_stats"] = updated["batch_stats"]
        return new_vars, opt_state, out

    return body


def make_pooled_dlc_train_step(model, cfg: PoseConfig,
                               tx: optax.GradientTransformation,
                               aug_cfg: DeviceAugmentConfig | None,
                               bn_train: bool = False):
    """Step-0 train step gathering + augmenting its batch from a pool.

    step(variables, opt_state, pool_images, pool_coords, pool_present,
         pool_content, idxs, key, it)
    """
    body = _make_dlc_pool_body(model, cfg, tx, aug_cfg, bn_train)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, pool_images, pool_coords, pool_present,
             pool_content, idxs, key, it):
        return body(variables, opt_state, pool_images, pool_coords,
                    pool_present, pool_content, idxs, key)

    return step


def make_pooled_dlc_scan_step(model, cfg: PoseConfig,
                              tx: optax.GradientTransformation,
                              aug_cfg: DeviceAugmentConfig | None,
                              bn_train: bool = False):
    """K pooled step-0 updates per dispatch via ``lax.scan``.

    step(variables, opt_state, pool_images, pool_coords, pool_present,
         pool_content, idxs_stack (K, bs), keys (K, ...)) ->
    (variables, opt_state, outs) with every loss term stacked to (K,).

    The per-iteration pooled step already cut H2D to an index vector, but
    over a high-latency link (the axon tunnel) each dispatch still costs a
    host round trip that can dwarf the ~100 ms step itself. Scanning K
    schedule entries per call amortizes that to 1/K; the per-update math is
    the same ``_make_dlc_pool_body`` the per-iteration step runs.
    """
    body = _make_dlc_pool_body(model, cfg, tx, aug_cfg, bn_train)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, pool_images, pool_coords, pool_present,
             pool_content, idxs_stack, keys):
        def f(carry, x):
            v, s = carry
            idxs, key = x
            v, s, out = body(v, s, pool_images, pool_coords, pool_present,
                             pool_content, idxs, key)
            return (v, s), out

        (variables, opt_state), outs = jax.lax.scan(
            f, (variables, opt_state), (idxs_stack, keys))
        return variables, opt_state, outs

    return step


class FramePool:
    """Steps-1/2 per-video frame pool in HBM.

    Holds every frame the precomputed schedule can touch (the video's
    ``chunk`` — visible + hidden + window frames, ref: dataset.py:373-424)
    and maps frame numbers to pool rows.
    """

    def __init__(self, ds):
        frames = np.unique(np.concatenate([
            np.asarray(ds.visible_frames, np.int64),
            np.asarray(ds.hidden_frames, np.int64),
            np.asarray(ds.chunk, np.int64)]))
        self.frames = frames
        self._row = {int(f): i for i, f in enumerate(frames)}
        imgs = ds.get_frames(frames)
        self.images = jax.device_put(np.ascontiguousarray(imgs))
        self.hw = imgs.shape[1:3]

    def rows(self, frame_numbers) -> np.ndarray:
        """Pool rows for frame numbers; padding (-1) maps to row 0 (masked
        out by frame_mask downstream)."""
        return np.array([self._row.get(int(f), 0) for f in frame_numbers],
                        np.int32)

    @property
    def nbytes(self) -> int:
        return int(self.images.size) * self.images.dtype.itemsize


class SegmentedFramePool:
    """Spill tier between "pool fits in HBM" and per-iteration host feed.

    When a video's frame universe exceeds the HBM budget (n_max_frames ~
    thousands of full-res frames x many videos), the reference decodes and
    ships every window from the host each iteration (ref:
    dataset.py:811-821 — the hot-loop cost this kills). Instead, the
    precomputed window schedule is greedily packed into *time segments*:
    every labeled (visible) frame stays pinned in the device array, and the
    remaining frames of consecutive windows accumulate into a segment until
    its frame union would exceed ``capacity_frames``. One H2D upload then
    serves every window of the segment, so each frame crosses the tunnel
    ~once per schedule pass instead of once per overlapping window, and the
    train step keeps its single static-shape gather.

    All segment arrays share one shape ``(n_pinned + capacity, H, W, 3)``
    (short segments pad with row 0) so the jitted step compiles once.
    """

    def __init__(self, ds, windows, capacity_bytes: int):
        """``windows``: the schedule's frame arrays for this video, in
        visit order. ``capacity_bytes``: HBM budget for ONE resident
        segment array (pinned block included)."""
        self.ds = ds
        pinned = np.unique(np.asarray(ds.visible_frames, np.int64))
        self._pinned_row = {int(f): i for i, f in enumerate(pinned)}
        self.pinned = pinned
        self._pinned_block = None  # decoded lazily, reused across segments
        frame_bytes = int(ds.nx_in) * int(ds.ny_in) * 3
        cap = capacity_bytes // max(frame_bytes, 1) - len(pinned)

        needed = []
        for frames in windows:
            need = sorted({int(f) for f in np.asarray(frames).ravel()
                           if int(f) >= 0
                           and int(f) not in self._pinned_row})
            needed.append(need)
        widest = max((len(n) for n in needed), default=0)
        if cap < widest:
            raise ValueError(
                f"SegmentedFramePool: one window needs {widest} non-pinned "
                f"frames but the segment budget holds only {cap}")

        self.segments: list[np.ndarray] = []  # sorted frame numbers
        self.window_segment: list[int] = []
        cur: set[int] = set()
        for need in needed:
            if cur and len(cur | set(need)) > cap:
                self.segments.append(np.array(sorted(cur), np.int64))
                cur = set()
            cur |= set(need)
            self.window_segment.append(len(self.segments))
        self.segments.append(np.array(sorted(cur), np.int64))

        self.capacity = max((len(s) for s in self.segments), default=1)
        self._local = [{int(f): i for i, f in enumerate(seg)}
                       for seg in self.segments]
        self.hw = (int(ds.nx_in), int(ds.ny_in))

    @property
    def n_segments(self) -> int:
        return len(self.segments)

    @property
    def nbytes(self) -> int:
        """Device bytes of ONE resident segment array."""
        h, w = self.hw
        return (len(self.pinned) + self.capacity) * h * w * 3

    def host_segment(self, k: int) -> np.ndarray:
        """Assemble segment ``k``'s host array (pinned block + segment
        frames, padded to the shared shape)."""
        h, w = self.hw
        n = len(self.pinned) + self.capacity
        out = np.zeros((n, h, w, 3), np.uint8)
        if len(self.pinned):
            # the pinned (labeled) block is immutable across segments:
            # decode it once, not once per segment rotation x epoch
            if self._pinned_block is None:
                self._pinned_block = self.ds.get_frames(self.pinned)
            out[:len(self.pinned)] = self._pinned_block
        seg = self.segments[k]
        if len(seg):
            out[len(self.pinned):len(self.pinned) + len(seg)] = \
                self.ds.get_frames(seg)
        return out

    def rows(self, frame_numbers, k: int) -> np.ndarray:
        """Rows into segment ``k``'s array; padding (-1) and unknown
        frames map to row 0 (masked by frame_mask downstream)."""
        local = self._local[k]
        p = len(self.pinned)
        return np.array(
            [self._pinned_row.get(int(f), None)
             if int(f) in self._pinned_row
             else p + local.get(int(f), -p)
             for f in frame_numbers], np.int32)


def plan_spill_runs(schedule, datasets, capacity_bytes: int, rng):
    """Regroup a window schedule for segment-rotating training.

    Returns ``(pools, runs)``: per-dataset SegmentedFramePools (None where
    the dataset has no windows) and a list of runs
    ``(ds_i, seg_idx, [schedule positions])``. Windows keep their original
    relative order inside a run (with a single run this reproduces the
    plain pooled visit order exactly); run order is shuffled so videos and
    segments interleave across the pass rather than training one video to
    convergence before the next.
    """
    per_ds: dict[int, list[int]] = {}
    for pos, (ds_i, _frames) in enumerate(schedule):
        per_ds.setdefault(int(ds_i), []).append(pos)
    pools: list = [None] * len(datasets)
    runs = []
    for ds_i, positions in per_ds.items():
        pool = SegmentedFramePool(
            datasets[ds_i], [schedule[p][1] for p in positions],
            capacity_bytes)
        pools[ds_i] = pool
        by_seg: dict[int, list[int]] = {}
        for w, pos in enumerate(positions):
            by_seg.setdefault(pool.window_segment[w], []).append(pos)
        runs.extend((ds_i, k, ps) for k, ps in sorted(by_seg.items()))
    if len(runs) > 1:
        order = rng.permutation(len(runs))
        runs = [runs[int(i)] for i in order]
    return pools, runs


def iter_spill_segments(pools, runs):
    """Yield ``(ds_i, seg_idx, positions, device_array)`` per run, with the
    next segment's host-assembly + H2D dispatched on a background thread
    while the current segment trains (the 1-slot prefetch hides the
    ~capacity x frame-size transfer behind the run's train steps)."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=1)

    def producer():
        # a producer crash (corrupt frame, device OOM on the segment
        # upload) must surface on the consumer, not strand it on q.get()
        try:
            for ds_i, k, positions in runs:
                arr = jax.device_put(pools[ds_i].host_segment(k))
                q.put((ds_i, k, positions, arr))
            q.put(None)
        except BaseException as e:  # noqa: BLE001 — re-raised on consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    t.join()


def resolve_scan_iters(scan_iters, use_pool: bool, n_dp: int = 0) -> int:
    """Resolve a fit API ``scan_iters`` argument to a chunk length K.

    0/1 disables the superstep; ``None`` = auto — 20 on TPU backends,
    where each dispatch's host round trip rides a high-latency link and
    is worth amortizing, and off elsewhere (CPU tests: per-iteration
    dispatch is cheap and every distinct chunk length costs a compile).
    The superstep requires the device-resident pools and is single-device
    (the DP step already amortizes via n_dp-window global batches)."""
    if not use_pool or n_dp > 1:
        return 0
    if scan_iters is None:
        return 20 if jax.default_backend() == "tpu" else 0
    k = int(scan_iters)
    return k if k > 1 else 0


def iter_scan_chunks(start: int, stop: int, save_every: int | None, k: int):
    """Yield half-open iteration ranges ``[a, b)`` of at most ``k`` steps
    such that a snapshot boundary (``it % save_every == 0``, ``it > 0``) is
    always the LAST iteration of its chunk — the trainer must observe the
    post-boundary carry on host to write that snapshot. ``save_every``
    falsy disables boundary splitting."""
    it = start
    while it < stop:
        end = it + k
        if save_every:
            b = ((max(it, 1) + save_every - 1) // save_every) * save_every
            end = min(end, b + 1)
        end = min(end, stop)
        yield it, end
        it = end


def iter_scan_runs(schedule, start: int, save_every: int | None, k: int):
    """Yield ``(ds_i, a, b)`` chunks of the DGP schedule for the scan
    superstep: at most ``k`` consecutive iterations, all drawn from the
    same dataset (one frame pool per dispatch), with snapshot boundaries
    chunk-final exactly as in :func:`iter_scan_chunks`."""
    it, n = start, len(schedule)
    while it < n:
        ds_i = schedule[it][0]
        end = min(it + k, n)
        if save_every:
            b = ((max(it, 1) + save_every - 1) // save_every) * save_every
            end = min(end, b + 1)
        r = it
        while r < end and schedule[r][0] == ds_i:
            r += 1
        yield ds_i, it, r
        it = r


def augment_dgp_window(key, images, batch: dict, aug_cfg: DeviceAugmentConfig,
                       stride: float, nj: int):
    """On-device augmentation of one DGP window (visible frames only,
    matching ref: fitdgp.py:779): rewrites images and targets. Visibility
    masks are untouched — like the host Augmenter (and the reference's
    imgaug path), a joint displaced off-canvas stays a visible marker with
    an off-scoremap target, so the pooled and host paths train on the same
    distribution."""
    b = images.shape[0]
    vis_m = batch["visible_mask"].reshape(b, nj)
    frame_gate = (jnp.max(vis_m, axis=1) > 0).astype(jnp.float32)
    rc = batch["targets"]
    xy = jnp.stack([rc[..., 1] * stride + stride / 2.0,
                    rc[..., 0] * stride + stride / 2.0], axis=-1)
    images, xy, _ = augment_batch(
        key, images, xy, vis_m, aug_cfg, gate=frame_gate)
    rc_new = jnp.stack([(xy[..., 1] - stride / 2.0) / stride,
                        (xy[..., 0] - stride / 2.0) / stride], axis=-1)
    gated = frame_gate[:, None, None] > 0
    targets = jnp.where(gated, rc_new, rc)
    return images, dict(batch, targets=targets)


def make_pooled_dgp_train_step(model, params_obj: DGPLossParams,
                               tx: optax.GradientTransformation,
                               aug_cfg: DeviceAugmentConfig | None,
                               visible_only: bool = False,
                               bn_train: bool = False,
                               device_flow: bool = False):
    """DGP train step gathering its window from a FramePool.

    step(variables, opt_state, pool_images, rows, batch, key). ``batch`` is
    the small-tensor dict from DGPBatch.as_jnp(); see
    :func:`augment_dgp_window` for the on-device augmentation semantics.

    ``device_flow=True`` computes the temporal-clique flow magnitudes on
    device from the gathered frames (ops/flow_device.py pyramidal LK) so
    wt > 0 training needs no host Farneback round trip — pair it with
    aug_cfg=None, matching the reference's aug-off-when-wt>0 gate
    (ref: fitdgp.py:777-779).
    """
    body = _make_dgp_pool_body(model, params_obj, tx, aug_cfg, visible_only,
                               bn_train, device_flow)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, pool_images, rows, batch, key):
        return body(variables, opt_state, pool_images, rows, batch, key)

    return step


def _make_dgp_pool_body(model, params_obj: DGPLossParams,
                        tx: optax.GradientTransformation,
                        aug_cfg: DeviceAugmentConfig | None,
                        visible_only: bool, bn_train: bool,
                        device_flow: bool):
    """One pooled DGP update as a pure traceable function (shared by the
    per-iteration jit and the lax.scan superstep)."""
    if device_flow and aug_cfg is not None:
        # per-frame independent augmentation would destroy the temporal
        # coherence the LK flow measures (ref gate: fitdgp.py:777-779
        # disables aug when wt > 0)
        raise ValueError("make_pooled_dgp_train_step: aug_cfg must be None "
                         "when device_flow=True (flow needs unaugmented, "
                         "temporally coherent frames)")
    key_name = "total_loss_visible" if visible_only else "total_loss"
    stride = params_obj.stride
    nj = params_obj.nj

    def body(variables, opt_state, pool_images, rows, batch, key):
        images = jnp.take(pool_images, rows, axis=0)
        if aug_cfg is not None:
            images, batch = augment_dgp_window(key, images, batch, aug_cfg,
                                               stride, nj)
        if device_flow:
            from deepgraphpose_tpu.ops.flow_device import \
                flow_magnitude_device

            batch = dict(batch, flow=flow_magnitude_device(images))

        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            heads, updated = _apply_model(model, p, rest, images, bn_train)
            out = dgp_loss(heads["part_pred"], heads["locref"], batch,
                           params_obj)
            return out[key_name], (out, updated)

        grads, (out, updated) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params, **rest}
        if updated is not None:
            new_vars["batch_stats"] = updated["batch_stats"]
        return new_vars, opt_state, out

    return body


def make_pooled_dgp_scan_step(model, params_obj: DGPLossParams,
                              tx: optax.GradientTransformation,
                              aug_cfg: DeviceAugmentConfig | None,
                              visible_only: bool = False,
                              bn_train: bool = False,
                              device_flow: bool = False):
    """K pooled DGP updates per dispatch via ``lax.scan``.

    step(variables, opt_state, pool_images, rows_stack (K, B),
         batch_stack (every DGPBatch tensor with a leading K axis),
         keys (K, ...)) -> (variables, opt_state, outs) with every loss
    term stacked to (K,).

    Same rationale as :func:`make_pooled_dlc_scan_step`: the schedule is
    precomputed, so K windows' label/mask tensors stage to HBM in one
    transfer and the chip runs K optimizer updates without a host round
    trip between them. The per-update math is ``_make_dgp_pool_body``,
    identical to the per-iteration step's.
    """
    body = _make_dgp_pool_body(model, params_obj, tx, aug_cfg, visible_only,
                               bn_train, device_flow)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, pool_images, rows_stack, batch_stack,
             keys):
        def f(carry, x):
            v, s = carry
            rows, batch, key = x
            v, s, out = body(v, s, pool_images, rows, batch, key)
            return (v, s), out

        (variables, opt_state), outs = jax.lax.scan(
            f, (variables, opt_state), (rows_stack, batch_stack, keys))
        return variables, opt_state, outs

    return step


def _make_dgp_group_pool_body(model, params_obj: DGPLossParams,
                              tx: optax.GradientTransformation,
                              aug_cfg: DeviceAugmentConfig | None,
                              visible_only: bool, bn_train: bool,
                              device_flow: bool):
    """One G-window pooled DGP update (single device): gradients averaged
    over a vmapped G-window batch — the same math as the DP pooled step
    (parallel/train_dp.py window_loss + mean_loss) without the mesh, so
    the MXU-fill win of multi-window batches composes with the lax.scan
    dispatch amortization below."""
    if device_flow and aug_cfg is not None:
        raise ValueError("group pool body: aug_cfg must be None when "
                         "device_flow=True (flow needs unaugmented, "
                         "temporally coherent frames)")
    key_name = "total_loss_visible" if visible_only else "total_loss"
    stride = params_obj.stride
    nj = params_obj.nj

    def window_loss(params, rest, pool_images, rows, batch, k):
        images = jnp.take(pool_images, rows, axis=0)
        if aug_cfg is not None:
            images, batch = augment_dgp_window(k, images, batch, aug_cfg,
                                               stride, nj)
        if device_flow:
            from deepgraphpose_tpu.ops.flow_device import \
                flow_magnitude_device

            batch = dict(batch, flow=flow_magnitude_device(images))
        heads, updated = _apply_model(model, params, rest, images, bn_train)
        out = dgp_loss(heads["part_pred"], heads["locref"], batch,
                       params_obj)
        return out[key_name], (out, updated)

    def body(variables, opt_state, pool_images, rows, batch, keys):
        # rows (G, T), batch tensors G-leading, keys (G, 2)
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def mean_loss(p):
            losses, (outs, updated) = jax.vmap(
                lambda r, b, k: window_loss(p, rest, pool_images, r, b, k))(
                    rows, batch, keys)
            mean = jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), (outs, updated))
            return jnp.mean(losses), mean

        grads, (out, updated) = jax.grad(mean_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params, **rest}
        if updated is not None:
            new_vars["batch_stats"] = updated["batch_stats"]
        return new_vars, opt_state, out

    return body


def make_pooled_dgp_group_scan_step(model, params_obj: DGPLossParams,
                                    tx: optax.GradientTransformation,
                                    aug_cfg: DeviceAugmentConfig | None,
                                    visible_only: bool = False,
                                    bn_train: bool = False,
                                    device_flow: bool = False):
    """K pooled G-window updates per dispatch: ``lax.scan`` over
    :func:`_make_dgp_group_pool_body`.

    Composes the repo's two single-chip training levers (PERF.md): the
    multi-window global batch (MXU fill, measured 1.27x at G=2) and the
    scan superstep (dispatch amortization, measured 1.53x) — previously
    mutually exclusive because the G-window path rode the DP machinery,
    which disables scan.

    step(variables, opt_state, pool_images, rows_stack (K, G, T),
         batch_stack (every DGPBatch tensor with leading (K, G)),
         keys (K, G, 2)) -> (variables, opt_state, outs) with every loss
    term stacked to (K,) (each entry already averaged over its G windows).
    """
    body = _make_dgp_group_pool_body(model, params_obj, tx, aug_cfg,
                                     visible_only, bn_train, device_flow)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, pool_images, rows_stack, batch_stack,
             keys):
        def f(carry, x):
            v, s = carry
            rows, batch, key = x
            v, s, out = body(v, s, pool_images, rows, batch, key)
            return (v, s), out

        (variables, opt_state), outs = jax.lax.scan(
            f, (variables, opt_state), (rows_stack, batch_stack, keys))
        return variables, opt_state, outs

    return step


def iter_group_scan_runs(group_ds, start: int, save_every: int | None,
                         group_stride: int, k: int):
    """Yield ``(ds_i, a, b)`` chunks over GROUP indices for the composed
    scan: at most ``k`` consecutive groups, all from one dataset (one
    frame pool per dispatch). ``group_stride`` is the schedule positions
    one group consumes (G); a group gi is snapshot-final when iteration
    ``gi * group_stride`` crosses a ``save_every`` boundary (the trainer
    saves via ``handle(it, stride=G)``), and such groups always end their
    chunk so the post-boundary carry is on host for the save."""
    it, n = start, len(group_ds)
    while it < n:
        ds_i = group_ds[it]
        end = min(it + k, n)
        r = it
        while r < end and group_ds[r] == ds_i:
            r += 1
            gi = r - 1
            if (save_every and gi > 0
                    and (gi * group_stride) % save_every < group_stride):
                break
        yield ds_i, it, r
        it = r
