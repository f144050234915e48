"""Training entry points: fit_dlc (step 0), fit_dgp_labeledonly (step 1),
fit_dgp (step 2).

Orchestration contract mirrors the reference (ref:
src/deepgraphpose/models/fitdgp.py:53-254, 257-546, 549-845): same step
indices, snapshot naming, skip-if-final-exists idempotency, optimizer
settings, and DGP hyperparameter defaults — but the execution model is
TPU-native: one jitted train step per phase with on-device target
rasterization, fixed-shape masked batches, host batch assembly overlapped
with device compute via a background prefetcher.
"""

from __future__ import annotations

import csv
import functools
import time
from pathlib import Path

import jax
import numpy as np

from deepgraphpose_tpu.core import checkpoint as ckpt_lib
from deepgraphpose_tpu.core import paths as paths_lib
from deepgraphpose_tpu.core.config import PoseConfig, ProjectConfig
from deepgraphpose_tpu.data import project as project_io
from deepgraphpose_tpu.data.augment import Augmenter
from deepgraphpose_tpu.data.batcher import (MultiDataset, assemble_batch,
                                            generate_batch_schedule)
from deepgraphpose_tpu.data.prefetch import DevicePrefetcher
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.ops.dgp_objective import (DGPLossParams,
                                                 compute_spatial_bounds)
from deepgraphpose_tpu.train import steps as steps_lib
from deepgraphpose_tpu.utils import profiling


# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------

def resolve_project(dlcpath: str | Path, shuffle: int = 1,
                    trainingsetindex: int = 0):
    """(proj_cfg, pose_cfg, train_dir) from a DLC project directory."""
    from deepgraphpose_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    dlcpath = Path(dlcpath)
    proj = ProjectConfig.from_yaml(dlcpath / "config.yaml")
    proj.project_path = str(dlcpath)
    train_dir = paths_lib.train_dir(dlcpath, proj, shuffle, trainingsetindex)
    pose_cfg = PoseConfig.from_yaml(train_dir / "pose_cfg.yaml")
    pose_cfg.project_path = str(dlcpath)
    return proj, pose_cfg, train_dir


def _group_schedule_dp(schedule, n_dp: int, rng) -> list:
    """Group same-video windows into global steps of ``n_dp`` windows.

    Windows within one global step must share a frame pool (one video), so
    the schedule is partitioned per video and chunked; each video's tail
    group wrap-pads from its own head to keep shapes static. Global steps
    are then shuffled to restore the cross-video interleave the
    partitioning destroys (ref schedule semantics: fitdgp_util.py
    gen_batch's ratio-interleaved windows).
    """
    by_ds: dict[int, list] = {}
    for ds_i, frames in schedule:
        by_ds.setdefault(int(ds_i), []).append(frames)
    groups = []
    for ds_i, wins in by_ds.items():
        for j in range(0, len(wins), n_dp):
            grp = list(wins[j:j + n_dp])
            k = 0
            while len(grp) < n_dp:
                grp.append(wins[k % len(wins)])
                k += 1
            groups.append((ds_i, grp))
    return [groups[i] for i in rng.permutation(len(groups))]


def _resolve_data_parallel(data_parallel) -> int:
    """Device count for ``data_parallel`` (0 = single-device path)."""
    if not data_parallel:
        return 0
    n = len(jax.devices()) if data_parallel is True else int(data_parallel)
    if n > len(jax.devices()):
        raise ValueError(f"data_parallel={n} exceeds the "
                         f"{len(jax.devices())} visible devices")
    return n if n > 1 else 0


def dgp_video_sets(proj: ProjectConfig, dlcpath: str | Path) -> list[str]:
    """videos_dgp/ contents, else the project's video_sets
    (ref: fitdgp.py:594-604)."""
    vids = paths_lib.list_videos(paths_lib.videos_dgp_dir(dlcpath))
    if vids:
        return vids
    out = []
    for v in proj.video_sets:
        p = Path(v)
        if not p.is_absolute():
            p = Path(dlcpath) / p
        out.append(str(p))
    return out


def _log_stats(train_dir: Path, rows: list, header: list) -> None:
    path = train_dir / "learning_stats.csv"
    new = not path.exists()
    with open(path, "a", newline="") as f:
        wr = csv.writer(f)
        if new:
            wr.writerow(header)
        wr.writerows(rows)


def _make_tb_writer(train_dir, tb_log: bool):
    """Opt-in TensorBoard scalar writer under <train_dir>/log
    (ref: train.py:131-133, fitdgp.py:128-130 TF summaries)."""
    if not tb_log:
        return None
    from deepgraphpose_tpu.utils.events import ScalarEventWriter

    return ScalarEventWriter(Path(train_dir) / "log")


def _tf_ckpt_exists(prefix: Path) -> bool:
    """True if ``prefix`` names a TF checkpoint (prefix + .index file)."""
    return Path(str(prefix) + ".index").exists()


def _warm_start(variables: dict, cfg: PoseConfig, train_dir: Path,
                snapshot: str | None, allow_init_weights: bool = True
                ) -> tuple[dict, bool]:
    """Restore backbone+heads from (in order of preference):

    1. our msgpack snapshot ``<train_dir>/<snapshot>.ckpt``,
    2. a TF1 snapshot ``<train_dir>/<snapshot>`` (prefix with .index) — the
       reference's ``--dlcsnapshot`` hand-off (ref: fitdgp.py:132-149),
    3. ``cfg.init_weights`` as a TF checkpoint (slim ImageNet
       ``resnet_v1_50.ckpt``; backbone scope only, ref: fitdgp.py:119-127).

    Returns ``(variables, warmed)`` — ``warmed=False`` means random init,
    which callers use to auto-enable trainable batch-norm (a from-scratch
    extension the reference doesn't have; it always warm-starts).
    """
    if snapshot:
        snap_path = Path(train_dir) / f"{snapshot}{ckpt_lib.CKPT_SUFFIX}"
        if snap_path.exists():
            return ckpt_lib.restore_backbone_and_heads(variables,
                                                       snap_path), True
        tf_prefix = Path(train_dir) / snapshot
        if _tf_ckpt_exists(tf_prefix):
            from deepgraphpose_tpu.models import tf_import

            variables, report = tf_import.import_tf_checkpoint(
                variables, str(tf_prefix), net_type=cfg.net_type,
                scopes=("resnet", "pose"))
            print(f"imported TF1 snapshot {tf_prefix} "
                  f"({len(report['imported'])} vars)")
            return variables, True
    if allow_init_weights and cfg.init_weights:
        init_prefix = Path(cfg.init_weights)
        if not init_prefix.is_absolute() and cfg.project_path:
            init_prefix = Path(cfg.project_path) / init_prefix
        if _tf_ckpt_exists(init_prefix):
            from deepgraphpose_tpu.models import tf_import

            variables, report = tf_import.import_tf_checkpoint(
                variables, str(init_prefix), net_type=cfg.net_type,
                scopes=("resnet",))
            print(f"imported ImageNet init {init_prefix} "
                  f"({len(report['imported'])} vars)")
            return variables, True
    if snapshot:
        print(f"warning: warm-start snapshot {snapshot} not found under "
              f"{train_dir}; training from random init")
    return variables, False


# host-RAM budget for the eagerly decoded labeled-image set; above it the
# set spills to per-batch decode through a small LRU (the step-0 analogue
# of the HBM pools' segment spill tier)
HOST_IMAGE_BUDGET_BYTES = 2_000_000_000


class _TrainLabeledImages:
    """Labeled-frame image set for step 0, on a fixed canvas.

    TPU-first: the reference's random scale jitter produces a different
    tensor shape every iteration (pose_defaultdataset.py:136-266); here the
    canvas is static so a single XLA program serves all iterations, and the
    reference's scale distribution is reproduced inside it: each sample is
    resized by ``uniform(scale_jitter_lo, scale_jitter_up) * global_scale``
    (ref: pose_defaultdataset.py:132-135 get_scale) and, when the scaled
    image overflows the canvas, a random window of canvas size is cropped
    (scale-then-crop — the same composition the reference reaches via
    CropImage, pose_dataset.py:40-53); joints falling outside are marked
    absent exactly as the reference's cropped joints drop out.

    Sets whose decoded size exceeds ``budget_bytes`` are not held in host
    RAM: only paths/coords/shapes are retained and ``batch`` decodes
    through an LRU of ``lru_images`` recent frames (the reference decodes
    EVERY sample per batch from disk, pose_defaultdataset.py:269-290 — the
    LRU only makes the common revisit cheaper).
    """

    def __init__(self, proj: ProjectConfig, cfg: PoseConfig,
                 dlcpath: str | Path, jitter: bool = True,
                 budget_bytes: int = HOST_IMAGE_BUDGET_BYTES,
                 lru_images: int = 256):
        import cv2

        self.cfg = cfg
        self.jitter = jitter
        dlcpath = Path(dlcpath)
        # raw (unscaled) images; scaling happens per batch
        self.items: list[tuple[np.ndarray, np.ndarray]] = []

        mat_path = dlcpath / cfg.dataset if cfg.dataset else None
        entries: list[tuple[Path, np.ndarray]] = []
        if mat_path and mat_path.exists():
            ts = project_io.read_training_set(
                mat_path, dlcpath / cfg.metadataset if cfg.metadataset else None)
            coords = ts.coords_for(cfg.num_joints)
            for p, c in zip(ts.image_paths, coords):
                entries.append((dlcpath / p, c))
        else:
            # fall back to CollectedData CSVs
            for vdir in sorted((dlcpath / "labeled-data").glob("*")):
                try:
                    labels = project_io.read_labels(vdir, proj.scorer)
                except FileNotFoundError:
                    continue
                for p, c in zip(labels.image_paths, labels.coords_xy):
                    ip = dlcpath / p
                    if ip.exists():
                        entries.append((ip, c))
        if not entries:
            raise FileNotFoundError(f"no labeled images under {dlcpath}")

        self.lazy = False
        self._paths: list[Path] = []
        self._coords: list[np.ndarray] = []
        shapes: list[tuple[int, int]] = []
        nbytes = 0
        for ip, c in entries:
            img = cv2.imread(str(ip))
            if img is None:
                continue
            shapes.append(img.shape[:2])
            self._paths.append(ip)
            self._coords.append(np.asarray(c, np.float64))
            nbytes += img.nbytes
            if not self.lazy:
                if nbytes > budget_bytes:
                    # over budget: drop what we decoded, keep only metadata
                    # (this first pass still sees every image once — shapes
                    # are needed for the canvas either way)
                    self.lazy = True
                    self.items.clear()
                else:
                    self.items.append((
                        cv2.cvtColor(img, cv2.COLOR_BGR2RGB),
                        self._coords[-1]))
        if not shapes:
            raise FileNotFoundError(f"no decodable labeled images under "
                                    f"{dlcpath}")
        if self.lazy:
            import functools as _ft

            @_ft.lru_cache(maxsize=lru_images)
            def _decode(i: int) -> np.ndarray:
                img = cv2.imread(str(self._paths[i]))
                return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

            self._decode = _decode
            print(f"fit_dlc: labeled set ({nbytes / 1e9:.1f} GB decoded) "
                  f"exceeds the host budget; decoding per batch "
                  f"(LRU {lru_images})")

        scale = cfg.global_scale
        hmax = max(h for h, _ in shapes)
        wmax = max(w for _, w in shapes)
        s = int(cfg.stride)
        self.canvas_hw = (-(-int(round(hmax * scale)) // s) * s,
                          -(-int(round(wmax * scale)) // s) * s)

    def __len__(self):
        return len(self._paths)

    def _get(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        if self.lazy:
            return self._decode(int(i)), self._coords[i]
        return self.items[i]

    def _place(self, img: np.ndarray, c: np.ndarray, scale: float,
               rng: np.random.Generator | None):
        """Resize by ``scale``; random-crop to the canvas if it overflows."""
        import cv2

        ch, cw = self.canvas_hw
        if scale != 1.0:
            img = cv2.resize(img, (max(int(round(img.shape[1] * scale)), 1),
                                   max(int(round(img.shape[0] * scale)), 1)))
        c = c * scale
        h, w = img.shape[:2]
        if h > ch or w > cw:
            r0 = int(rng.integers(0, h - ch + 1)) if (rng is not None
                                                      and h > ch) else 0
            c0 = int(rng.integers(0, w - cw + 1)) if (rng is not None
                                                      and w > cw) else 0
            img = img[r0:r0 + ch, c0:c0 + cw]
            c = c - np.array([c0, r0], np.float64)  # coords are (x, y)
        # uint8 canvas: the model mean-subtracts on device, and uint8 H2D
        # is 4x cheaper than f32
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:img.shape[0], :img.shape[1]] = img
        # joints cropped out of the canvas become absent (NaN)
        oob = ((c[:, 0] < 0) | (c[:, 0] > img.shape[1] - 1) |
               (c[:, 1] < 0) | (c[:, 1] > img.shape[0] - 1))
        c = c.copy()
        c[oob] = np.nan
        return canvas, c.astype(np.float32)

    def batch(self, idxs, rng: np.random.Generator | None = None
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        imgs_l, coords_l = [], []
        for i in idxs:
            img, c = self._get(i)
            if self.jitter and rng is not None:
                scale = float(rng.uniform(self.cfg.scale_jitter_lo,
                                          self.cfg.scale_jitter_up)
                              ) * self.cfg.global_scale
            else:
                scale = self.cfg.global_scale
            canvas, cc = self._place(img, c, scale, rng)
            imgs_l.append(canvas)
            coords_l.append(cc)
        imgs = np.stack(imgs_l)
        coords = np.stack(coords_l)
        present = ~np.isnan(coords[..., 0])
        return imgs, np.nan_to_num(coords), present


def _index_stream(n_items: int, bs: int, deterministic: bool,
                  rng: np.random.Generator):
    """Yield per-iteration sample indices for step 0.

    'deterministic' walks the labeled set in fixed cyclic order (ref:
    pose_dataset_deterministic.py — sequential, no shuffling); otherwise
    indices are drawn uniformly at random (ref: pose_defaultdataset.py
    shuffled sampling). The rng is consumed every iteration in the random
    mode so mid-step resume replays the same stream.
    """
    it = 0
    while True:
        if deterministic:
            yield (it * bs + np.arange(bs)) % n_items
        else:
            yield rng.integers(0, n_items, size=bs)
        it += 1


# ---------------------------------------------------------------------------
# step 0: DLC warm-start
# ---------------------------------------------------------------------------

def fit_dlc(snapshot: str | None = None, dlcpath: str | Path = ".",
            shuffle: int = 1, step: int = 0, saveiters: int = 1000,
            displayiters: int = 100, maxiters: int = 200000,
            trainingsetindex: int = 0, seed: int = 0,
            compute_dtype=None, resume: bool = True,
            tb_log: bool = False, jitter: bool = True,
            bn_train: bool | None = None,
            device_data: bool | None = None,
            aug: bool = False,
            data_parallel: bool | int = False,
            scan_iters: int | None = None) -> Path | None:
    """Vanilla supervised training on labeled frames (ref: fitdgp.py:53-254).

    ``tb_log=True`` writes TensorBoard scalar event files with the per-term
    losses under ``<train_dir>/log/`` (ref: train.py:131-133 TF summaries).
    ``jitter`` applies the reference's per-sample scale jitter
    (scale_jitter_lo/up x global_scale) within the static canvas.
    ``bn_train`` trains batch-norm on batch statistics (None = auto: on
    when no warm start was found — the reference has no from-scratch path;
    frozen random-init BN collapses to predicting the dataset mean).
    ``device_data`` keeps the whole labeled set in HBM and gathers/augments
    batches on device (None = auto when it fits; train/device_data.py) —
    per-iteration H2D drops to the index vector. ``aug=True`` additionally
    runs the full reference augmentation pipeline on visible frames (an
    extension for from-scratch runs; the reference's fit_dlc uses only
    scale jitter + crop, ref: pose_defaultdataset.py:136-266).
    ``data_parallel`` trains over a device mesh (True = all local devices,
    int = that many): each of ``maxiters`` optimizer updates consumes a
    ``batch_size x n_devices`` global batch sharded over the data axis,
    gradients/BN stats all-reduce over ICI (parallel/train_dp.py; the
    reference's counterpart tower helper is never wired up,
    ref: helpers/utils_tf.py:81-209). Requires the device-data pool.
    ``scan_iters`` runs K optimizer updates per dispatch via ``lax.scan``
    (None = auto: 20 on TPU, off elsewhere) — amortizes the per-iteration
    host round trip that otherwise dominates wall-clock over a
    high-latency device link; identical math to the per-iteration step."""
    proj, cfg, train_dir = resolve_project(dlcpath, shuffle, trainingsetindex)
    if ckpt_lib.snapshot_exists(train_dir, step):
        print(f"snapshot-step{step}-final--0 exists; skipping fit_dlc")
        return ckpt_lib.latest_snapshot(train_dir, step)

    # pose_cfg dataset_type dispatch (ref: dataset/factory.py:19-44). The 4
    # loader variants collapse onto one static-shape loader here:
    # 'deterministic' = fixed sequential order, no jitter/random crop
    # (ref: pose_dataset_deterministic.py); 'default'/'imgaug'/'tensorpack'
    # = shuffled sampling with scale jitter (tensorpack's parallel pipeline
    # role is played by DevicePrefetcher).
    deterministic = cfg.dataset_type == "deterministic"
    if deterministic:
        jitter = False
        aug = False  # the deterministic loader is reproducible by contract

    data = _TrainLabeledImages(proj, cfg, dlcpath, jitter=jitter)
    rng = np.random.default_rng(seed)
    bs = max(int(cfg.batch_size), 1)

    model, variables = init_model(
        cfg, jax.random.PRNGKey(seed), data.canvas_hw,
        dtype=_dtype(compute_dtype, cfg))
    variables, warmed = _warm_start(variables, cfg, Path(train_dir), snapshot)
    if bn_train is None:
        bn_train = not warmed
    if bn_train:
        print("fit_dlc: trainable batch-norm enabled (from-scratch mode)")

    tx = steps_lib.make_optimizer(steps_lib.piecewise_lr(cfg.multi_step))
    opt_state = tx.init(variables["params"])

    from deepgraphpose_tpu.train import device_data as dd

    n_dp = _resolve_data_parallel(data_parallel)
    use_pool = device_data
    if use_pool is None:
        use_pool = dd.pool_fits(len(data), *data.canvas_hw)
    elif use_pool and not dd.pool_fits(len(data), *data.canvas_hw):
        # the budget guard applies to explicit device_data=True too — an
        # oversized pool would OOM the 16 GB v5e regardless of who asked
        print("warning: fit_dlc(device_data=True) labeled-image pool "
              "exceeds the HBM budget; falling back to host batches")
        use_pool = False
    if n_dp > 1 and not use_pool:
        print("warning: fit_dlc(data_parallel=...) requires the device-data "
              "pool; training single-device")
        n_dp = 0
    if use_pool:
        pool = dd.LabeledImagePool(data, cfg)
        if aug:
            aug_cfg = dd.DeviceAugmentConfig.reference(
                scale_jitter=((cfg.scale_jitter_lo, cfg.scale_jitter_up)
                              if jitter else (1.0, 1.0)))
        elif jitter:
            aug_cfg = dd.DeviceAugmentConfig.jitter_only(
                cfg.scale_jitter_lo, cfg.scale_jitter_up)
        else:
            aug_cfg = None
        if n_dp > 1:
            from deepgraphpose_tpu.parallel import mesh as mesh_lib
            from deepgraphpose_tpu.parallel.train_dp import \
                make_dp_pooled_dlc_train_step

            mesh = mesh_lib.make_mesh(n_dp)
            pooled_step = make_dp_pooled_dlc_train_step(
                model, cfg, tx, mesh, aug_cfg, bn_train=bn_train)
            pool.images = mesh_lib.replicate(pool.images, mesh)
            pool.coords = mesh_lib.replicate(pool.coords, mesh)
            pool.present = mesh_lib.replicate(pool.present, mesh)
            pool.content_wh = mesh_lib.replicate(pool.content_wh, mesh)
        else:
            pooled_step = dd.make_pooled_dlc_train_step(
                model, cfg, tx, aug_cfg, bn_train=bn_train)
        print(f"fit_dlc: device-resident pool of {len(data)} images "
              f"({pool.nbytes / 1e6:.0f} MB in HBM)"
              + (", full on-device augmentation" if aug else "")
              + (f", data-parallel x{n_dp} (global batch {bs * n_dp})"
                 if n_dp > 1 else ""))
    else:
        if aug:
            print("warning: fit_dlc(aug=True) needs the device-data pool; "
                  "falling back to jitter-only host batches")
        train_step = steps_lib.make_dlc_train_step(model, cfg, tx,
                                                   bn_train=bn_train)

    # mid-step resume from the latest intermediate snapshot (see
    # _fit_dgp_impl; the reference only supports skip-if-final)
    start_it = 0
    inter = (ckpt_lib.latest_intermediate_snapshot(train_dir, step)
             if resume else None)
    if inter is not None:
        snap_path, snap_it = inter
        variables, opt_state = ckpt_lib.load_snapshot(
            snap_path, variables, opt_state)
        if opt_state is None:
            opt_state = tx.init(variables["params"])
        start_it = snap_it + 1
        print(f"resuming fit_dlc from {snap_path.name} "
              f"(iteration {start_it})")

    stats, t0 = [], time.time()
    timer = profiling.StepTimer(Path(train_dir) / "steps.jsonl")
    tb = _make_tb_writer(train_dir, tb_log)

    def handle(it, out, variables, opt_state):
        if displayiters and it % displayiters == 0:
            # float() is a device sync: attribute the interval's wall time
            # across its steps (per-iteration host timing would only see
            # the async dispatch cost)
            terms = {k: float(v) for k, v in out.items()}
            loss = terms["total_loss"]
            timer.interval(it, displayiters, loss=loss)
            if tb is not None:
                tb.add_scalars(it, {f"loss/{k}": v
                                    for k, v in terms.items()})
            print(f"[fit_dlc] iter {it}/{maxiters} loss {loss:.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
            stats.append([it, loss])
        if (saveiters and it > 0 and it % saveiters == 0):
            ckpt_lib.save_snapshot(train_dir, step, it, variables, opt_state,
                                   cfg.max_to_keep)

    if use_pool:
        import jax.numpy as jnp

        key0 = jax.random.PRNGKey(seed + 1)
        if n_dp > 1:
            from deepgraphpose_tpu.parallel import mesh as mesh_lib

            # replicate AFTER any resume load so restored host arrays pick
            # up the mesh sharding; idxs shards the global batch
            variables = mesh_lib.replicate(variables, mesh)
            opt_state = mesh_lib.replicate(opt_state, mesh)
            stream = _index_stream(len(data), bs * n_dp, deterministic, rng)
            idx_put = functools.partial(mesh_lib.shard_leading_axis,
                                        mesh=mesh)
            key_put = functools.partial(mesh_lib.replicate, mesh=mesh)
        else:
            stream = _index_stream(len(data), bs, deterministic, rng)
            idx_put = key_put = jax.device_put
        scan_k = dd.resolve_scan_iters(scan_iters, True, n_dp)
        if scan_k > 1:
            scan_step = dd.make_pooled_dlc_scan_step(
                model, cfg, tx, aug_cfg, bn_train=bn_train)
            for _ in range(start_it):  # resume: replay the index stream
                next(stream)
            for a, b in dd.iter_scan_chunks(start_it, maxiters, saveiters,
                                            scan_k):
                idxs_stack = np.stack([next(stream) for _ in range(b - a)])
                keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                    key0, jnp.arange(a, b))
                variables, opt_state, outs = scan_step(
                    variables, opt_state, pool.images, pool.coords,
                    pool.present, pool.content_wh,
                    jax.device_put(idxs_stack.astype(np.int32)), keys)
                outs_np = {k: np.asarray(v) for k, v in outs.items()}
                for j, it in enumerate(range(a, b)):
                    handle(it, {k: v[j] for k, v in outs_np.items()},
                           variables, opt_state)
        else:
            for it in range(maxiters):
                idxs = next(stream)
                if it < start_it:
                    continue
                variables, opt_state, out = pooled_step(
                    variables, opt_state, pool.images, pool.coords,
                    pool.present, pool.content_wh,
                    idx_put(jnp.asarray(idxs, jnp.int32)),
                    key_put(jax.random.fold_in(key0, it)), it)
                handle(it, out, variables, opt_state)
    else:
        def producer():
            stream = _index_stream(len(data), bs, deterministic, rng)
            for it in range(maxiters):
                idxs = next(stream)
                if it >= start_it:
                    yield (it, *data.batch(idxs,
                                           rng=None if deterministic else rng))

        def transfer(item):
            it, imgs, coords, present = item
            return (it, jax.device_put(imgs), jax.device_put(coords),
                    jax.device_put(present))

        pf = DevicePrefetcher(producer(), transfer, depth=2)
        for it, imgs, coords, present in pf:
            variables, opt_state, out = train_step(
                variables, opt_state, imgs, coords, present, it)
            handle(it, out, variables, opt_state)
    timer.close()
    if tb is not None:
        tb.close()
    ckpt_lib.save_snapshot(train_dir, step, maxiters - 1, variables,
                           opt_state, cfg.max_to_keep)
    final = ckpt_lib.save_snapshot(train_dir, step, "final--0", variables)
    if stats:
        _log_stats(train_dir, stats, ["iteration", "loss"])
    return final


# ---------------------------------------------------------------------------
# steps 1 & 2: DGP
# ---------------------------------------------------------------------------

def _dtype(compute_dtype, cfg: PoseConfig):
    import jax.numpy as jnp

    if compute_dtype is not None:
        return compute_dtype
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _dgp_cfg_overrides(cfg: PoseConfig, step: int, batch_size: int,
                       wt: float, gm2: int, gm3: int, nepoch: int,
                       aug: bool, lr: float | None = None) -> PoseConfig:
    """DGP hyperparameters injected in code by the reference.

    step 1 (ref: fitdgp.py:343-359): clique terms off, visible-only loss.
    step 2 (ref: fitdgp.py:637-654): ws=1000, wn_v=5, wn_h=3, etc.
    ``lr=None`` keeps the reference's hard-coded 0.005 (fitdgp.py:353, 650)
    — tuned for ImageNet-warm-started models; from-scratch step-0 models
    need a gentler rate (see EVAL.md).
    """
    lr = 0.005 if lr is None else lr
    if step == 1:
        return cfg.replace(ws=0.0, ws_max=1.2, wt=0.0, wt_max=0.0,
                           wn_visible=1.0, wn_hidden=0.0, gamma=1.0,
                           gauss_len=1.0, lengthscale=1.0, batch_size=1,
                           lr=lr, gm2=0, gm3=0, aug=aug,
                           n_times_all_frames=nepoch)
    return cfg.replace(ws=1000.0, ws_max=1.2, wt=wt, wt_max=0.0,
                       wn_visible=5.0, wn_hidden=3.0, gamma=1.0,
                       gauss_len=1.0, lengthscale=1.0, batch_size=batch_size,
                       lr=lr, gm2=gm2, gm3=gm3, aug=aug,
                       n_times_all_frames=nepoch)


def _make_loss_params(mds: MultiDataset, cfg: PoseConfig,
                      S0: np.ndarray) -> DGPLossParams:
    labels_list = [d.labels_rc for d in mds.datasets]
    ws_vec, ws_max_vec = compute_spatial_bounds(
        labels_list, S0, cfg.stride, cfg.ws, cfg.ws_max)
    return DGPLossParams(
        nj=cfg.num_joints, stride=cfg.stride, gamma=cfg.gamma,
        gauss_len=cfg.gauss_len, lengthscale=cfg.lengthscale,
        pos_dist_thresh=cfg.pos_dist_thresh, locref_stdev=cfg.locref_stdev,
        locref_loss_weight=cfg.locref_loss_weight,
        locref_huber_loss=cfg.locref_huber_loss, wn_visible=cfg.wn_visible,
        wn_hidden=cfg.wn_hidden, wt=cfg.wt, wt_max=cfg.wt_max, gm2=cfg.gm2,
        gm3=cfg.gm3,
        n_visible_frames_total=float(max(mds.n_visible_frames_total, 1)),
        n_hidden_frames_total=float(mds.n_hidden_frames_total),
        S0=S0 if (cfg.ws > 0 and S0.shape[0] > 0) else np.zeros((0, cfg.num_joints)),
        ws=ws_vec, ws_max=ws_max_vec)


def fit_dgp_labeledonly(snapshot: str = "snapshot-step0-final--0",
                        dlcpath: str | Path = ".", shuffle: int = 1,
                        step: int = 1, saveiters: int = 1000,
                        displayiters: int = 5, maxiters: int = 50000,
                        ns: int = 10, n_max_frames: int = 2000,
                        nepoch: int = 100, aug: bool = True, seed: int = 0,
                        trainingsetindex: int = 0, compute_dtype=None,
                        resume: bool = True, debug: str = "",
                        tb_log: bool = False,
                        bn_train: bool | None = None,
                        device_data: bool | None = None,
                        lr: float | None = None,
                        lr_decay: bool = False,
                        data_parallel: bool | int = False,
                        windows_per_device: int = 1,
                        scan_iters: int | None = None) -> Path | None:
    """Step 1: DGP objective, visible-frame losses only
    (ref: fitdgp.py:257-546 — one visible frame per iteration)."""
    return _fit_dgp_impl(
        snapshot=snapshot, dlcpath=dlcpath, shuffle=shuffle, step=step,
        saveiters=saveiters, displayiters=displayiters, maxiters=maxiters,
        batch_size=1, ns=ns, n_max_frames=n_max_frames, gm2=0, gm3=0,
        nepoch=nepoch, wt=0.0, aug=aug, visible_only=True, seed=seed,
        trainingsetindex=trainingsetindex, compute_dtype=compute_dtype,
        resume=resume, debug=debug, tb_log=tb_log, bn_train=bn_train,
        device_data=device_data, lr=lr, lr_decay=lr_decay,
        data_parallel=data_parallel, windows_per_device=windows_per_device,
        scan_iters=scan_iters)


def fit_dgp(snapshot: str = "snapshot-step1-final--0",
            dlcpath: str | Path = ".", batch_size: int = 10,
            shuffle: int = 1, step: int = 2, saveiters: int = 1000,
            displayiters: int = 5, maxiters: int = 200000, ns: int = 10,
            n_max_frames: int = 2000, gm2: int = 0, gm3: int = 0,
            nepoch: int = 100, wt: float = 0.0, aug: bool = True,
            seed: int = 0, trainingsetindex: int = 0, compute_dtype=None,
            resume: bool = True, debug: str = "",
            tb_log: bool = False,
            bn_train: bool | None = None,
            device_data: bool | None = None,
            lr: float | None = None,
            device_flow: bool = False,
            lr_decay: bool = False,
            data_parallel: bool | int = False,
            windows_per_device: int = 1,
            scan_iters: int | None = None) -> Path | None:
    """Step 2: full semi-supervised DGP (ref: fitdgp.py:549-845).

    ``device_data``: keep per-video frame pools in HBM and gather/augment
    windows on device (None = auto when the pools fit and wt == 0).
    ``device_flow``: with wt > 0, estimate the temporal-clique flow on
    device (ops/flow_device.py pyramidal LK) instead of host Farneback —
    enables the HBM-pool path for temporal training; the reference's
    Farneback semantics remain the host-path default.
    ``data_parallel`` (True = all local devices, int = that many) shards a
    global batch of n_devices DGP windows over a device mesh per optimizer
    update; gradients/BN stats all-reduce over ICI (parallel/train_dp.py).
    Requires the device-data pools; composes with ``bn_train``, ``aug``,
    and ``device_flow``.
    ``windows_per_device`` batches that many schedule windows per device
    per optimizer update (grad-averaging semantics, exactly
    ``data_parallel`` over n_dp*W windows). Measured on v5e
    (PERF.md training roofline): 2 windows/device cost 83 ms vs 2x106 ms,
    a 1.27x per-frame train-step throughput win; saturates above 2.
    Works single-device too (``data_parallel=False, windows_per_device=2``).
    ``scan_iters`` runs K optimizer updates per dispatch via ``lax.scan``
    on the single-device pool path (None = auto: 20 on TPU) — one host
    round trip per K updates instead of per update. Single-device
    ``windows_per_device > 1`` COMPOSES with it (a scan over K G-window
    pooled updates); multi-device DP does not (the DP dispatch already
    amortizes across devices)."""
    return _fit_dgp_impl(
        snapshot=snapshot, dlcpath=dlcpath, shuffle=shuffle, step=step,
        saveiters=saveiters, displayiters=displayiters, maxiters=maxiters,
        batch_size=batch_size, ns=ns, n_max_frames=n_max_frames, gm2=gm2,
        gm3=gm3, nepoch=nepoch, wt=wt, aug=aug, visible_only=False,
        seed=seed, trainingsetindex=trainingsetindex,
        compute_dtype=compute_dtype, resume=resume, debug=debug,
        tb_log=tb_log, bn_train=bn_train, device_data=device_data, lr=lr,
        device_flow=device_flow, lr_decay=lr_decay,
        data_parallel=data_parallel, windows_per_device=windows_per_device,
        scan_iters=scan_iters)


def _fit_dgp_impl(snapshot, dlcpath, shuffle, step, saveiters, displayiters,
                  maxiters, batch_size, ns, n_max_frames, gm2, gm3, nepoch,
                  wt, aug, visible_only, seed, trainingsetindex,
                  compute_dtype, resume, debug, tb_log=False,
                  bn_train=None, device_data=None, lr=None,
                  device_flow=False, lr_decay=False,
                  data_parallel=False, windows_per_device=1,
                  scan_iters=None) -> Path | None:
    proj, cfg, train_dir = resolve_project(dlcpath, shuffle, trainingsetindex)
    if ckpt_lib.snapshot_exists(train_dir, step, debug):
        print(f"snapshot-step{step}{debug}-final--0 exists; skipping")
        return ckpt_lib.latest_snapshot(train_dir, step, debug)

    cfg = _dgp_cfg_overrides(cfg, step if not visible_only else 1,
                             batch_size, wt, gm2, gm3, nepoch, aug, lr=lr)
    S0 = proj.skeleton_incidence()
    video_sets = dgp_video_sets(proj, dlcpath)
    mds = MultiDataset(proj, cfg, video_sets, ns=ns,
                       n_max_frames=n_max_frames,
                       cache_dir=Path(dlcpath) / "motion_energy_cache")
    loss_params = _make_loss_params(mds, cfg, S0)

    rng = np.random.default_rng(seed)
    pad_to = max(batch_size + 1, 2)

    # schedule first (ref: gen_batch for step 2; random visible frames for
    # step 1) so the lr-decay horizon below matches the true iteration count
    if visible_only:
        n_sched = min(maxiters,
                      max(1, mds.n_visible_frames_total) * nepoch)
        schedule = []
        ds_choices = rng.choice(
            len(mds.datasets), size=n_sched,
            p=mds.batch_ratios if mds.batch_ratios.sum() > 0 else None)
        for ds_i in ds_choices:
            d = mds.datasets[int(ds_i)]
            if len(d.visible_frames) == 0:
                continue
            f = d.visible_frames[rng.integers(len(d.visible_frames))]
            schedule.append((int(ds_i), np.array([f])))
    else:
        schedule = generate_batch_schedule(
            [d.visible_frames for d in mds.datasets],
            [d.hidden_frames for d in mds.datasets],
            [d.chunk for d in mds.datasets],
            batch_size, nepoch, maxiters, seed=seed)
    n_iters = len(schedule)
    save_every = max(1, int(saveiters / max(batch_size, 1)))

    # model sized for the first video; per-video shapes compile on demand
    d0 = mds.datasets[0]
    model, variables = init_model(
        cfg, jax.random.PRNGKey(seed), (d0.nx_in, d0.ny_in),
        dtype=_dtype(compute_dtype, cfg))
    variables, warmed = _warm_start(variables, cfg, Path(train_dir),
                                    snapshot, allow_init_weights=False)
    if bn_train is None:
        bn_train = not warmed
    if bn_train:
        print(f"step {step}: trainable batch-norm enabled "
              "(from-scratch mode)")

    augmenter = Augmenter(apply_prob=0.8) if (aug and wt == 0) else None

    # device-resident frame pools: gather windows in HBM, send only indices
    # (train/device_data.py). Requires wt == 0 (Farneback flow is host-side,
    # like the reference). Augmentation then runs on device too.
    from deepgraphpose_tpu.train import device_data as dd

    use_pool = device_data
    use_spill = False
    flow_on_device = device_flow and wt != 0
    est = sum((len(d.chunk) + len(d.visible_frames)
               + len(d.hidden_frames)) * d.nx_in * d.ny_in * 3
              for d in mds.datasets)
    if use_pool is None:
        pool_ok = wt == 0 or flow_on_device
        use_pool = pool_ok and est <= dd.DEFAULT_POOL_BUDGET_BYTES
        # over-budget pools spill to rotating HBM segments instead of
        # dropping to the per-iteration host feed (ref hot-loop cost:
        # dataset.py:811-821)
        use_spill = pool_ok and not use_pool
    elif use_pool and wt != 0 and not flow_on_device:
        print("warning: device_data with wt != 0 needs device_flow=True "
              "(host-side Farneback otherwise); falling back to host "
              "batches")
        use_pool = False
    elif use_pool and est > dd.DEFAULT_POOL_BUDGET_BYTES:
        # explicit device_data=True still respects the HBM budget: an
        # oversized resident pool would OOM the 16 GB v5e — rotate
        # segments instead
        print(f"device_data=True frame pools ({est / 1e9:.1f} GB) exceed "
              "the HBM budget; using rotating segments")
        use_pool = False
        use_spill = True
    spill_plan = None
    if use_spill:
        try:
            spill_plan = dd.plan_spill_runs(
                schedule, mds.datasets, dd.DEFAULT_POOL_BUDGET_BYTES // 2,
                np.random.default_rng(seed + 3))
        except ValueError as e:
            print(f"warning: {e}; falling back to host batches")
            use_spill = False
    n_dp = _resolve_data_parallel(data_parallel)
    wpd = max(int(windows_per_device), 1)
    if wpd > 1 and n_dp == 0:
        n_dp = 1  # multi-window updates on one device ride the DP machinery
    dp_G = n_dp * wpd  # windows per optimizer update (global batch)
    if dp_G > 1 and use_spill:
        print(f"warning: fit_dgp(data_parallel={data_parallel}, "
              f"windows_per_device={wpd}) does not support "
              "segment-rotating pools; training single-device")
        n_dp = dp_G = 0
    elif dp_G > 1 and not use_pool:
        print(f"warning: fit_dgp(data_parallel={data_parallel}, "
              f"windows_per_device={wpd}) requires the device-data frame "
              "pools; training single-device")
        n_dp = dp_G = 0
    elif dp_G <= 1:
        n_dp = dp_G = 0

    # ``lr_decay=True`` anneals the step's rate with a cosine schedule over
    # its true OPTIMIZER-UPDATE count (floor 5% of lr): data-parallel /
    # multi-window training consumes dp_G schedule windows per update, so
    # the horizon is n_iters/dp_G, not n_iters — sized on the schedule
    # length the lr would stay flat-high for the whole DP run. The reference
    # holds its hard-coded 0.005 flat (fitdgp.py:353, 650) — tuned for
    # warm-started models; from-scratch step-0 models degrade under a flat
    # rate (EVAL.md).
    n_updates = -(-n_iters // dp_G) if dp_G > 1 else n_iters
    if lr_decay:
        import optax

        lr_or_sched = optax.cosine_decay_schedule(
            cfg.lr, decay_steps=max(n_updates, 1), alpha=0.05)
    else:
        lr_or_sched = cfg.lr
    tx = steps_lib.make_optimizer(lr_or_sched, momentum=0.9, clip_norm=10.0)
    opt_state = tx.init(variables["params"])

    # mid-step resume: continue from the latest intermediate snapshot
    # (variables AND optimizer state) — the reference can only skip-if-final
    # (SURVEY §5)
    start_it = 0
    inter = (ckpt_lib.latest_intermediate_snapshot(train_dir, step, debug)
             if resume else None)
    if inter is not None:
        snap_path, snap_it = inter
        variables, opt_state = ckpt_lib.load_snapshot(
            snap_path, variables, opt_state)
        if opt_state is None:
            opt_state = tx.init(variables["params"])
        start_it = snap_it + 1
        print(f"resuming step {step} from {snap_path.name} "
              f"(iteration {start_it})")

    pools = None
    mesh = None
    if use_pool:
        pools = [dd.FramePool(d) for d in mds.datasets]
        total_mb = sum(p.nbytes for p in pools) / 1e6
        aug_cfg_dev = (dd.DeviceAugmentConfig.reference()
                       if augmenter is not None else None)
        augmenter = None
        # single-device multi-window composes with the scan superstep
        # (both levers stack: MXU fill x dispatch amortization, PERF.md)
        group_scan_k = (dd.resolve_scan_iters(scan_iters, True, 1)
                        if (dp_G > 1 and n_dp == 1) else 0)
        if dp_G > 1 and group_scan_k > 1:
            pooled_step = dd.make_pooled_dgp_group_scan_step(
                model, loss_params, tx, aug_cfg_dev,
                visible_only=visible_only, bn_train=bn_train,
                device_flow=flow_on_device)
        elif dp_G > 1:
            from deepgraphpose_tpu.parallel import mesh as mesh_lib
            from deepgraphpose_tpu.parallel.train_dp import \
                make_dp_pooled_dgp_train_step

            mesh = mesh_lib.make_mesh(n_dp)
            pooled_step = make_dp_pooled_dgp_train_step(
                model, loss_params, tx, mesh, aug_cfg_dev,
                visible_only=visible_only, bn_train=bn_train,
                device_flow=flow_on_device)
            for p in pools:
                p.images = mesh_lib.replicate(p.images, mesh)
        else:
            pooled_step = dd.make_pooled_dgp_train_step(
                model, loss_params, tx, aug_cfg_dev,
                visible_only=visible_only,
                bn_train=bn_train, device_flow=flow_on_device)
        print(f"step {step}: device-resident frame pools "
              f"({total_mb:.0f} MB in HBM)"
              + (", on-device augmentation" if aug_cfg_dev else "")
              + (", on-device LK flow" if flow_on_device else "")
              + (f", data-parallel x{n_dp} devices x {wpd} windows "
                 f"= {dp_G} windows/update" if dp_G > 1 else "")
              + (f", scan superstep K={group_scan_k}"
                 if dp_G > 1 and group_scan_k > 1 else ""))
    elif use_spill:
        spill_pools, spill_runs = spill_plan
        aug_cfg_dev = (dd.DeviceAugmentConfig.reference()
                       if augmenter is not None else None)
        augmenter = None
        pooled_step = dd.make_pooled_dgp_train_step(
            model, loss_params, tx, aug_cfg_dev, visible_only=visible_only,
            bn_train=bn_train, device_flow=flow_on_device)
        seg_mb = max(p.nbytes for p in spill_pools if p is not None) / 1e6
        print(f"step {step}: segment-rotating frame pools "
              f"({est / 1e9:.1f} GB over "
              f"{sum(p.n_segments for p in spill_pools if p is not None)} "
              f"segments, <= 2 x {seg_mb:.0f} MB resident)"
              + (", on-device augmentation" if aug_cfg_dev else "")
              + (", on-device LK flow" if flow_on_device else ""))
    else:
        train_step = steps_lib.make_dgp_train_step(
            model, loss_params, tx, visible_only=visible_only,
            bn_train=bn_train)

    def split_window(ds_i, frames):
        """(vis, hid) frame numbers with the visible-frame anchor rule
        (ref: fitdgp.py:755-758)."""
        d = mds.datasets[ds_i]
        vis_set = set(int(f) for f in d.visible_frames)
        vis = np.array([f for f in frames if int(f) in vis_set], np.int64)
        hid = np.array([f for f in frames if int(f) not in vis_set],
                       np.int64)
        if vis.size == 0 and len(d.visible_frames) > 0:
            vis = np.array([d.visible_frames[
                rng.integers(len(d.visible_frames))]])
        return vis, hid

    stats, t0 = [], time.time()
    timer = profiling.StepTimer(Path(train_dir) / "steps.jsonl")
    tb = _make_tb_writer(train_dir, tb_log)
    name = "fit_dgp_labeledonly" if visible_only else "fit_dgp"
    loss_key = "total_loss_visible" if visible_only else "total_loss"

    def handle(it, out, variables, opt_state, stride: int = 1):
        # ``stride``: schedule positions consumed by this update (n_dp under
        # data parallelism). Intervals fire when the boundary falls inside
        # [it, it+stride) so displayiters/saveiters need not divide n_dp.
        if displayiters and it % displayiters < stride:
            # float() is a device sync: attribute the interval across steps
            terms = {k: float(v) for k, v in out.items()}
            loss = terms[loss_key]
            timer.interval(it, displayiters, loss=loss)
            if tb is not None:
                tb.add_scalars(it, {f"loss/{k}": v
                                    for k, v in terms.items()})
            print(f"[{name}] iter {it}/{n_iters} loss {loss:.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
            stats.append([it, loss])
        if it > 0 and it % save_every < stride:
            ckpt_lib.save_snapshot(train_dir, step, it, variables, opt_state,
                                   cfg.max_to_keep, debug)

    if use_pool and dp_G > 1 and n_dp == 1 and group_scan_k > 1:
        # composed single-device path: lax.scan over K G-window pooled
        # updates (the two PERF.md levers stacked)
        groups = _group_schedule_dp(schedule, dp_G, rng)
        group_ds = [g[0] for g in groups]
        key0 = jax.random.PRNGKey(seed + 2)
        start_gi = -(-start_it // dp_G)  # resume at the first whole group
        for ds_i, a, bnd in dd.iter_group_scan_runs(
                group_ds, start_gi, save_every, dp_G, group_scan_k):
            rows_l, batch_l = [], []
            for gi in range(a, bnd):
                _, grp = groups[gi]
                rows_g, batch_g = [], []
                for frames in grp:
                    vis, hid = split_window(ds_i, frames)
                    b = assemble_batch(mds.datasets[ds_i], vis, hid,
                                       pad_to=pad_to, wt=cfg.wt,
                                       with_images=False)
                    rows_g.append(pools[ds_i].rows(b.frames))
                    batch_g.append(b.as_np())
                rows_l.append(np.stack(rows_g).astype(np.int32))
                batch_l.append({k: np.stack([bb[k] for bb in batch_g])
                                for k in batch_g[0]})
            rows_stack = np.stack(rows_l)  # (K, G, T)
            batch_stack = {k: np.stack([x[k] for x in batch_l])
                           for k in batch_l[0]}  # (K, G, ...)
            keys = np.stack([np.asarray(jax.random.split(
                jax.random.fold_in(key0, gi), dp_G))
                for gi in range(a, bnd)])  # (K, G, 2)
            variables, opt_state, outs = pooled_step(
                variables, opt_state, pools[ds_i].images,
                jax.device_put(rows_stack),
                {k: jax.device_put(v) for k, v in batch_stack.items()},
                jax.device_put(keys))
            outs_np = {k: np.asarray(v) for k, v in outs.items()}
            for j, gi in enumerate(range(a, bnd)):
                handle(gi * dp_G, {k: v[j] for k, v in outs_np.items()},
                       variables, opt_state, stride=dp_G)
    elif use_pool and dp_G > 1:
        import jax.numpy as jnp

        from deepgraphpose_tpu.parallel import mesh as mesh_lib

        # replicate AFTER any resume load so restored host arrays pick up
        # the mesh sharding
        variables = mesh_lib.replicate(variables, mesh)
        opt_state = mesh_lib.replicate(opt_state, mesh)
        key0 = jax.random.PRNGKey(seed + 2)
        for gi, (ds_i, grp) in enumerate(
                _group_schedule_dp(schedule, dp_G, rng)):
            it = gi * dp_G  # one update consumes dp_G schedule windows
            if it < start_it:
                continue
            rows_g, batch_g = [], []
            for frames in grp:
                vis, hid = split_window(ds_i, frames)
                b = assemble_batch(mds.datasets[ds_i], vis, hid,
                                   pad_to=pad_to, wt=cfg.wt,
                                   with_images=False)
                rows_g.append(pools[ds_i].rows(b.frames))
                batch_g.append(b.as_np())
            rows = mesh_lib.shard_leading_axis(
                np.stack(rows_g).astype(np.int32), mesh)
            batch = mesh_lib.shard_leading_axis(
                {k: np.stack([bb[k] for bb in batch_g])
                 for k in batch_g[0]}, mesh)
            keys = mesh_lib.shard_leading_axis(
                np.asarray(jax.random.split(jax.random.fold_in(key0, gi),
                                            dp_G)), mesh)
            variables, opt_state, out = pooled_step(
                variables, opt_state, pools[ds_i].images, rows, batch, keys)
            handle(it, out, variables, opt_state, stride=dp_G)
    elif use_pool and dd.resolve_scan_iters(scan_iters, True, dp_G) > 1:
        import jax.numpy as jnp

        scan_k = dd.resolve_scan_iters(scan_iters, True, dp_G)
        scan_step = dd.make_pooled_dgp_scan_step(
            model, loss_params, tx, aug_cfg_dev, visible_only=visible_only,
            bn_train=bn_train, device_flow=flow_on_device)
        key0 = jax.random.PRNGKey(seed + 2)
        for ds_i, a, bnd in dd.iter_scan_runs(schedule, start_it,
                                              save_every, scan_k):
            rows_l, batch_l = [], []
            for it2 in range(a, bnd):
                _, frames = schedule[it2]
                vis, hid = split_window(ds_i, frames)
                bb = assemble_batch(mds.datasets[ds_i], vis, hid,
                                    pad_to=pad_to, wt=cfg.wt,
                                    with_images=False)
                rows_l.append(pools[ds_i].rows(bb.frames))
                batch_l.append(bb.as_np())
            rows_stack = np.stack(rows_l).astype(np.int32)
            batch_stack = {k: np.stack([x[k] for x in batch_l])
                           for k in batch_l[0]}
            keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                key0, jnp.arange(a, bnd))
            variables, opt_state, outs = scan_step(
                variables, opt_state, pools[ds_i].images,
                jax.device_put(rows_stack),
                {k: jax.device_put(v) for k, v in batch_stack.items()},
                keys)
            outs_np = {k: np.asarray(v) for k, v in outs.items()}
            for j, it2 in enumerate(range(a, bnd)):
                handle(it2, {k: v[j] for k, v in outs_np.items()},
                       variables, opt_state)
    elif use_pool:
        import jax.numpy as jnp

        key0 = jax.random.PRNGKey(seed + 2)
        for it, (ds_i, frames) in enumerate(schedule):
            if it < start_it:
                continue
            vis, hid = split_window(ds_i, frames)
            b = assemble_batch(mds.datasets[ds_i], vis, hid, pad_to=pad_to,
                               wt=cfg.wt, with_images=False)
            rows = jnp.asarray(pools[ds_i].rows(b.frames), jnp.int32)
            variables, opt_state, out = pooled_step(
                variables, opt_state, pools[ds_i].images, rows, b.as_jnp(),
                jax.random.fold_in(key0, it))
            handle(it, out, variables, opt_state)
    elif use_spill:
        import jax.numpy as jnp

        key0 = jax.random.PRNGKey(seed + 2)
        spill_pools, spill_runs = spill_plan
        it = 0
        for ds_i, k, positions, pool_img in dd.iter_spill_segments(
                spill_pools, spill_runs):
            for pos in positions:
                if it < start_it:
                    it += 1
                    continue
                _, frames = schedule[pos]
                vis, hid = split_window(ds_i, frames)
                b = assemble_batch(mds.datasets[ds_i], vis, hid,
                                   pad_to=pad_to, wt=cfg.wt,
                                   with_images=False)
                rows = jnp.asarray(spill_pools[ds_i].rows(b.frames, k),
                                   jnp.int32)
                variables, opt_state, out = pooled_step(
                    variables, opt_state, pool_img, rows, b.as_jnp(),
                    jax.random.fold_in(key0, it))
                handle(it, out, variables, opt_state)
                it += 1
    else:
        def producer():
            for it, (ds_i, frames) in enumerate(schedule):
                if it < start_it:
                    continue
                vis, hid = split_window(ds_i, frames)
                batch = assemble_batch(mds.datasets[ds_i], vis, hid,
                                       pad_to=pad_to, wt=cfg.wt,
                                       compute_flow=cfg.wt > 0,
                                       augmenter=augmenter, rng=rng)
                yield it, batch

        # when wt == 0 the flow input is identically zero: transfer it once
        # per frame shape and reuse the device buffer every iteration
        # (full-res (B-1, H, W) f32 is ~25 MB/iteration at the reference
        # batch size — pure H2D waste)
        flow_dev_cache: dict = {}

        def transfer(item):
            it, b = item
            flow = None
            if cfg.wt == 0:
                key = b.flow.shape
                if key not in flow_dev_cache:
                    flow_dev_cache[key] = jax.device_put(np.zeros_like(b.flow))
                flow = flow_dev_cache[key]
            return it, jax.device_put(b.images), {
                k: jax.device_put(v) for k, v in b.as_jnp(flow=flow).items()}

        pf = DevicePrefetcher(producer(), transfer, depth=2)
        for it, images, batch in pf:
            variables, opt_state, out = train_step(variables, opt_state,
                                                   images, batch)
            handle(it, out, variables, opt_state)
    timer.close()
    if tb is not None:
        tb.close()
    ckpt_lib.save_snapshot(train_dir, step, max(n_iters - 1, 0), variables,
                           opt_state, cfg.max_to_keep, debug)
    final = ckpt_lib.save_snapshot(train_dir, step, "final--0", variables,
                                   debug=debug)
    if stats:
        _log_stats(train_dir, stats, ["iteration", "loss"])
    return final
