"""Scoremap / locref-field visualization for labeled frames.

ref: deeplabcut/pose_estimation_tensorflow/visualizemaps.py-style
``extract_save_all_maps``: run the network over labeled frames and save,
per frame, a grid of sigmoid scoremaps (one panel per bodypart) with the
soft-argmax decode marked — the standard way to eyeball what the network
has learned beyond a single RMSE number.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def extract_save_all_maps(config: str | Path, shuffle: int = 1,
                          indices: list | None = None,
                          dest_folder: str | Path | None = None,
                          snapshot: str | None = None) -> list[Path]:
    """Save scoremap grids for (a subset of) the labeled frames.

    Writes ``<project>/maps/<image-stem>_scmap.png``; returns the paths.
    """
    import cv2
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.data import project as project_io
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.ops.softargmax import softargmax_2d
    from deepgraphpose_tpu.train.fit import resolve_project

    config = Path(config)
    dlcpath = config.parent
    proj, cfg, train_dir = resolve_project(dlcpath, shuffle)
    if snapshot:
        snap = Path(train_dir) / f"{snapshot}{ckpt_lib.CKPT_SUFFIX}"
    else:
        snap = ckpt_lib.latest_snapshot(train_dir)
    if snap is None or not Path(snap).exists():
        raise FileNotFoundError(f"no snapshot under {train_dir}")

    entries = []
    for vdir in sorted((dlcpath / "labeled-data").glob("*")):
        if not vdir.is_dir() or vdir.name.endswith("_labeled"):
            continue
        try:
            labels = project_io.read_labels(vdir, proj.scorer)
        except FileNotFoundError:
            continue
        entries.extend(dlcpath / p for p in labels.image_paths)
    if indices is not None:
        entries = [entries[i] for i in indices if i < len(entries)]
    if not entries:
        raise FileNotFoundError(f"no labeled images under {dlcpath}")

    out_dir = Path(dest_folder) if dest_folder else dlcpath / "maps"
    out_dir.mkdir(parents=True, exist_ok=True)
    names = cfg.all_joints_names or [f"bp{i}"
                                     for i in range(cfg.num_joints)]

    model = variables = infer = None
    cur_hw = None
    written = []
    for ip in entries:
        img = cv2.imread(str(ip))
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.shape[:2] != cur_hw:
            cur_hw = img.shape[:2]
            model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                          cur_hw)
            variables, _ = ckpt_lib.load_snapshot(snap, variables)

            @jax.jit
            def infer(v, im, _model=model):
                heads = _model.apply(v, im.astype(jnp.float32))
                pred = heads["part_pred"]
                mu, _ = softargmax_2d(pred, gamma=cfg.gamma,
                                      gauss_len=cfg.gauss_len)
                return jax.nn.sigmoid(pred), mu

        scmap, mu = infer(variables, jnp.asarray(img[None]))
        scmap = np.asarray(scmap)[0]
        mu = np.asarray(mu)[0]

        nj = scmap.shape[-1]
        ncol = min(nj + 1, 4)
        nrow = -(-(nj + 1) // ncol)
        fig, axes = plt.subplots(nrow, ncol,
                                 figsize=(3.2 * ncol, 2.6 * nrow))
        axes = np.atleast_1d(axes).reshape(-1)
        axes[0].imshow(img)
        axes[0].set_title("image", fontsize=8)
        for j in range(nj):
            ax = axes[j + 1]
            ax.imshow(scmap[:, :, j], vmin=0, vmax=1, cmap="viridis")
            ax.plot(mu[j, 1], mu[j, 0], "r+", ms=8)
            ax.set_title(names[j], fontsize=8)
        for ax in axes:
            ax.axis("off")
        out = out_dir / f"{ip.stem}_scmap.png"
        fig.tight_layout()
        fig.savefig(out, dpi=100)
        plt.close(fig)
        written.append(out)
    print(f"wrote {len(written)} scoremap grids to {out_dir}")
    return written


def display_dataset(config: str | Path, shuffle: int = 1,
                    indices: list | None = None,
                    dest_folder: str | Path | None = None) -> list[Path]:
    """Visualize the raw training-dataset TARGET scoremaps (no network):
    per labeled image, a panel grid overlaying each joint's rasterized
    disk target on the image (ref: pose_estimation_tensorflow/
    vis_dataset.py display_dataset — plt.show() per batch there; headless
    PNG files here). Uses the exact on-device rasterizer the trainer
    trains against (ops/targets.py::dlc_scoremap_targets), so what you
    inspect is what the loss sees.

    Writes ``<project>/maps/<image-stem>_targets.png``; returns paths.
    """
    import cv2
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepgraphpose_tpu.data import project as project_io
    from deepgraphpose_tpu.ops.targets import dlc_scoremap_targets
    from deepgraphpose_tpu.train.fit import resolve_project

    config = Path(config)
    dlcpath = config.parent
    proj, cfg, _ = resolve_project(dlcpath, shuffle)
    names = cfg.all_joints_names or [f"bp{i}"
                                     for i in range(cfg.num_joints)]
    s = cfg.global_scale
    stride = cfg.stride

    entries = []
    for vdir in sorted((dlcpath / "labeled-data").glob("*")):
        if not vdir.is_dir() or vdir.name.endswith("_labeled"):
            continue
        try:
            labels = project_io.read_labels(vdir, proj.scorer)
        except FileNotFoundError:
            continue
        entries.extend((dlcpath / p, c)
                       for p, c in zip(labels.image_paths,
                                       labels.coords_xy))
    if indices is not None:
        entries = [entries[i] for i in indices if i < len(entries)]
    if not entries:
        raise FileNotFoundError(f"no labeled images under {dlcpath}")

    out_dir = Path(dest_folder) if dest_folder else dlcpath / "maps"
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    for ip, coords in entries:
        img = cv2.imread(str(ip))
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if s != 1.0:
            img = cv2.resize(img, None, fx=s, fy=s)
        h, w = img.shape[:2]
        sh, sw = -(-h // int(stride)), -(-w // int(stride))
        present = ~np.isnan(np.asarray(coords)[:, 0])
        scmap, _, _ = dlc_scoremap_targets(
            jnp.asarray(np.asarray(coords)[None] * s),
            jnp.asarray(present[None]), sh, sw, stride,
            cfg.pos_dist_thresh, cfg.locref_stdev, scale=s)
        scmap = np.asarray(scmap)[0]

        nj = scmap.shape[-1]
        ncol = min(nj + 1, 4)
        nrow = -(-(nj + 1) // ncol)
        fig, axes = plt.subplots(nrow, ncol,
                                 figsize=(3.2 * ncol, 2.6 * nrow))
        axes = np.atleast_1d(axes).reshape(-1)
        axes[0].imshow(img)
        axes[0].set_title("image", fontsize=8)
        for j in range(nj):
            ax = axes[j + 1]
            ax.imshow(img, extent=(0, w, h, 0))
            up = cv2.resize(scmap[:, :, j], (w, h),
                            interpolation=cv2.INTER_NEAREST)
            ax.imshow(up, alpha=0.5, vmin=0, vmax=1, cmap="viridis",
                      extent=(0, w, h, 0))
            ax.set_title(names[j], fontsize=8)
        for ax in axes:
            ax.axis("off")
        out = out_dir / f"{ip.stem}_targets.png"
        fig.tight_layout()
        fig.savefig(out, dpi=100)
        plt.close(fig)
        written.append(out)
    print(f"wrote {len(written)} target grids to {out_dir}")
    return written
