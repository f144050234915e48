"""``dgp`` command-line interface.

Command surface mirrors the reference's click-based ``dlc`` group
(ref: deeplabcut/cli.py:19-417) plus the DGP pipeline driver
(ref: demo/run_dgp_demo.py:117-147):

    dgp create-project   dgp add-videos          dgp extract-frames
    dgp label-frames     dgp check-labels        dgp create-training-dataset
    dgp train            dgp evaluate            dgp analyze-videos
    dgp filter-predictions  dgp extract-outlier-frames
    dgp create-labeled-video  dgp plot-trajectories
    dgp run-demo         (the 4-step DGP pipeline)

Run ``python -m deepgraphpose_tpu.cli --help``.
"""

from __future__ import annotations

import click

CTX = dict(help_option_names=["-h", "--help"])


def _resolve_quantize(quantize, residual_int8):
    """Map the --int8/--no-int8 tri-state + --residual-int8 flag pair to
    the library quantize= argument, rejecting the contradiction."""
    if residual_int8:
        if quantize is False:
            raise click.UsageError(
                "--no-int8 and --residual-int8 conflict: --no-int8 forces "
                "bf16, --residual-int8 requests the int8 carry mode")
        return "residual"
    return quantize


@click.group(context_settings=CTX)
def main():
    """TPU-native DeepGraphPose toolbox."""


@main.command(context_settings=CTX)
@click.argument("project")
@click.argument("experimenter")
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("-d", "--wd", "working_directory", default=None,
              help="directory to create the project in")
@click.option("--copy-videos/--dont-copy-videos", default=True)
@click.option("--videotype", default=".avi")
def create_project(project, experimenter, videos, working_directory,
                   copy_videos, videotype):
    """Create a new DLC/DGP project skeleton."""
    from deepgraphpose_tpu.project import create_new_project

    path = create_new_project(project, experimenter, list(videos),
                              working_directory, copy_videos, videotype)
    click.echo(path)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("--copy-videos/--dont-copy-videos", default=True)
def add_videos(config, videos, copy_videos):
    """Add videos to an existing project."""
    from deepgraphpose_tpu.project import add_new_videos

    add_new_videos(config, list(videos), copy_videos)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("--mode", default="automatic",
              type=click.Choice(["automatic", "manual"]),
              help="'manual' = scrub-and-grab browser UI "
                   "(or $DGP_MANUAL_FRAMES)")
@click.option("-a", "--algo", default="kmeans",
              type=click.Choice(["kmeans", "uniform"]))
@click.option("--crop", is_flag=True, default=False)
@click.option("--port", default=0, help="manual-mode UI port (0 = any)")
@click.option("--timeout", default=None, type=float,
              help="manual-mode bound in seconds (default: wait forever; "
                   "on timeout, frames grabbed so far are kept)")
def extract_frames(config, mode, algo, crop, port, timeout):
    """Extract frames for labeling (kmeans/uniform, or manual grab)."""
    from deepgraphpose_tpu.project import extract_frames as _extract

    _extract(config, mode=mode, algo=algo, crop=crop, port=port,
             timeout=timeout)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("--video", default=None,
              help="labeled-data video dir (default: first)")
@click.option("--port", default=8574, type=int)
def label_frames(config, video, port):
    """Browser labeling UI (headless replacement for the wx toolbox)."""
    from pathlib import Path

    from deepgraphpose_tpu.project.label_server import LabelServer

    LabelServer(Path(config).parent, video=video,
                port=port).serve_forever()


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
def check_labels(config):
    """Render human labels onto the labeled frames for inspection."""
    from deepgraphpose_tpu.infer.plotting import check_labels as _check

    _check(config)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("-num", "--num-shuffles", default=1)
@click.option("--net-type", default=None)
def create_training_dataset(config, num_shuffles, net_type):
    """Merge labels, split train/test, write .mat + pose_cfg.yaml."""
    from deepgraphpose_tpu.project import \
        create_training_dataset as _create

    _create(config, num_shuffles=num_shuffles, net_type=net_type)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("--shuffle", default=1)
@click.option("--step", default=None, type=int,
              help="run only one step (0=DLC, 1=DGP labeled-only, 2=DGP)")
@click.option("--batch-size", default=10)
@click.option("--maxiters", default=None, type=int)
@click.option("--displayiters", default=100)
@click.option("--saveiters", default=1000)
@click.option("--snapshot", default=None,
              help="warm-start snapshot name for the chosen step")
def train(config, shuffle, step, batch_size, maxiters, displayiters,
          saveiters, snapshot):
    """Train: all 3 steps by default, or a single --step."""
    from pathlib import Path

    from deepgraphpose_tpu.train import fit as fit_lib

    dlcpath = Path(config).parent
    kw = dict(dlcpath=dlcpath, shuffle=shuffle, displayiters=displayiters,
              saveiters=saveiters)
    if maxiters is not None:
        kw["maxiters"] = maxiters
    steps = [step] if step is not None else [0, 1, 2]
    for s in steps:
        if s == 0:
            fit_lib.fit_dlc(snapshot=snapshot, **kw)
        elif s == 1:
            fit_lib.fit_dgp_labeledonly(
                snapshot=snapshot or "snapshot-step0-final--0", **kw)
        else:
            fit_lib.fit_dgp(
                snapshot=snapshot or "snapshot-step1-final--0",
                batch_size=batch_size, **kw)


@main.command(context_settings=CTX, name="train-heads")
@click.argument("config", type=click.Path(exists=True))
@click.option("--shuffle", default=1)
@click.option("--maxiters", default=5000)
@click.option("--displayiters", default=500)
@click.option("--snapshot", default=None,
              help="backbone snapshot (defaults to latest step-0)")
@click.option("--lr", default=None, type=float)
@click.option("--reinit-heads/--keep-heads", default=False,
              help="re-initialise the head parameters before fitting "
                   "(the reference preprocess/ pipeline's use case)")
def train_heads(config, shuffle, maxiters, displayiters, snapshot, lr,
                reinit_heads):
    """Head-only training on cached backbone features (train/headonly.py;
    the working redesign of the reference's legacy preprocess/ pipeline)."""
    from pathlib import Path

    from deepgraphpose_tpu.train.headonly import fit_dlc_heads

    fit_dlc_heads(dlcpath=Path(config).parent, shuffle=shuffle,
                  maxiters=maxiters, displayiters=displayiters,
                  snapshot=snapshot, lr=lr, reinit_heads=reinit_heads)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("--shuffle", default=1)
@click.option("--snapshot", default=None,
              help="snapshot name (defaults to latest step-2 final)")
@click.option("--out", default=None, help="write per-frame RMSE CSV here")
@click.option("--plotting/--no-plotting", default=False,
              help="write per-frame labeled evaluation images "
                   "(ref evaluate_network plotting=True)")
@click.option("--int8/--no-int8", "quantize", default=False,
              help="evaluate the int8-quantized backbone (models/quant.py)")
def evaluate(config, shuffle, snapshot, out, plotting, quantize):
    """RMSE vs human labels on the train/test split."""
    from pathlib import Path

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.evaluation.metrics import (evaluate_dgp,
                                                      write_evaluation_csv)
    from deepgraphpose_tpu.train.fit import resolve_project

    dlcpath = Path(config).parent
    proj, _, train_dir = resolve_project(dlcpath, shuffle)
    if snapshot:
        snap = Path(train_dir) / f"{snapshot}{ckpt_lib.CKPT_SUFFIX}"
    else:
        snap = ckpt_lib.latest_snapshot(train_dir)
    if snap is None or not Path(snap).exists():
        raise click.ClickException(f"no snapshot under {train_dir}")
    result = evaluate_dgp(config, snap, shuffle=shuffle, quantize=quantize)
    if out:
        write_evaluation_csv(result, out)
    if plotting:
        from deepgraphpose_tpu.infer.plotting import plot_evaluation_frames

        folder = (dlcpath / "evaluation-results" /
                  f"iteration-{proj.iteration}" /
                  f"LabeledImages_{Path(snap).stem}")
        written = plot_evaluation_frames(
            result["image_paths"], result["true_xy"], result["pred_xy"],
            result["likelihood"], result["is_train"], folder,
            pcutoff=proj.pcutoff, dotsize=proj.dotsize,
            alpha=proj.alphavalue, colormap=proj.colormap,
            bodyparts=proj.bodyparts)
        click.echo(f"wrote {len(written)} labeled evaluation images to "
                   f"{folder}")


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("--shuffle", default=1)
@click.option("--batchsize", default=None, type=int)
@click.option("--save-as-csv/--no-csv", default=True)
@click.option("--destfolder", default=None)
@click.option("--int8/--no-int8", "quantize", default=None,
              help="int8-quantized backbone (2x MXU rate; models/quant.py); "
                   "--no-int8 forces bf16 even under --preset fast")
@click.option("--residual-int8", is_flag=True, default=False,
              help="int8 backbone with int8 residual-stream carries "
                   "(+25% over --int8; accuracy cost in EVAL.md)")
@click.option("--scale", default=None, type=float,
              help="resize frames by this factor before inference "
                   "(coordinates stay in original pixels)")
@click.option("--preset", default=None, type=click.Choice(["fast"]),
              help="'fast' = scale 0.75 + residual-int8: the measured "
                   "above-target full-frame operating point (PERF.md)")
@click.option("--dynamic", nargs=3, type=float, default=(0, 0.5, 10),
              help="dynamic cropping: STATE THRESHOLD MARGIN "
                   "(ref predict_videos.py dynamic=(False,.5,10))")
def analyze_videos(config, videos, shuffle, batchsize, save_as_csv,
                   destfolder, quantize, residual_int8, scale, preset,
                   dynamic):
    """Batched full-video inference with DLC scorer-named outputs."""
    from deepgraphpose_tpu.infer.analyze import analyze_videos as _analyze

    _analyze(config, list(videos), shuffle=shuffle, batchsize=batchsize,
             save_as_csv=save_as_csv, destfolder=destfolder,
             quantize=_resolve_quantize(quantize, residual_int8),
             scale=scale, preset=preset,
             dynamic=(bool(dynamic[0]), dynamic[1], int(dynamic[2])))


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("--filtertype", default="median",
              type=click.Choice(["median", "kalman", "arima"]))
@click.option("--windowlength", default=5)
def filter_predictions(config, videos, filtertype, windowlength):
    """Median/Kalman filtering of analyzed trajectories."""
    from deepgraphpose_tpu.evaluation.filtering import filterpredictions

    filterpredictions(config, list(videos), filtertype=filtertype,
                      windowlength=windowlength)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("--outlieralgorithm", default="jump",
              type=click.Choice(["jump", "uncertain", "fitting"]))
@click.option("--epsilon", default=20.0)
@click.option("--p-bound", default=0.01)
@click.option("--extractionalgorithm", default="uniform",
              type=click.Choice(["uniform", "kmeans"]))
def extract_outlier_frames(config, videos, outlieralgorithm, epsilon,
                           p_bound, extractionalgorithm):
    """Flag + extract outlier frames for relabeling."""
    from deepgraphpose_tpu.evaluation.outliers import \
        extract_outlier_frames as _extract

    _extract(config, list(videos), outlieralgorithm=outlieralgorithm,
             epsilon=epsilon, p_bound=p_bound,
             extractionalgorithm=extractionalgorithm)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("--shuffle", default=1)
@click.option("--destfolder", default=None)
def create_labeled_video(config, videos, shuffle, destfolder):
    """Render marker-annotated videos from trajectories."""
    from pathlib import Path

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.infer.video_writer import plot_dgp
    from deepgraphpose_tpu.train.fit import resolve_project

    dlcpath = Path(config).parent
    proj, _, train_dir = resolve_project(dlcpath, shuffle)
    snap = ckpt_lib.latest_snapshot(train_dir)
    if snap is None:
        raise click.ClickException(f"no snapshot under {train_dir}")
    for video in videos:
        out = Path(destfolder) if destfolder else Path(video).parent
        plot_dgp(video, out, proj_cfg_file=config, dgp_model_file=snap,
                 shuffle=shuffle)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("--shuffle", default=1)
@click.option("--no-csv", is_flag=True, default=False)
def analyze_skeleton(config, videos, shuffle, no_csv):
    """Bone length/orientation per skeleton edge per frame."""
    from deepgraphpose_tpu.evaluation.skeleton import analyzeskeleton

    analyzeskeleton(config, list(videos), shuffle=shuffle,
                    save_as_csv=not no_csv)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("directory", type=click.Path(exists=True))
@click.option("--frametype", default=".png")
@click.option("--shuffle", default=1)
def analyze_time_lapse_frames(config, directory, frametype, shuffle):
    """Batched inference over a directory of same-sized images."""
    from deepgraphpose_tpu.infer.analyze import \
        analyze_time_lapse_frames as _analyze

    _analyze(config, directory, frametype=frametype, shuffle=shuffle)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("videos", nargs=-1, type=click.Path(exists=True))
@click.option("--filtered", is_flag=True, default=False)
def plot_trajectories(config, videos, filtered):
    """4-panel trajectory/likelihood plot per analyzed video."""
    from deepgraphpose_tpu.infer.plotting import \
        plot_trajectories as _plot

    _plot(config, list(videos), filtered=filtered)


@main.command(context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("--shuffle", default=1)
@click.option("--indices", default=None,
              help="comma-separated labeled-frame indices (default: all)")
def extract_maps(config, shuffle, indices):
    """Save scoremap grids for labeled frames (network introspection)."""
    from deepgraphpose_tpu.evaluation.maps import extract_save_all_maps

    idx = [int(i) for i in indices.split(",")] if indices else None
    extract_save_all_maps(config, shuffle=shuffle, indices=idx)


@main.command(context_settings=CTX)
@click.argument("project")
@click.argument("experimenter")
@click.option("-d", "--wd", "working_directory", default=None)
@click.option("--num-cameras", default=2)
def create_project_3d(project, experimenter, working_directory, num_cameras):
    """Create a 3-D (stereo) project skeleton."""
    from deepgraphpose_tpu.threed import create_new_project_3d

    click.echo(create_new_project_3d(project, experimenter,
                                     working_directory,
                                     num_cameras=num_cameras))


@main.command(context_settings=CTX)
@click.argument("config3d", type=click.Path(exists=True))
@click.option("--cbrow", default=8)
@click.option("--cbcol", default=6)
@click.option("--square-size", default=1.0)
def calibrate_cameras(config3d, cbrow, cbcol, square_size):
    """Stereo calibration from calibration_images/<camera>-*.jpg pairs."""
    from deepgraphpose_tpu.threed import calibrate_cameras as _calib

    _calib(config3d, cbrow=cbrow, cbcol=cbcol, square_size=square_size)


@main.command(context_settings=CTX)
@click.argument("config3d", type=click.Path(exists=True))
@click.argument("h5_cam1", type=click.Path(exists=True))
@click.argument("h5_cam2", type=click.Path(exists=True))
@click.option("--destfolder", default=None)
def triangulate(config3d, h5_cam1, h5_cam2, destfolder):
    """Triangulate two cameras' trajectory tables into 3-D."""
    from deepgraphpose_tpu.threed import triangulate as _tri

    _tri(config3d, h5_cam1, h5_cam2, destfolder=destfolder)


@main.command(context_settings=CTX)
@click.option("--dlcpath", required=True, type=click.Path(exists=True))
@click.option("--dlcsnapshot", default=None)
@click.option("--shuffle", default=1)
@click.option("--batch_size", "--batch-size", "batch_size", default=10)
@click.option("--test", is_flag=True, default=False)
def run_demo(dlcpath, dlcsnapshot, shuffle, batch_size, test):
    """Full 4-step DGP pipeline (== demo/run_dgp_demo.py)."""
    import sys
    from pathlib import Path

    demo_dir = Path(__file__).resolve().parent.parent / "demo"
    sys.path.insert(0, str(demo_dir))
    import run_dgp_demo

    argv = ["--dlcpath", str(dlcpath), "--shuffle", str(shuffle),
            "--batch_size", str(batch_size)]
    if dlcsnapshot:
        argv += ["--dlcsnapshot", dlcsnapshot]
    if test:
        argv += ["--test"]
    raise SystemExit(run_dgp_demo.main(argv))


@main.command("export-model", context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.argument("out", type=click.Path())
@click.option("--snapshot", default="snapshot-step2-final--0",
              help="snapshot name under the train dir")
@click.option("--shuffle", default=1)
@click.option("--batch-size", default=16)
@click.option("--height", default=None, type=int)
@click.option("--width", default=None, type=int)
@click.option("--platforms", default="tpu,cpu",
              help="comma-separated export platforms")
@click.option("--int8/--no-int8", "quantize", default=None,
              help="export the int8-quantized backbone (models/quant.py)")
@click.option("--residual-int8", is_flag=True, default=False,
              help="int8 backbone with int8 residual-stream carries "
                   "(+25% over --int8; accuracy cost in EVAL.md)")
def export_model(config, out, snapshot, shuffle, batch_size, height, width,
                 platforms, quantize, residual_int8):
    """Freeze a trained snapshot into a StableHLO serving artifact."""
    from deepgraphpose_tpu.infer.serving import export_from_snapshot

    in_hw = (height, width) if height and width else None
    quantize = _resolve_quantize(quantize, residual_int8)
    path = export_from_snapshot(
        config, snapshot, out, batch_size=batch_size, in_hw=in_hw,
        shuffle=shuffle, platforms=tuple(platforms.split(",")),
        quantize=False if quantize is None else quantize)
    click.echo(f"wrote {path} (+ {path}.json metadata)")


@main.command("convertcsv2h5", context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("--scorer", default=None,
              help="overwrite the annotator name in the rewritten files")
@click.option("--userfeedback", is_flag=True, default=False,
              help="ask per labeled-data folder before converting")
def convertcsv2h5_cmd(config, scorer, userfeedback):
    """Rebuild CollectedData .h5 files from their .csv siblings
    (ref: utils/conversioncode.py:49-110)."""
    from deepgraphpose_tpu.project.conversion import convertcsv2h5

    n = convertcsv2h5(config, userfeedback=userfeedback, scorer=scorer)
    click.echo(f"converted {n} folder(s)")


@main.command("convert-windows-paths", context_settings=CTX)
@click.argument("config", type=click.Path(exists=True))
@click.option("--userfeedback", is_flag=True, default=False)
def convert_windows_paths(config, userfeedback):
    """Convert Windows-style annotation image paths to unix form
    (ref: utils/conversioncode.py:17-47)."""
    from deepgraphpose_tpu.project.conversion import \
        convertannotationdata_fromwindows2unixstyle

    n = convertannotationdata_fromwindows2unixstyle(
        config, userfeedback=userfeedback)
    click.echo(f"converted {n} folder(s)")


@main.command("converth5-to-csv", context_settings=CTX)
@click.argument("videopath", type=click.Path(exists=True))
@click.option("--videotype", default=".avi")
def converth5_to_csv(videopath, videotype):
    """Export pose .h5 tables next to videos as .csv
    (ref: utils/conversioncode.py:112-156)."""
    from deepgraphpose_tpu.project.conversion import \
        analyze_videos_converth5_to_csv

    n = analyze_videos_converth5_to_csv(videopath, videotype=videotype)
    click.echo(f"converted {n} file(s)")


if __name__ == "__main__":
    main()
