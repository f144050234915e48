"""Time-sharded streaming video inference with halo exchange.

SURVEY §5 ("long-context"): the reference handles video length by
*subsampling* and processes inference frame-by-frame (ref: eval.py:306-345);
its only cross-frame coupling is the temporal clique between adjacent
frames (ref: fitdgp.py:1079-1124). The TPU-native answer for hour-long
videos (BASELINE.json config #5): shard the time axis across chips, decode
locally, and exchange boundary information over ICI with
``jax.lax.ppermute`` so temporally-coupled quantities are exact across
shard boundaries:

* frame-to-frame displacement (the inference-time analog of the temporal
  clique) — one-frame halo, one ppermute;
* confidence-gated EWMA smoothing — a *linear recurrence*, so cross-shard
  carries compose exactly as affine maps: each shard scans locally with a
  zero carry, then a ring token pass (n-1 ppermute hops of (nj, 2) floats)
  delivers every shard its true incoming carry, applied as a closed-form
  correction. No approximation, no resharding.

Built on ``shard_map`` so the collectives are explicit and ride ICI;
everything else (forward, soft-argmax decode) is per-shard local work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from deepgraphpose_tpu.parallel.mesh import DATA_AXIS


def make_time_sharded_infer_fn(model, cfg, mesh):
    """(variables, frames) -> (mu, likelihood, displacement).

    frames: (T, H, W, 3) uint8 with T divisible by the mesh size; T is
    sharded over the ``data`` axis. Returns per-frame soft-argmax coords
    (T, nj, 2), likelihoods (T, nj), and the temporal-clique displacement
    ``|mu_t - mu_{t-1}|`` (T, nj) in scoremap units — exact across shard
    boundaries via a ppermute halo; frame 0 (no predecessor) gets 0.
    """
    from deepgraphpose_tpu.infer.predict import infer_forward

    n = mesh.shape[DATA_AXIS]
    fwd = functools.partial(infer_forward, model, cfg)

    def local(variables, frames):
        mu, lik = fwd(variables, frames)                     # (Tl, nj, 2)
        # halo: my last mu becomes my right neighbor's predecessor
        perm = [(i, (i + 1) % n) for i in range(n)]
        prev_last = jax.lax.ppermute(mu[-1:], DATA_AXIS, perm)
        mu_prev = jnp.concatenate([prev_last, mu[:-1]], axis=0)
        disp = jnp.linalg.norm(mu - mu_prev, axis=-1)        # (Tl, nj)
        # the global first frame has no predecessor
        idx = jax.lax.axis_index(DATA_AXIS)
        t_iota = jax.lax.broadcasted_iota(jnp.int32, disp.shape, 0)
        disp = jnp.where((idx == 0) & (t_iota == 0), 0.0, disp)
        return mu, lik, disp

    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        check_rep=False)
    return jax.jit(
        mapped,
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(DATA_AXIS))),
        out_shardings=(NamedSharding(mesh, P(DATA_AXIS)),) * 3)


def estimate_pose_multichip(proj_cfg_file, dgp_model_file, video_file,
                            output_dir, mesh=None, shuffle: int = 1,
                            frames_per_device: int = 16,
                            max_frames: int | None = None,
                            save_pose: bool = True, save_str: str = "",
                            smooth: bool = False,
                            compute_dtype=None,
                            quantize: bool = False) -> dict:
    """Full-video inference with the time axis sharded over a device mesh.

    The hour-long-video configuration (BASELINE.json config #5): each
    super-batch of ``n_devices * frames_per_device`` frames is sharded over
    the mesh; decode is local, the temporal displacement crosses shard
    boundaries via the ppermute halo, and (optionally) the exact
    time-sharded EWMA smoother runs on device. Exports DLC-format CSV/H5
    like estimate_pose.
    """
    from pathlib import Path

    import numpy as np

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.data.video import VideoReader
    from deepgraphpose_tpu.infer.export import export_pose_like_dlc
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.parallel.mesh import make_mesh
    from deepgraphpose_tpu.train.fit import resolve_project

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.shape[DATA_AXIS]
    super_batch = n_dev * frames_per_device

    _, cfg, _ = resolve_project(Path(proj_cfg_file).parent, shuffle)
    reader = VideoReader(video_file)
    n_total = (min(reader.n_frames, max_frames) if max_frames
               else reader.n_frames)

    dtype = compute_dtype
    if dtype is None:
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  (reader.height, reader.width), dtype=dtype)
    variables, _ = ckpt_lib.load_snapshot(dgp_model_file, variables)
    if quantize:
        # int8 backbone (models/quant.py) sharded over time like the f32
        # one: qvariables replicate, frames shard — composition is free
        from deepgraphpose_tpu.models.quant import (calib_frames_from_video,
                                                    quantize_model)

        model, variables = quantize_model(
            cfg, variables, calib_frames_from_video(video_file),
            dtype=dtype, residual_int8=(quantize == "residual"))
    infer = make_time_sharded_infer_fn(model, cfg, mesh)
    smoother = make_time_sharded_smoother(mesh) if smooth else None

    nj = cfg.num_joints
    mu_all = np.zeros((n_total, nj, 2))
    lik_all = np.zeros((n_total, nj))
    disp_all = np.zeros((n_total, nj))

    from deepgraphpose_tpu.data.video import iter_frame_batches

    carry, has_carry = None, None
    prev_raw_last = None
    n_read = 0
    for start, block in iter_frame_batches(reader, super_batch, n_total):
        n_valid = block.shape[0]
        pad = super_batch - n_valid
        arr = (np.concatenate([block, block[-1:].repeat(pad, 0)])
               if pad else block)
        mu, lik, disp = infer(variables, jnp.asarray(arr))
        mu_raw = np.asarray(mu)[:n_valid]
        if smoother is not None:
            # thread the EWMA carry across super-batches (exact streaming)
            mu_s = smoother(mu, lik, carry, has_carry)
            carry = mu_s[n_valid - 1]
            has_carry = jnp.ones((1,))
            mu_out = np.asarray(mu_s)[:n_valid]
        else:
            mu_out = mu_raw
        end = start + n_valid
        mu_all[start:end] = mu_out
        lik_all[start:end] = np.asarray(lik)[:n_valid]
        disp_all[start:end] = np.asarray(disp)[:n_valid]
        if prev_raw_last is not None:
            # the on-device halo is per super-batch; stitch the boundary
            # pair from RAW coords (same quantity as the in-batch entries)
            disp_all[start] = np.linalg.norm(mu_raw[0] - prev_raw_last,
                                             axis=-1)
        prev_raw_last = mu_raw[-1]
        n_read = end
    reader.close()
    if n_read < n_total:
        print(f"warning: decoder yielded {n_read}/{n_total} frames "
              "(container metadata over-reported); truncating outputs")
        mu_all, lik_all, disp_all = (mu_all[:n_read], lik_all[:n_read],
                                     disp_all[:n_read])

    s = cfg.stride
    labels = {"x": mu_all[:, :, 1] * s + s / 2,
              "y": mu_all[:, :, 0] * s + s / 2,
              "likelihoods": lik_all, "displacement": disp_all}
    if save_pose:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        names = cfg.all_joints_names or [f"bp{i}" for i in range(nj)]
        export_pose_like_dlc(
            {k: labels[k] for k in ("x", "y", "likelihoods")},
            Path(dgp_model_file).stem, names,
            str(output_dir / (Path(video_file).stem + save_str)))
    return labels


def ewma_reference(mu, lik, alpha: float = 0.5, pcutoff: float = 0.4):
    """Sequential confidence-gated EWMA (numpy/jnp, for tests + CPU path).

    s_0 = x_0; s_t = alpha * s_{t-1} + (1-alpha) * x_t when lik_t >= pcutoff,
    else s_t = s_{t-1} (low-confidence frames coast on the estimate).
    """
    import numpy as np

    mu = np.asarray(mu, np.float64)
    ok = np.asarray(lik) >= pcutoff
    out = np.empty_like(mu)
    out[0] = mu[0]
    for t in range(1, mu.shape[0]):
        upd = alpha * out[t - 1] + (1 - alpha) * mu[t]
        out[t] = np.where(ok[t][..., None], upd, out[t - 1])
    return out


def make_time_sharded_smoother(mesh, alpha: float = 0.5,
                               pcutoff: float = 0.4):
    """Exact confidence-gated EWMA over a time-sharded (T, nj, 2) track.

    The recurrence is s_t = a_t s_{t-1} + b_t x_t with
    (a_t, b_t) = (alpha, 1-alpha) on confident frames and (1, 0) otherwise,
    i.e. an affine map per frame. Each shard computes its local scan with
    zero incoming carry plus its total decay A = prod a_t; the true carry
    entering shard k is then delivered by a ring token pass: shard k-1's
    exit state becomes valid at hop k-1 and is latched by shard k at hop k.
    Finally s_t += cumprod(a)_t * carry_in re-creates the exact sequential
    result (linearity).

    The returned fn takes (mu, lik, carry, has_carry): ``carry`` is the
    smoothed state entering frame 0 (from a previous super-batch of a
    streamed video) and ``has_carry`` a {0., 1.} scalar; with has_carry=0,
    frame 0 seeds s_0 = x_0 (reference semantics). The exit carry for the
    next super-batch is simply the last *valid* smoothed row (the scan is
    causal).
    """
    n = mesh.shape[DATA_AXIS]

    def local(mu, lik, carry, has_carry):
        ok = (lik >= pcutoff)[..., None]                     # (Tl, nj, 1)
        a = jnp.where(ok, alpha, 1.0)                        # decay per frame
        b = jnp.where(ok, 1.0 - alpha, 0.0)
        idx = jax.lax.axis_index(DATA_AXIS)

        # without an external carry, shard 0 seeds s_0 = x_0 (ref
        # semantics); other shards scan from a zero carry and get corrected
        # below
        t_iota = jax.lax.broadcasted_iota(jnp.int32, mu.shape, 0)
        first_global = (idx == 0) & (t_iota == 0) & (has_carry[0] == 0)
        a0 = jnp.where(first_global, 0.0, a)
        b0 = jnp.where(first_global, 1.0, b)

        def scan_fn(s, abx):
            at, bt, xt = abx
            s = at * s + bt * xt
            return s, s

        zero = jnp.zeros(mu.shape[1:])
        _, local_sm = jax.lax.scan(scan_fn, zero, (a0, b0, mu))
        cum_a = jnp.cumprod(a0, axis=0)                      # (Tl, nj, 2)

        # ring token pass: deliver the true incoming carry to every shard;
        # shard 0's incoming carry is the external one (zero if none)
        perm = [(i, (i + 1) % n) for i in range(n)]
        carry_in = carry * has_carry[0]

        def hop(k, carry_in):
            exit_state = cum_a[-1] * carry_in + local_sm[-1]
            received = jax.lax.ppermute(exit_state, DATA_AXIS, perm)
            return jnp.where(idx == k, received, carry_in)

        carry_in = jax.lax.fori_loop(1, n, hop, carry_in) if n > 1 else carry_in
        return local_sm + cum_a * carry_in[None]

    mapped = shard_map(local, mesh=mesh,
                       in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
                       out_specs=P(DATA_AXIS), check_rep=False)
    jitted = jax.jit(mapped)

    def smooth(mu, lik, carry=None, has_carry=None):
        if carry is None:
            carry = jnp.zeros(mu.shape[1:])
        if has_carry is None:
            has_carry = jnp.zeros((1,))
        return jitted(mu, lik, carry, has_carry)

    return smooth
