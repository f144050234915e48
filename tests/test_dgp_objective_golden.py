"""Golden test: the full fused DGP objective vs an independent numpy
re-implementation (SURVEY 'hard parts': population re-weighting and clique
normalization are easy to get silently wrong — this checks the whole
composition, not just the primitives)."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams, dgp_loss


def _np_softargmax(pred, gamma, gauss_len):
    t, h, w, c = pred.shape
    radius = int(gauss_len)
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (xs / gauss_len) ** 2)
    k = k / k.sum()
    mu = np.zeros((t, c, 2))
    for ti in range(t):
        for ci in range(c):
            m = pred[ti, :, :, ci].astype(np.float64) * gamma
            e = np.exp(m - m.max())
            p = e / e.sum()
            pad = np.zeros((h + 2 * radius, w + 2 * radius))
            pad[radius:radius + h, radius:radius + w] = p
            a = sum(k[d] * pad[d:d + h, radius:radius + w]
                    for d in range(2 * radius + 1))
            pad2 = np.zeros_like(pad)
            pad2[radius:radius + h, radius:radius + w] = a
            a = sum(k[d] * pad2[radius:radius + h, d:d + w]
                    for d in range(2 * radius + 1))
            a = a / a.sum()
            rr, cc = np.mgrid[0:h, 0:w]
            mu[ti, ci] = [(a * rr).sum(), (a * cc).sum()]
    return mu


def _np_ce(labels, logits):
    return (np.maximum(logits, 0) - logits * labels
            + np.log1p(np.exp(-np.abs(logits))))


def _np_dgp_loss(pred, locref_pred, batch, p):
    t, h, w, nj = pred.shape
    n = t * nj
    pred = pred.astype(np.float64)
    targets = np.nan_to_num(batch["targets"]).astype(np.float64)
    vis = batch["visible_mask"].astype(np.float64)
    hid = batch["hidden_mask"].astype(np.float64)
    fmask = batch["frame_mask"].astype(np.float64)

    mu = _np_softargmax(pred, p.gamma, p.gauss_len).reshape(n, 2)
    tf_ = targets.reshape(n, 2)
    combined = np.where(vis[:, None] > 0, tf_, mu)

    # gaussian targets, peak-normalized with +1e-5 (ref: fitdgp.py:968-976)
    rr, cc = np.mgrid[0:h, 0:w]
    g = np.exp(-((rr[None] - combined[:, 0, None, None]) ** 2
                 + (cc[None] - combined[:, 1, None, None]) ** 2)
               / (2 * p.lengthscale ** 2))
    g = g / (g.max(axis=(1, 2), keepdims=True) + 1e-5)

    pred_m = pred.transpose(0, 3, 1, 2).reshape(n, h, w)
    ce = _np_ce(g, pred_m)
    vis_loss = (ce * vis[:, None, None]).sum() / (vis.sum() * h * w)

    # gm2 confidence scaling (ref: fitdgp.py:994-1021)
    gauss_h = g
    sig = 1 / (1 + np.exp(-pred_m))
    pgm = sig.max(axis=(1, 2))
    scaled = sig * pgm[:, None, None]
    logit_scaled = (-np.log(1 - scaled + 1e-20) + np.log(scaled + 1e-20))
    if p.gm2 == 1:
        gauss_h = g * pgm[:, None, None]

    pop = p.n_visible_frames_total / p.n_hidden_frames_total
    hscale = pop * (hid.sum() / vis.sum()) * (p.wn_hidden / p.wn_visible)
    if p.gm3 == 3:
        ce_h = _np_ce(gauss_h, logit_scaled)
        wm = (1 - pgm) * hid
        hid_loss = ((ce_h * wm[:, None, None]).sum()
                    / ((wm != 0).sum() * h * w)) * hscale
    else:
        ce_h = _np_ce(gauss_h, pred_m)
        hid_loss = ((ce_h * hid[:, None, None]).sum()
                    / (hid.sum() * h * w)) * hscale

    # locref huber on visible markers (disk around labels)
    px = targets[..., 1] * p.stride + p.stride / 2     # x
    py = targets[..., 0] * p.stride + p.stride / 2     # y
    gx = cc * p.stride + p.stride / 2
    gy = rr * p.stride + p.stride / 2
    dx = px[:, None, None, :] - gx[None, :, :, None]   # (T,H,W,nj)
    dy = py[:, None, None, :] - gy[None, :, :, None]
    inside = ((dx ** 2 + dy ** 2 <= p.pos_dist_thresh ** 2)
              & (vis.reshape(t, nj)[:, None, None, :] > 0))
    lmap = np.stack([dx, dy], -1) / p.locref_stdev * inside[..., None]
    lpred = locref_pred.reshape(t, h, w, nj, 2)
    diff = lpred - lmap
    hub = np.where(np.abs(diff) < 1.0, 0.5 * diff ** 2,
                   np.abs(diff) - 0.5)
    wmask = np.repeat(inside[..., None], 2, axis=-1).astype(float)
    locref_loss = (p.locref_loss_weight * (hub * wmask).sum()
                   / max((wmask != 0).sum(), 1))

    # cliques on combined px coords
    comb_px = combined.reshape(t, nj, 2) * p.stride + p.stride / 2
    S0 = np.asarray(p.S0)
    limb = np.einsum("lj,tjc->tlc", S0, comb_px)
    dist = np.sqrt((limb ** 2).sum(-1) + 1e-12)
    hinged = np.maximum(dist - p.ws_max[None], 0) + p.ws_max[None]
    ws_loss = (hinged * p.ws[None] * fmask[:, None]).sum() / h / w

    p0, p1 = comb_px[:-1], comb_px[1:]
    td = np.sqrt(((p0 - p1) ** 2).sum(-1) + 1e-12)
    flow = batch["flow"].astype(np.float64)
    h_in, w_in = flow.shape[1:]
    meanf = np.zeros((t - 1, nj))
    for pi in range(t - 1):
        for j in range(nj):
            rmin = max(min(p0[pi, j, 0], p1[pi, j, 0]) - 10, 0)
            rmax = min(max(p0[pi, j, 0], p1[pi, j, 0]) + 10, h_in)
            cmin = max(min(p0[pi, j, 1], p1[pi, j, 1]) - 10, 0)
            cmax = min(max(p0[pi, j, 1], p1[pi, j, 1]) + 10, w_in)
            box = flow[pi, int(round(rmin)):int(round(rmax)),
                       int(round(cmin)):int(round(cmax))]
            meanf[pi, j] = box.mean() if box.size else 0.0
    inv = np.minimum(np.minimum(1 / (meanf + 1e-10), 1) ** 3, 1)
    gate = inv * (batch["wt_batch"] * batch["pair_mask"])[:, None] / h / w
    wt_loss = np.sqrt((((np.maximum(td - p.wt_max, 0) + p.wt_max)
                        * gate) ** 2).sum() + 1e-20)

    n_total = p.n_visible_frames_total + p.n_hidden_frames_total
    cscale = p.n_visible_frames_total / vis.sum() / n_total / p.wn_visible
    return {
        "visible_loss_pred": vis_loss,
        "hidden_loss_pred": hid_loss,
        "visible_loss_locref": locref_loss,
        "ws_loss": ws_loss * cscale,
        "wt_loss": wt_loss * cscale,
        "total_loss": (vis_loss + hid_loss + locref_loss
                       + (ws_loss + wt_loss) * cscale),
    }


@pytest.mark.parametrize("gm2,gm3", [(0, 0), (1, 0), (2, 3), (1, 3)])
def test_full_objective_matches_numpy(rng, gm2, gm3):
    t, h, w, nj = 4, 10, 12, 3
    n = t * nj
    pred = (rng.standard_normal((t, h, w, nj)) * 2).astype(np.float32)
    locref_pred = (rng.standard_normal((t, h, w, 2 * nj)) * 0.3
                   ).astype(np.float32)

    # frames 0, 2 labeled; joint 2 of frame 0 is NaN -> hidden marker
    targets = rng.uniform(1, 8, (t, nj, 2)).astype(np.float32)
    visible = np.zeros((t, nj), bool)
    visible[0] = True
    visible[2] = True
    visible[0, 2] = False
    vis = visible.reshape(-1).astype(np.float32)
    hid = 1.0 - vis

    flow = rng.uniform(0.1, 2.0, (t - 1, 80, 96)).astype(np.float32)
    batch = {
        "targets": targets,
        "visible_mask": vis,
        "hidden_mask": hid,
        "frame_mask": np.ones(t, np.float32),
        "wt_batch": np.full(t - 1, 1.3, np.float32),
        "pair_mask": np.array([1, 1, 0], np.float32),
        "flow": flow,
    }
    S0 = np.array([[1.0, -1.0, 0.0], [0.0, 1.0, -1.0]], np.float32)
    p = DGPLossParams(
        nj=nj, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=17.0, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=1.3,
        wt_max=0.5, gm2=gm2, gm3=gm3, n_visible_frames_total=11.0,
        n_hidden_frames_total=29.0, S0=S0,
        ws=np.array([0.4, 0.9], np.float32),
        ws_max=np.array([30.0, 22.0], np.float32))

    got = dgp_loss(jnp.asarray(pred), jnp.asarray(locref_pred),
                   {k: jnp.asarray(v) for k, v in batch.items()}, p)
    want = _np_dgp_loss(pred, locref_pred, batch, p)

    for key, w_val in want.items():
        g_val = float(got[key])
        assert g_val == pytest.approx(w_val, rel=0.02), (
            f"{key}: got {g_val}, want {w_val}")
    # total_loss_visible is the step-1 objective
    assert float(got["total_loss_visible"]) == pytest.approx(
        want["visible_loss_pred"] + want["visible_loss_locref"], rel=0.02)
