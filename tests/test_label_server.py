"""Web labeling UI driven over real HTTP (urllib, no browser needed)."""

import json
import urllib.request
from pathlib import Path

import numpy as np


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, payload=None):
    data = json.dumps(payload).encode() if payload is not None else b""
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read()


def test_label_server_roundtrip(synthetic_project, tmp_path):
    import shutil

    from deepgraphpose_tpu.data.project import read_collected_data_csv
    from deepgraphpose_tpu.project.label_server import LabelServer

    src, lab_idx, coords = synthetic_project
    # the session fixture is shared; saving labels must not mutate it
    root = tmp_path / "proj"
    shutil.copytree(src, root)
    import yaml

    cfg = yaml.safe_load((root / "config.yaml").read_text())
    cfg["project_path"] = str(root)
    (root / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))
    srv = LabelServer(root).start()
    try:
        # index page + state
        status, html = _get(srv.url)
        assert status == 200 and b"<canvas" in html
        status, body = _get(srv.url + "api/state")
        state = json.loads(body)
        assert state["bodyparts"] == ["bp0", "bp1", "bp2"]
        assert len(state["frames"]) == len(lab_idx)

        # existing human labels were preloaded
        first = state["frames"][0]
        assert state["labels"][first][0][0] is not None

        # frame bytes served
        status, png = _get(srv.url + "frame/" + first)
        assert status == 200 and png[:4] == b"\x89PNG"

        # place a new label + clear another, then save
        _post(srv.url + "api/label",
              {"image": first, "joint": 1, "x": 12.5, "y": 20.25})
        _post(srv.url + "api/label",
              {"image": first, "joint": 2, "x": None, "y": None})
        status, msg = _post(srv.url + "api/save")
        assert status == 200 and b"saved" in msg

        csv_path = (Path(root) / "labeled-data" / "synthvid" /
                    "CollectedData_synth.csv")
        labels = read_collected_data_csv(csv_path)
        i = labels.image_paths.index(f"labeled-data/synthvid/{first}")
        np.testing.assert_allclose(labels.coords_xy[i, 1], [12.5, 20.25])
        assert np.isnan(labels.coords_xy[i, 2]).all()
    finally:
        srv.stop()


def test_label_server_missing_frame_404(synthetic_project):
    from deepgraphpose_tpu.project.label_server import LabelServer

    root, _, _ = synthetic_project
    srv = LabelServer(root).start()
    try:
        import urllib.error

        try:
            _get(srv.url + "frame/nope.png")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()
