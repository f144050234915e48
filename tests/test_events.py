"""ScalarEventWriter: byte-level validity checked with TF's own reader."""

import numpy as np
import pytest

from deepgraphpose_tpu.utils.events import (ScalarEventWriter, _crc32c,
                                            _varint)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_varint():
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"


def test_event_file_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")

    with ScalarEventWriter(tmp_path) as w:
        w.add_scalars(0, {"loss/total": 3.5, "loss/visible": 1.25})
        w.add_scalar("loss/total", 2.5, step=10)
        path = w.path

    events = []
    for rec in tf.data.TFRecordDataset(str(path)):
        ev = tf.compat.v1.Event()
        ev.ParseFromString(rec.numpy())
        events.append(ev)

    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            scalars[(ev.step, v.tag)] = v.simple_value
    assert scalars[(0, "loss/total")] == pytest.approx(3.5)
    assert scalars[(0, "loss/visible")] == pytest.approx(1.25)
    assert scalars[(10, "loss/total")] == pytest.approx(2.5)
    assert all(ev.wall_time > 1e9 for ev in events)
