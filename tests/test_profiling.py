"""Profiling utilities: StepTimer JSON lines, trace context, memory stats."""

import json

import jax
import jax.numpy as jnp

from deepgraphpose_tpu.utils.profiling import (StepTimer,
                                               device_memory_stats, trace)


def test_step_timer_records_and_rolls(tmp_path):
    path = tmp_path / "steps.jsonl"
    with StepTimer(path, window=3) as t:
        for i in range(5):
            dt = t.step(i, loss=float(i))
            assert dt >= 0
        assert len(t._durations) == 3
        assert t.mean_step_seconds > 0
        assert t.rate(items_per_step=10) > 0
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == 5
    assert lines[2] == {"iteration": 2,
                        "step_seconds": lines[2]["step_seconds"],
                        "loss": 2.0}


def test_trace_context(tmp_path):
    with trace(tmp_path / "tb"):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # jax writes plugins/profile/<ts>/ under the logdir when it worked;
    # the context must not raise either way
    assert (tmp_path / "tb").exists() or True


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) == len(jax.devices())
    assert all("device" in s for s in stats)
