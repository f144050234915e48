"""Experiment helpers: sweep expansion + run identifiers."""

from deepgraphpose_tpu.utils.experiments import create_schedule, generate_log_id


def test_create_schedule_cartesian_product():
    grid = {"lr": [0.005, 0.02], "optimizer": ["sgd", "adam"],
            "ws": 1000.0, "multi_step": [[[0.001, 1000]]]}
    sched = create_schedule(grid)
    assert len(sched) == 4
    assert {(c["lr"], c["optimizer"]) for c in sched} == {
        (0.005, "sgd"), (0.005, "adam"), (0.02, "sgd"), (0.02, "adam")}
    assert all(c["ws"] == 1000.0 for c in sched)
    assert all(c["multi_step"] == [[0.001, 1000]] for c in sched)


def test_generate_log_id_stable_and_sorted():
    cfg = {"net_type": "resnet_50", "lr": 0.005, "gm2": 2, "aug": True}
    lid = generate_log_id(cfg)
    assert lid.startswith("net_type-resnet_50")
    assert lid == generate_log_id(dict(reversed(list(cfg.items()))))
    assert "lr-0.00500" in lid and "gm2-2" in lid and "aug-True" in lid


def test_generate_log_id_small_floats_and_lists():
    lid = generate_log_id({"net_type": "resnet_50", "eps": 1e-7,
                           "steps": [1, 2, 3]})
    assert "eps-0.0000001" in lid
    assert "steps-1_2_3" in lid
