"""Checkpointing with the reference's snapshot naming contract.

ref: fitdgp.py:150-152 (Saver max_to_keep=5), 237-245 / 533-540 / 830-839
(``snapshot-step{N}-{it}`` plus ``snapshot-step{N}-final--0``), restore by
variable-scope filters (fitdgp.py:688-695).

Format: flax.serialization msgpack of {params, batch_stats[, opt_state]} in
a single ``<name>.ckpt`` file — host-agnostic, no TF protobufs. Orbax is
available in the environment but a single-file msgpack keeps the
snapshot-name contract 1:1 with the reference layout.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
from flax import serialization

from deepgraphpose_tpu.core import paths as paths_lib

CKPT_SUFFIX = ".ckpt"


def save_snapshot(train_dir: str | Path, step: int, iteration: int | str,
                  variables: dict, opt_state=None, max_to_keep: int = 5,
                  debug: str = "") -> Path:
    """Write ``snapshot-step{step}-{iteration}.ckpt`` and prune old ones."""
    import jax

    train_dir = Path(train_dir)
    train_dir.mkdir(parents=True, exist_ok=True)
    name = paths_lib.snapshot_name(step, iteration, debug)
    payload = {"variables": jax.device_get(variables)}
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    path = train_dir / f"{name}{CKPT_SUFFIX}"
    path.write_bytes(serialization.msgpack_serialize(
        _to_state_dict(payload)))
    _prune_snapshots(train_dir, step, max_to_keep, debug)
    return path


def _to_state_dict(tree):
    """Convert arbitrary pytrees (incl. optax named tuples) to nested dicts."""
    return serialization.to_state_dict(tree)


def load_snapshot(path: str | Path, variables_template=None,
                  opt_state_template=None):
    """Load a snapshot; restores onto templates when given.

    Returns (variables, opt_state_or_None).
    """
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    variables = raw["variables"]
    if variables_template is not None:
        variables = serialization.from_state_dict(variables_template,
                                                  variables)
    opt_state = raw.get("opt_state")
    if opt_state is not None and opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  opt_state)
    return variables, opt_state


def restore_backbone_and_heads(variables_template: dict,
                               snapshot_path: str | Path) -> dict:
    """Restore backbone + head params from a snapshot into a fresh template.

    Equivalent to the reference's scope-filtered Saver restore of
    ['pose/part_pred', 'pose/locref_pred', 'resnet'] (ref: fitdgp.py:688-695):
    everything the snapshot has overwrites the template; anything new in the
    template (e.g. a head the snapshot lacks) keeps its fresh init.
    """
    raw = serialization.msgpack_restore(Path(snapshot_path).read_bytes())
    saved = raw["variables"]

    def merge(tmpl, savd):
        if isinstance(tmpl, dict):
            out = {}
            for k, v in tmpl.items():
                if isinstance(savd, dict) and k in savd:
                    out[k] = merge(v, savd[k])
                else:
                    out[k] = v
            return out
        arr = np.asarray(savd)
        if hasattr(tmpl, "shape") and tuple(tmpl.shape) != tuple(arr.shape):
            return tmpl  # shape mismatch: keep fresh init
        return arr

    merged = merge(serialization.to_state_dict(variables_template), saved)
    return serialization.from_state_dict(variables_template, merged)


def snapshot_exists(train_dir: str | Path, step: int, debug: str = "") -> bool:
    """Skip-if-done check (ref: fitdgp.py:112-116, 361-365, 656-660)."""
    name = paths_lib.final_snapshot_name(step, debug)
    return (Path(train_dir) / f"{name}{CKPT_SUFFIX}").exists()


def latest_snapshot(train_dir: str | Path, step: int | None = None,
                    debug: str = "") -> Path | None:
    """Most recent snapshot, preferring final, else highest iteration."""
    train_dir = Path(train_dir)
    if not train_dir.exists():
        return None
    pats = []
    if step is not None:
        final = train_dir / f"{paths_lib.final_snapshot_name(step, debug)}{CKPT_SUFFIX}"
        if final.exists():
            return final
        pats = sorted(train_dir.glob(f"snapshot-step{step}{debug}-*{CKPT_SUFFIX}"),
                      key=_snapshot_iter)
    else:
        # across steps: prefer the highest pipeline step, then the highest
        # iteration (finals sort last within a step)
        pats = sorted(train_dir.glob(f"snapshot-*{CKPT_SUFFIX}"),
                      key=lambda p: (_step_num(p), _snapshot_iter(p)))
    return pats[-1] if pats else None


def _step_num(p: Path) -> int:
    m = re.search(r"snapshot-step(\d+)", p.name)
    return int(m.group(1)) if m else -1


def _snapshot_iter(p: Path) -> int:
    if p.name.endswith(f"final--0{CKPT_SUFFIX}"):
        return 10 ** 12  # 'final--0' sorts last
    m = re.search(r"-(\d+)\.ckpt$", p.name)
    return int(m.group(1)) if m else 10 ** 12 - 1


def _prune_snapshots(train_dir: Path, step: int, max_to_keep: int,
                     debug: str) -> None:
    snaps = [p for p in train_dir.glob(
        f"snapshot-step{step}{debug}-*{CKPT_SUFFIX}") if "final" not in p.name]
    snaps.sort(key=_snapshot_iter)
    for p in snaps[:-max_to_keep] if max_to_keep > 0 else []:
        p.unlink(missing_ok=True)


def latest_intermediate_snapshot(train_dir: str | Path, step: int,
                                 debug: str = "") -> tuple[Path, int] | None:
    """(path, iteration) of the newest non-final snapshot for mid-step
    resume — a capability the reference lacks (SURVEY §5: 'Resume-mid-step
    is not supported' there; only skip-if-final)."""
    train_dir = Path(train_dir)
    snaps = [p for p in train_dir.glob(
        f"snapshot-step{step}{debug}-*{CKPT_SUFFIX}")
        if "final" not in p.name]
    if not snaps:
        return None
    best = max(snaps, key=_snapshot_iter)
    m = re.search(r"-(\d+)\.ckpt$", best.name)
    return (best, int(m.group(1))) if m else None


# ---------------------------------------------------------------------------
# Orbax backend (optional)
# ---------------------------------------------------------------------------
# The single-file msgpack format above is the default (keeps the
# snapshot-name contract 1:1 with the reference's flat train/ directory).
# For multi-host / async / sharded-array checkpointing, the same payloads
# can go through Orbax: each snapshot becomes a directory
# ``<train_dir>/<snapshot-name>.orbax/``. SURVEY §5 names Orbax as the TPU
# equivalent of the reference's TF Saver.

def save_snapshot_orbax(train_dir: str | Path, step: int,
                        iteration: int | str, variables: dict,
                        opt_state=None, debug: str = "") -> Path:
    """Write ``snapshot-step{step}-{iteration}.orbax/`` via Orbax."""
    import jax
    import orbax.checkpoint as ocp

    train_dir = Path(train_dir)
    train_dir.mkdir(parents=True, exist_ok=True)
    name = paths_lib.snapshot_name(step, iteration, debug)
    path = (train_dir / f"{name}.orbax").resolve()
    payload = {"variables": serialization.to_state_dict(
        jax.device_get(variables))}
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(
            jax.device_get(opt_state))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_snapshot_orbax(path: str | Path, variables_template=None,
                        opt_state_template=None):
    """Restore an Orbax snapshot directory; mirrors load_snapshot."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(Path(path).resolve())
    variables = raw["variables"]
    if variables_template is not None:
        variables = serialization.from_state_dict(variables_template,
                                                  variables)
    opt_state = raw.get("opt_state")
    if opt_state is not None and opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  opt_state)
    return variables, opt_state
