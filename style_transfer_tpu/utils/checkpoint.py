"""Checkpoint / resume.

The reference has no resume-from-disk — its only mid-run artifacts are
``--save-every`` image writes (SURVEY.md §5). This framework checkpoints the
*full optimization state* — image iterate, Adam moments and step count, EMA
state and its accumulator, plus the pyramid position — as a single ``.npz``,
so an interrupted print-resolution run continues exactly where it stopped
(same trajectory: state is bit-identical and targets are recomputed
deterministically from the inputs).
"""

import json
from pathlib import Path

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "pack_rng_state", "unpack_rng_state"]

_FORMAT_VERSION = 2


def pack_rng_state(rng):
    """np.random.RandomState -> JSON-safe header dict + uint32 key array."""
    kind, keys, pos, has_gauss, cached = rng.get_state()
    return (
        {"kind": kind, "pos": int(pos), "has_gauss": int(has_gauss),
         "cached_gaussian": float(cached)},
        np.asarray(keys, np.uint32),
    )


def unpack_rng_state(rng, header, keys):
    rng.set_state((
        header["kind"], np.asarray(keys, np.uint32), int(header["pos"]),
        int(header["has_gauss"]), float(header["cached_gaussian"]),
    ))


def save_checkpoint(path, *, image, adam, ema, scale_index, done_iters,
                    meta=None, optimizer="adam", rng=None):
    """Atomically write the optimization state to ``path`` (.npz)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    header = {
        "version": _FORMAT_VERSION,
        "scale_index": int(scale_index),
        "done_iters": int(done_iters),
        "optimizer": optimizer,
        "meta": meta or {},
    }
    arrays = {
        "image": np.asarray(image),
        "adam_mu": np.asarray(adam.mu),
        "adam_nu": np.asarray(adam.nu),
        "adam_count": np.asarray(adam.count),
        "ema_value": np.asarray(ema.value),
        "ema_accum": np.asarray(ema.accum),
    }
    if rng is not None:
        rng_header, rng_keys = pack_rng_state(rng)
        header["rng"] = rng_header
        arrays["rng_keys"] = rng_keys
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)


def load_checkpoint(path):
    """Returns a dict with image/adam_*/ema_* arrays and header fields."""
    with np.load(path) as f:
        out = {k: f[k] for k in f.files}
    header = json.loads(bytes(out.pop("header")).decode())
    if header.get("version") not in (1, _FORMAT_VERSION):
        raise ValueError(f"unsupported checkpoint version: {header.get('version')}")
    header.setdefault("optimizer", "adam")
    out.update(header)
    return out
