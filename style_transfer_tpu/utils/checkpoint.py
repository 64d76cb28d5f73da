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
import threading
from pathlib import Path

import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "pack_rng_state",
    "unpack_rng_state",
    "AsyncCheckpointWriter",
]

_FORMAT_VERSION = 3  # v3 adds L-BFGS states (lbfgs_* arrays); v1/v2 still load


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


def save_checkpoint(path, *, image, ema, scale_index, done_iters,
                    adam=None, lbfgs=None, meta=None, optimizer="adam",
                    rng=None):
    """Atomically write the optimization state to ``path`` (.npz).

    Exactly one of ``adam`` (an AdamState) or ``lbfgs`` (an LBFGSState — any
    NamedTuple of arrays; its fields are stored as ``lbfgs_<field>``) must be
    given; both optimizers are first-class (the reference treats L-BFGS as
    such, ref style_transfer.py:464-467).
    """
    if (adam is None) == (lbfgs is None):
        raise ValueError("exactly one of adam= / lbfgs= is required")
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
        "ema_value": np.asarray(ema.value),
        "ema_accum": np.asarray(ema.accum),
    }
    if adam is not None:
        arrays.update(
            adam_mu=np.asarray(adam.mu),
            adam_nu=np.asarray(adam.nu),
            adam_count=np.asarray(adam.count),
        )
    else:
        header["lbfgs_fields"] = list(lbfgs._fields)
        for name in lbfgs._fields:
            arrays[f"lbfgs_{name}"] = np.asarray(getattr(lbfgs, name))
    if rng is not None:
        rng_header, rng_keys = pack_rng_state(rng)
        header["rng"] = rng_header
        arrays["rng_keys"] = rng_keys
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)


class AsyncCheckpointWriter:
    """Background-thread checkpoint writer with a single-slot queue.

    The serialize-and-write of a print-size checkpoint (hundreds of MB of
    .npz) is pure host I/O; running it on a worker thread keeps it out of
    the iteration loop. Only the *newest* submitted state is kept — if a
    write is still in flight when the next one arrives, the pending slot is
    replaced (a checkpoint is a recovery point, not a log). Device arrays
    are fine as long as they are COPIES the caller will not donate (the
    engine snapshots with ``jnp.copy``): the device->host fetch then runs
    on this thread, overlapping device compute. Never submit the live state
    itself — the step donates it at the next chunk.

    ``flush()`` blocks until the slot is empty and no write is in flight —
    call it before process exit (and on interrupt) so the last submitted
    state is durable.
    """

    def __init__(self):
        self._cond = threading.Condition()
        self._pending = None  # (args, kwargs) | None
        self._busy = False
        self._closed = False
        self.error = None  # last write failure, surfaced on flush
        self._thread = threading.Thread(
            target=self._run, name="stt-checkpoint", daemon=True
        )
        self._thread.start()

    def _run(self):
        while True:
            with self._cond:
                while self._pending is None and not self._closed:
                    self._cond.wait()
                if self._pending is None and self._closed:
                    return
                args, kwargs = self._pending
                self._pending = None
                self._busy = True
            try:
                save_checkpoint(*args, **kwargs)
            except Exception as err:  # surfaced on flush; keep the loop alive
                self.error = err
            with self._cond:
                self._busy = False
                self._cond.notify_all()

    def submit(self, path, **state):
        with self._cond:
            self._pending = ((path,), state)
            self._cond.notify_all()

    def flush(self):
        """Wait for the queue to drain; raise if the last write failed."""
        with self._cond:
            while self._pending is not None or self._busy:
                self._cond.wait()
        if self.error is not None:
            err, self.error = self.error, None
            raise err

    def close(self):
        self.flush()
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._thread.join(timeout=5)


def load_checkpoint(path):
    """Returns a dict with image/adam_*/ema_* arrays and header fields."""
    with np.load(path) as f:
        out = {k: f[k] for k in f.files}
    header = json.loads(bytes(out.pop("header")).decode())
    if header.get("version") not in (1, 2, _FORMAT_VERSION):
        raise ValueError(f"unsupported checkpoint version: {header.get('version')}")
    header.setdefault("optimizer", "adam")
    out.update(header)
    return out
