"""Activation fingerprints for pretrained-weight port verification.

The reference's perceptual behavior rides entirely on torchvision's VGG-19
``IMAGENET1K_V1`` weights (``/root/reference/style_transfer/style_transfer.py:35``).
On an air-gapped machine (no checkpoint, no egress) the weight *port* —
``weights.convert_torchvision``'s OIHW->HWIO transpose and the torchvision
layer indexing — can only be shape-validated, which misses exactly the bugs
that matter (a transposed square kernel, an off-by-one layer offset). This
module fingerprints a parameter set two ways so a fixture generated ONCE on
any machine that has the real checkpoint verifies every other machine's port
end-to-end:

1. per-key SHA-256 checksums of the raw f32 weight bytes — the converted
   arrays are a pure transpose of the checkpoint's exact floats, so the
   digests are machine-independent and catch any re-serialization slip
   bit-exactly;
2. per-tap activation statistics (mean / std / L2 norm + pinned exact
   values) of the f32 trunk on a fixed deterministic 32x32 input — a wrong
   port moves every deep-tap statistic by orders of magnitude more than
   cross-platform float drift, and the statistics stay checkable even for
   numerically-identical weights from a different serialization.

Workflow: on a machine with the checkpoint, run
``python tools/make_weight_fingerprint.py -o tests/fixtures/vgg19_imagenet1k_v1_fingerprint.json``
and commit the JSON; ``tests/test_weight_fingerprint.py`` then validates the
resolved weights against it whenever real (non-random) weights are present.
"""

import hashlib
import json

import numpy as np

__all__ = [
    "DEFAULT_TAPS",
    "fingerprint_input",
    "weight_checksums",
    "activation_stats",
    "make_fingerprint",
    "check_fingerprint",
]

# The engine's tap set: style layers [1, 6, 11, 20, 29] + content [22]
# (ref :316-317). Fingerprinting exactly these catches any port error that
# could affect an actual stylization objective.
DEFAULT_TAPS = (1, 6, 11, 20, 22, 29)

# Tolerances for the activation comparison. f32 CPU trunks reproduce to
# ~1e-6 relative across XLA versions; a transpose/offset slip moves deep-tap
# statistics by 1e-1..1e1 relative, so there are ~3 orders of magnitude of
# slack on either side.
_STAT_RTOL = 1e-3
_SAMPLE_RTOL = 5e-3
_SAMPLE_ATOL = 1e-4
_N_SAMPLES = 7


def fingerprint_input():
    """Fixed deterministic (1, 32, 32, 3) f32 probe image in [0, 1]."""
    rng = np.random.RandomState(12345)
    return rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)


def weight_checksums(params):
    """{key: sha256 hex} of each parameter's raw f32 little-endian bytes."""
    out = {}
    for k in sorted(params):
        arr = np.ascontiguousarray(np.asarray(params[k], np.float32))
        if arr.dtype.byteorder == ">":  # big-endian host: normalize bytes
            arr = arr.astype("<f4")
        out[k] = hashlib.sha256(arr.tobytes()).hexdigest()
    return out


def activation_stats(params, taps=DEFAULT_TAPS):
    """Per-tap f32 activation statistics on the fixed probe input.

    Uses the plain (monolithic, max-pool, f32) trunk — the layout knobs the
    step uses for speed don't change values beyond float noise, and the
    fixture must be reproducible from the simplest configuration.
    """
    import jax

    from .vgg import extract_features

    feats = jax.device_get(
        extract_features(
            {k: np.asarray(v, np.float32) for k, v in params.items()},
            fingerprint_input(),
            tuple(sorted(set(taps))),
        )
    )
    stats = {}
    for tap in sorted(set(taps)):
        a = np.asarray(feats[tap], np.float64).ravel()
        idx = np.linspace(0, a.size - 1, _N_SAMPLES).astype(int)
        stats[str(tap)] = {
            "shape": list(np.asarray(feats[tap]).shape),
            "mean": float(a.mean()),
            "std": float(a.std()),
            "l2": float(np.linalg.norm(a)),
            "sample_idx": idx.tolist(),
            "samples": [float(a[i]) for i in idx],
        }
    return stats


def make_fingerprint(params, source="unknown", taps=DEFAULT_TAPS):
    """Full fingerprint dict (JSON-serializable)."""
    return {
        "format": "stt-vgg19-fingerprint-v1",
        "source": str(source),
        "taps": sorted(set(taps)),
        "checksums": weight_checksums(params),
        "activations": activation_stats(params, taps),
    }


def check_fingerprint(fingerprint, params, check_checksums=True):
    """Verify ``params`` against a fingerprint. Returns a list of mismatch
    descriptions — empty means the port is verified. Checksum mismatches are
    reported but activation statistics are always checked too (weights from
    a different serialization of the same numbers pass on statistics)."""
    problems = []
    if check_checksums:
        want = fingerprint.get("checksums", {})
        got = weight_checksums(params)
        if set(want) != set(got):
            problems.append(
                f"parameter key sets differ: fixture has {len(want)}, "
                f"resolved weights have {len(got)}"
            )
        for k in sorted(set(want) & set(got)):
            if want[k] != got[k]:
                problems.append(f"sha256 mismatch for {k}")
    got_stats = activation_stats(params, tuple(fingerprint["taps"]))
    for tap, want in fingerprint["activations"].items():
        got = got_stats[tap]
        if want.get("shape") and list(want["shape"]) != list(got["shape"]):
            problems.append(
                f"tap {tap}: activation shape {got['shape']} != fixture "
                f"{want['shape']} (layer indexing is off)"
            )
            continue
        for stat in ("mean", "std", "l2"):
            w, g = want[stat], got[stat]
            if abs(g - w) > _STAT_RTOL * max(abs(w), 1e-12):
                problems.append(
                    f"tap {tap}: {stat} {g:.6g} != fixture {w:.6g} "
                    f"(rel err {abs(g - w) / max(abs(w), 1e-12):.2e})"
                )
        for i, (w, g) in enumerate(zip(want["samples"], got["samples"])):
            if abs(g - w) > _SAMPLE_RTOL * abs(w) + _SAMPLE_ATOL:
                problems.append(
                    f"tap {tap}: sample {i} (flat index "
                    f"{want['sample_idx'][i]}) {g:.6g} != fixture {w:.6g}"
                )
    return problems


def save_fingerprint(fingerprint, path):
    with open(path, "w") as f:
        json.dump(fingerprint, f, indent=1, sort_keys=True)
        f.write("\n")


def load_fingerprint(path):
    with open(path) as f:
        fp = json.load(f)
    if fp.get("format") != "stt-vgg19-fingerprint-v1":
        raise ValueError(f"{path}: not a stt-vgg19-fingerprint-v1 file")
    return fp
