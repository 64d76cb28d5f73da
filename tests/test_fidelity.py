"""tools/fidelity.py: the one-command fidelity harness (VERDICT r2 missing #1).

Self-consistency smoke: generate outputs in one process, feed them back as
the 'reference' in a second identical run — deterministic XLA means the
metrics must come out perfect and the harness must report pass."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _run(args, timeout=540):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "fidelity.py"), "--cpu", *args],
        env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_fidelity_self_consistency(tmp_path):
    rng = np.random.RandomState(0)
    content = tmp_path / "c.png"
    style = tmp_path / "s.png"
    Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(content)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(style)

    common = [str(content), str(style), "--configs", "c2_pyramid512",
              "--end-scale", "64", "--min-scale", "64", "--iterations", "4"]
    ref_dir = tmp_path / "ref"
    first = _run(common + ["--out", str(ref_dir)])
    assert first.returncode == 0, first.stderr[-2000:]
    assert (ref_dir / "c2_pyramid512.png").is_file()

    second = _run(common + ["--out", str(tmp_path / "ours"),
                            "--reference", str(ref_dir)])
    assert second.returncode == 0, (second.stdout, second.stderr[-2000:])
    lines = [json.loads(l) for l in second.stdout.splitlines()
             if l.startswith("{")]
    rec = next(l for l in lines if l.get("config") == "c2_pyramid512")
    assert rec["pass"] is True
    assert rec["psnr"] > 50  # identical trajectories
    assert rec["perceptual"] < 1e-4
    assert rec["perceptual_metric"] == "vgg_distance_proxy"
    summary = next(l for l in lines if "summary" in l)["summary"]
    assert summary["compared"] == summary["passed"] == 1


@pytest.mark.slow
def test_fidelity_detects_mismatch(tmp_path):
    """A wrong reference output must fail the thresholds (exit 1)."""
    rng = np.random.RandomState(1)
    content = tmp_path / "c.png"
    style = tmp_path / "s.png"
    Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(content)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(style)

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
        ref_dir / "c2_pyramid512.png")

    proc = _run([str(content), str(style), "--configs", "c2_pyramid512",
                 "--end-scale", "64", "--min-scale", "64", "--iterations", "4",
                 "--out", str(tmp_path / "ours"), "--reference", str(ref_dir)])
    assert proc.returncode == 1
    lines = [json.loads(l) for l in proc.stdout.splitlines()
             if l.startswith("{")]
    rec = next(l for l in lines if l.get("config") == "c2_pyramid512")
    assert rec["pass"] is False
