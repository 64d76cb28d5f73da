"""Pretrained-weight port verification via activation fingerprints.

The real torchvision VGG-19 checkpoint is absent on air-gapped machines, so
weight-port correctness (OIHW->HWIO transpose, layer indexing —
models/weights.py convert_torchvision) is verified through a committed
fingerprint fixture instead (models/fingerprint.py):

* mechanism tests (always run, random weights) prove the fingerprint check
  CATCHES the two realistic port bugs shape validation misses — a transposed
  square kernel and a swapped/offset layer — and that the committed
  mechanism fixture reproduces bit-stably across processes;
* the real-weight test engages automatically on any machine where real
  weights resolve AND the real fixture has been committed (generate it once
  with tools/make_weight_fingerprint.py wherever the checkpoint exists).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from style_transfer_tpu.models import fingerprint as FP
from style_transfer_tpu.models.weights import random_params, resolve_params

FIXTURES = Path(__file__).parent / "fixtures"
RANDOM_FIXTURE = FIXTURES / "vgg19_random_he0_fingerprint.json"
REAL_FIXTURE = FIXTURES / "vgg19_imagenet1k_v1_fingerprint.json"


def test_fingerprint_passes_on_itself():
    params = random_params(0)
    fp = FP.make_fingerprint(params, source="random-he-0")
    assert FP.check_fingerprint(fp, params) == []


def test_fingerprint_detects_transpose_slip():
    """A transposed SQUARE kernel (the classic OIHW->HWIO port bug for
    C_in == C_out layers) passes shape validation but must fail here."""
    params = random_params(0)
    fp = FP.make_fingerprint(params)
    bad = dict(params)
    bad["conv2_kernel"] = np.transpose(params["conv2_kernel"], (0, 1, 3, 2))
    problems = FP.check_fingerprint(fp, bad)
    assert any("sha256" in p for p in problems)
    assert any("tap" in p for p in problems), problems
    # Checksums alone must not be load-bearing: statistics catch it too.
    assert FP.check_fingerprint(fp, bad, check_checksums=False), (
        "activation statistics failed to detect a transposed kernel"
    )


def test_fingerprint_detects_layer_offset():
    """Two same-shape deep convs swapped (an off-by-one in the layer table)
    changes no shapes but must fail the activation check."""
    params = random_params(0)
    fp = FP.make_fingerprint(params)
    bad = dict(params)
    bad["conv23_kernel"], bad["conv25_kernel"] = (
        params["conv25_kernel"], params["conv23_kernel"],
    )
    bad["conv23_bias"], bad["conv25_bias"] = (
        params["conv25_bias"], params["conv23_bias"],
    )
    problems = FP.check_fingerprint(fp, bad, check_checksums=False)
    assert problems, "activation statistics failed to detect swapped layers"


def test_committed_mechanism_fixture_reproduces():
    """The committed random-weight fixture must verify against freshly
    generated random weights — this is the cross-process / cross-version
    stability guarantee the real fixture will rely on.

    Regenerate (only after an intentional semantic change to the trunk):
      python tools/make_weight_fingerprint.py --allow-random \
          -o tests/fixtures/vgg19_random_he0_fingerprint.json
    """
    fp = FP.load_fingerprint(RANDOM_FIXTURE)
    problems = FP.check_fingerprint(fp, random_params(0))
    assert problems == [], problems


def test_real_weights_match_committed_fingerprint():
    """End-to-end port verification — runs wherever real weights resolve."""
    try:
        params, source = resolve_params(None, allow_random=False)
    except FileNotFoundError:
        pytest.skip("no real VGG-19 weights on this machine")
    if not REAL_FIXTURE.is_file():
        pytest.skip(
            "real weights resolved but no committed fixture; generate one "
            "with: python tools/make_weight_fingerprint.py -o "
            f"{REAL_FIXTURE}"
        )
    fp = FP.load_fingerprint(REAL_FIXTURE)
    problems = FP.check_fingerprint(fp, params)
    assert problems == [], f"weight port from {source} is WRONG: {problems}"


def test_fixture_is_valid_json_with_expected_schema():
    fp = json.loads(RANDOM_FIXTURE.read_text())
    assert fp["format"] == "stt-vgg19-fingerprint-v1"
    assert set(map(int, fp["activations"])) == set(fp["taps"]) == set(
        FP.DEFAULT_TAPS
    )
    assert len(fp["checksums"]) == 32  # 16 convs x (kernel, bias)
