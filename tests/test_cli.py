"""CLI (SURVEY.md §4.5): flag surface parity, defaults introspected from the
engine, end_scale+ math, full tiny run through main()."""

import json

import numpy as np
import pytest
from PIL import Image

from style_transfer_tpu.cli import build_parser, main
from style_transfer_tpu.engine import StyleTransfer


def test_defaults_come_from_stylize_signature():
    p = build_parser(StyleTransfer.stylize)
    args = p.parse_args(["c.png", "s.png"])
    d = StyleTransfer.stylize.__kwdefaults__
    assert args.content_weight == d["content_weight"] == 0.015
    assert args.tv_weight == d["tv_weight"] == 2.0
    assert args.iterations == d["iterations"] == 500
    assert args.initial_iterations == d["initial_iterations"] == 1000
    assert args.step_size == d["step_size"] == 0.02
    assert args.avg_decay == d["avg_decay"] == 0.99
    assert args.min_scale == d["min_scale"] == 128
    assert args.init == d["init"] == "content"
    assert args.optimizer == d["optimizer"] == "adam"
    assert args.style_scale_fac == d["style_scale_fac"] == 1.0


def test_reference_flag_surface_present():
    p = build_parser(StyleTransfer.stylize)
    flags = set()
    for action in p._actions:
        flags.update(action.option_strings)
    for f in ["--output", "--style-weights", "--devices", "--random-seed",
              "--content-weight", "--tv-weight", "--optimizer", "--min-scale",
              "--end-scale", "--iterations", "--initial-iterations",
              "--save-every", "--step-size", "--avg-decay", "--init",
              "--style-scale-fac", "--style-size", "--pooling", "--proof",
              "--web", "--host", "--port", "--browser"]:
        assert f in flags, f"missing reference flag {f}"


def test_end_scale_plus(tmp_path, monkeypatch, content_files):
    content, style = content_files
    out = tmp_path / "o.png"
    trace = tmp_path / "t.json"
    main([str(content), str(style), "-o", str(out), "--end-scale", "64+",
          "--min-scale", "64", "-i", "2", "-ii", "2",
          "--callback-chunk", "2", "--trace", str(trace)])
    t = json.loads(trace.read_text())
    # 128x96 content, 4:3 aspect: safe scale = sqrt(4/3)*64 = 73
    assert t["args"]["end_scale"] == int((128 / 96) ** 0.5 * 64)


@pytest.fixture()
def content_files(tmp_path):
    rng = np.random.RandomState(0)
    c = tmp_path / "content.png"
    s = tmp_path / "style.jpg"
    Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(c)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(s)
    return c, s


def test_main_end_to_end_proof(tmp_path, monkeypatch, content_files):
    """--proof CMYK soft-proofing runs the full src -> CMYK -> sRGB load
    path (ref cli.py:41-43) with the committed hand-built CMYK fixture.
    Runs chdir'd into tmp_path: without --trace the CLI writes ./trace.json
    (reference parity), which must not land in the repo."""
    monkeypatch.chdir(tmp_path)
    content, style = content_files
    out = tmp_path / "out.png"
    proof = __file__.rsplit("/", 1)[0] + "/golden/naive_cmyk.icc"
    main([str(content), str(style), "-o", str(out), "--proof", proof,
          "--min-scale", "64", "--end-scale", "64", "-i", "2", "-ii", "2",
          "--callback-chunk", "2"])
    assert out.is_file()
    assert Image.open(out).size == (64, 48)


def test_main_end_to_end_png(tmp_path, content_files):
    content, style = content_files
    out = tmp_path / "out.png"
    trace = tmp_path / "trace.json"
    main([str(content), str(style), "-o", str(out),
          "--min-scale", "64", "--end-scale", "64", "-i", "6", "-ii", "6",
          "--callback-chunk", "3", "--save-every", "3", "--trace", str(trace)])
    assert out.is_file()
    img = Image.open(out)
    assert img.size == (64, 48)
    t = json.loads(trace.read_text())
    assert len(t["iterates"]) == 6
    assert t["iterates"][0]["i"] == 1 and t["iterates"][-1]["i"] == 6
    assert np.isfinite([i["loss"] for i in t["iterates"]]).all()


def test_bands_2d_flag(tmp_path, content_files):
    """--bands RxC parses into a 2D slab grid request and the run completes
    (on CPU banding resolves to monolithic — the parse path is the target)."""
    content, style = content_files
    out = tmp_path / "o.png"
    main([str(content), str(style), "-o", str(out),
          "--min-scale", "64", "--end-scale", "64", "-i", "2", "-ii", "2",
          "--callback-chunk", "2", "--bands", "4x3",
          "--trace", str(tmp_path / "t.json")])
    assert out.is_file()


def test_main_16bit_tiff_output(tmp_path, content_files):
    content, style = content_files
    out = tmp_path / "out.tif"
    main([str(content), str(style), "-o", str(out),
          "--min-scale", "64", "--end-scale", "64", "-i", "2", "-ii", "2",
          "--callback-chunk", "2", "--trace", str(tmp_path / "t.json")])
    data = out.read_bytes()
    assert data[:4] == b"II*\x00"


def test_invalid_device_count(content_files, tmp_path, capsys):
    content, style = content_files
    with pytest.raises(SystemExit):
        main([str(content), str(style), "--devices", "4096"])


def test_devices_name_list(tmp_path, content_files):
    """Explicit device-name form (ref cli.py:161-162: --devices cuda:0
    cuda:1): name strings resolve through the engine's resolver; two names
    build a 2-device mesh."""
    content, style = content_files
    out = tmp_path / "o.png"
    main([str(content), str(style), "-o", str(out),
          "--min-scale", "64", "--end-scale", "64", "-i", "2", "-ii", "2",
          "--callback-chunk", "2", "--devices", "cpu:0", "cpu:1",
          "--trace", str(tmp_path / "t.json")])
    assert out.is_file()


def test_devices_bad_name(content_files):
    content, style = content_files
    with pytest.raises(SystemExit):
        main([str(content), str(style), "--devices", "notaplatform:0"])
