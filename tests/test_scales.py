"""Scale scheduler: exact-value parity with the reference pyramid
(SURVEY.md §4.1; reference style_transfer.py:256-276, cli.py:84-87)."""

from style_transfer_tpu.utils.scales import gen_scales, get_safe_scale, size_to_fit


def test_gen_scales_reference_values():
    assert gen_scales(128, 512) == [128, 181, 256, 362, 512]


def test_gen_scales_single():
    assert gen_scales(512, 512) == [512]
    assert gen_scales(64, 64) == [64]


def test_gen_scales_sqrt2_ratio():
    scales = gen_scales(32, 2048)
    for a, b in zip(scales, scales[1:]):
        assert 1.3 < b / a < 1.5


def test_size_to_fit_no_upscale():
    assert size_to_fit((100, 50), 200) == (100, 50)
    assert size_to_fit((100, 50), 200, scale_up=True) == (200, 100)


def test_size_to_fit_downscale():
    assert size_to_fit((400, 200), 200) == (200, 100)
    assert size_to_fit((200, 400), 200) == (100, 200)
    # rounding
    assert size_to_fit((300, 200), 100) == (100, 67)


def test_get_safe_scale():
    # square image: unchanged
    assert get_safe_scale(512, 512, 512) == 512
    # 2:1 aspect: sqrt(2) bigger max dim keeps pixel budget
    assert get_safe_scale(1024, 512, 512) == int(2 ** 0.5 * 512)
    assert get_safe_scale(512, 1024, 512) == int(2 ** 0.5 * 512)


def test_align_size():
    from style_transfer_tpu.utils.scales import align_size

    assert align_size((1448, 1086), 1) == (1448, 1086)
    assert align_size((1448, 1086), 16) == (1440, 1088)
    assert align_size((5, 5), 8) == (8, 8)
    assert align_size((100, 50), 4) == (100, 48)


def test_shard_align_size():
    from style_transfer_tpu.utils.scales import shard_align_size

    # 2x2 mesh at the print canvas: snaps both axes to multiples of 32
    # (within the 1.5% tolerance) — non-divisible dims cost a 100 MB/iter
    # all-gather (tools/sharded_report.py finding, PERF.md r3).
    w, h = shard_align_size((2172, 2896), 2, 2)
    assert w % 32 == 0 and h % 32 == 0
    assert abs(w - 2172) / 2172 <= 0.015 and abs(h - 2896) / 2896 <= 0.015
    # Small canvases keep their exact aspect (tolerance guard).
    assert shard_align_size((64, 48), 2, 1) == (64, 48)
    assert shard_align_size((67, 50), 4, 2) == (67, 50)
    # Already divisible: unchanged.
    assert shard_align_size((2176, 2880), 2, 2) == (2176, 2880)


def test_engine_canvas_alignment():
    import jax

    from style_transfer_tpu.engine import StyleTransfer
    from style_transfer_tpu.models.weights import random_params

    params = random_params(0)
    # Single chip: exact reference sizing by default.
    st1 = StyleTransfer(devices=1, weights=params)
    assert st1.canvas((1500, 2000), 2896) == (2172, 2896)
    # Mesh: default (align=None) snaps to shard-divisible dims...
    st4 = StyleTransfer(devices=jax.devices()[:4], weights=params)
    w, h = st4.canvas((1500, 2000), 2896)
    assert w % 32 == 0 and h % 32 == 0
    # ...explicit align=1 restores exact sizing, explicit align=8 rounds.
    assert st4.canvas((1500, 2000), 2896, align=1) == (2172, 2896)
    cw, ch = st4.canvas((1500, 2000), 2896, align=8)
    assert cw % 8 == 0 and ch % 8 == 0
