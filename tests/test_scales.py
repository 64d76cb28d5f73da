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
