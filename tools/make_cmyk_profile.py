"""Generate a minimal CMYK ICC profile (tests/golden fixture).

The reference's ``--proof`` flag soft-proofs through a user-supplied CMYK
profile (``/root/reference/style_transfer/cli.py:41-43``); exercising that
path in CI needs a CMYK ICC profile, and none ships with PIL or this machine
(no network egress). This script hand-builds one from the ICC v2 spec: an
``mft2`` (lut16) A2B0 (CMYK -> Lab) and B2A0 (Lab -> CMYK) around the naive
ink model

    R = (1 - C)(1 - K),  G = (1 - M)(1 - K),  B = (1 - Y)(1 - K)

with sRGB gamma and a Bradford-adapted D50 Lab PCS — the standard
"uncalibrated" CMYK every image tool falls back to. Smooth and monotone, so
a modest CLUT grid interpolates it well; littlecms accepts it for
``ImageCms.profileToProfile`` both directions.

Usage: python tools/make_cmyk_profile.py [out.icc]
"""

import struct
import sys
from pathlib import Path

import numpy as np

# --------------------------------------------------------------- color math

# sRGB primaries, D65 white, Bradford-adapted to D50 (the ICC PCS
# illuminant) — the same matrix lcms uses for its built-in sRGB.
_RGB2XYZ_D50 = np.array(
    [
        [0.4360747, 0.3850649, 0.1430804],
        [0.2225045, 0.7168786, 0.0606169],
        [0.0139322, 0.0971045, 0.7141733],
    ]
)
_XYZ2RGB_D50 = np.linalg.inv(_RGB2XYZ_D50)
_D50 = np.array([0.9642, 1.0, 0.8249])


def _srgb_to_linear(v):
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(v):
    v = np.clip(v, 0.0, 1.0)
    return np.where(v <= 0.0031308, v * 12.92, 1.055 * v ** (1 / 2.4) - 0.055)


def _xyz_to_lab(xyz):
    t = xyz / _D50
    f = np.where(t > (6 / 29) ** 3, np.cbrt(t), t / (3 * (6 / 29) ** 2) + 4 / 29)
    L = 116 * f[..., 1] - 16
    a = 500 * (f[..., 0] - f[..., 1])
    b = 200 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def _lab_to_xyz(lab):
    fy = (lab[..., 0] + 16) / 116
    fx = fy + lab[..., 1] / 500
    fz = fy - lab[..., 2] / 200
    f = np.stack([fx, fy, fz], axis=-1)
    t = np.where(f > 6 / 29, f**3, 3 * (6 / 29) ** 2 * (f - 4 / 29))
    return t * _D50


def cmyk_to_lab(cmyk):
    """Naive ink model -> Lab(D50). cmyk in [0,1]."""
    c, m, y, k = (cmyk[..., i] for i in range(4))
    rgb = np.stack([(1 - c) * (1 - k), (1 - m) * (1 - k), (1 - y) * (1 - k)], -1)
    xyz = _srgb_to_linear(rgb) @ _RGB2XYZ_D50.T
    return _xyz_to_lab(xyz)


def lab_to_cmyk(lab):
    """Lab(D50) -> naive CMYK (max-K GCR: K = 1 - max(R,G,B))."""
    rgb = _linear_to_srgb(_lab_to_xyz(lab) @ _XYZ2RGB_D50.T)
    k = 1 - rgb.max(axis=-1)
    denom = np.maximum(1 - k, 1e-6)
    cmy = (1 - rgb - k[..., None]) / denom[..., None]
    return np.clip(np.concatenate([cmy, k[..., None]], axis=-1), 0.0, 1.0)


# ------------------------------------------------------------- ICC encoding

# ICC v2 16-bit Lab PCS encoding: L* 0..100 -> 0..0xFF00; a*/b*
# -128..127.996 -> 0..0xFFFF (the "legacy" encoding mft2 LUTs use).


def _lab_to_icc16(lab):
    L = np.clip(lab[..., 0] / 100.0, 0, 1) * 0xFF00
    ab = (np.clip(lab[..., 1:], -128, 127.9961) + 128.0) * 256.0
    return np.round(np.concatenate([L[..., None], ab], -1)).astype("<u2")


def _icc16_to_lab_axes(n):
    """Lab grid axis values the B2A0 CLUT is sampled at (identity input
    tables => uniform in the encoded domain)."""
    t = np.linspace(0.0, 1.0, n)
    L = t * (65535.0 / 0xFF00) * 100.0  # encoded max maps past L*=100
    ab = t * 65535.0 / 256.0 - 128.0
    return L, ab


def _s15f16(x):
    return struct.pack(">i", int(round(x * 65536.0)))


def _tag_desc(text: str) -> bytes:
    ascii_ = text.encode() + b"\0"
    return (
        b"desc" + b"\0" * 4
        + struct.pack(">I", len(ascii_)) + ascii_
        + struct.pack(">II", 0, 0)  # unicode lang + count
        + struct.pack(">Hb", 0, 0)  # scriptcode + count
        + b"\0" * 67
    )


def _tag_text(text: str) -> bytes:
    return b"text" + b"\0" * 4 + text.encode() + b"\0"


def _tag_xyz(xyz) -> bytes:
    return b"XYZ " + b"\0" * 4 + b"".join(_s15f16(v) for v in xyz)


def _tag_mft2(n_in, n_out, grid, clut_u16, table_entries=256) -> bytes:
    ident = np.round(np.linspace(0, 65535, table_entries)).astype("<u2")
    head = b"mft2" + b"\0" * 4 + struct.pack(">BBBB", n_in, n_out, grid, 0)
    matrix = b"".join(_s15f16(v) for v in np.eye(3).ravel())
    sizes = struct.pack(">HH", table_entries, table_entries)
    in_tables = ident.byteswap().tobytes() * n_in
    out_tables = ident.byteswap().tobytes() * n_out
    clut = clut_u16.astype(">u2").tobytes()
    return head + matrix + sizes + in_tables + clut + out_tables


def build_profile(a2b_grid: int = 9, b2a_grid: int = 17) -> bytes:
    # A2B0: CMYK -> Lab over a uniform CMYK grid.
    ax = np.linspace(0.0, 1.0, a2b_grid)
    grid = np.stack(np.meshgrid(ax, ax, ax, ax, indexing="ij"), -1)
    a2b_clut = _lab_to_icc16(cmyk_to_lab(grid)).reshape(-1, 3)

    # B2A0: Lab -> CMYK over the encoded-Lab grid.
    L, ab = _icc16_to_lab_axes(b2a_grid)
    lg, ag, bg = np.meshgrid(L, ab, ab, indexing="ij")
    lab = np.stack([lg, ag, bg], -1)
    b2a_clut = np.round(lab_to_cmyk(lab) * 65535.0).astype("<u2").reshape(-1, 4)

    tags = [
        (b"desc", _tag_desc("style_transfer_tpu naive CMYK (test fixture)")),
        (b"cprt", _tag_text("CC0 — generated by tools/make_cmyk_profile.py")),
        (b"wtpt", _tag_xyz(_D50)),
        (b"A2B0", _tag_mft2(4, 3, a2b_grid, a2b_clut)),
        (b"B2A0", _tag_mft2(3, 4, b2a_grid, b2a_clut)),
    ]

    tag_table = struct.pack(">I", len(tags))
    offset = 128 + 4 + 12 * len(tags)
    body = b""
    for sig, data in tags:
        tag_table += sig + struct.pack(">II", offset + len(body), len(data))
        body += data
        if len(body) % 4:
            body += b"\0" * (4 - len(body) % 4)

    size = 128 + 4 + 12 * len(tags) + len(body)
    header = (
        struct.pack(">I", size)
        + b"\0" * 4                       # CMM
        + struct.pack(">I", 0x02400000)   # version 2.4
        + b"prtr" + b"CMYK" + b"Lab "
        + struct.pack(">12H", 2026, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0)[:12]
        + b"acsp"
        + b"\0" * 4                       # platform
        + struct.pack(">I", 0)            # flags
        + b"\0" * 8                       # manufacturer + model
        + b"\0" * 8                       # attributes
        + struct.pack(">I", 0)            # intent: perceptual
        + b"".join(_s15f16(v) for v in _D50)
        + b"\0" * 4                       # creator
        + b"\0" * 44                      # reserved
    )
    assert len(header) == 128, len(header)
    return header + tag_table + body


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent.parent / "tests" / "golden"
        / "naive_cmyk.icc"
    )
    data = build_profile()
    out.write_bytes(data)
    print(f"wrote {out} ({len(data)} bytes)")

    # Self-check: littlecms must accept it both directions.
    import io

    from PIL import Image, ImageCms

    srgb = ImageCms.createProfile("sRGB")
    img = Image.new("RGB", (8, 8), (200, 30, 90))
    cmyk = ImageCms.profileToProfile(img, srgb, io.BytesIO(data), outputMode="CMYK")
    back = ImageCms.profileToProfile(cmyk, io.BytesIO(data), srgb, outputMode="RGB")
    print("round trip:", img.getpixel((0, 0)), "->", cmyk.getpixel((0, 0)),
          "->", back.getpixel((0, 0)))


if __name__ == "__main__":
    main()
