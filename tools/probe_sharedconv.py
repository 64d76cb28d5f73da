"""Probe: shared-patch pair conv (1.33x FLOPs) vs block-diagonal pair conv
(2x FLOPs) for the conv1_2 class (C=64), forward and forward+input-grad.

Correctness is checked against a plain pixel-space lax.conv on CPU-sized
shapes; timing runs at the 2896-canvas and 512-canvas early-trunk shapes.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv_ref(x, k):
    """Plain SAME 3x3 conv, pixel space (N,H,W,C)."""
    return lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                    dimension_numbers=DIMNUMS)


def pair_kernel_block(k):
    """(3,3,C,C) -> (3,3,2C,2C) block form (standard->standard pairing)."""
    z = jnp.zeros_like(k[:, 0])

    def rows(a2a, b2a, a2b, b2b):
        return jnp.concatenate(
            [jnp.concatenate([a2a, a2b], axis=-1),
             jnp.concatenate([b2a, b2b], axis=-1)], axis=-2)

    dj0 = rows(z, k[:, 0], z, z)
    dj1 = rows(k[:, 1], k[:, 2], k[:, 0], k[:, 1])
    dj2 = rows(z, z, k[:, 2], z)
    return jnp.stack([dj0, dj1, dj2], axis=1)


def conv_block(x2, k):
    """Block-diagonal pair conv: (N,H,P,2C) standard pairs -> same."""
    kp = pair_kernel_block(k).astype(x2.dtype)
    return lax.conv_general_dilated(x2, kp, (1, 1), "SAME",
                                    dimension_numbers=DIMNUMS)


def shared_kernel_fwd(k, c):
    """(3,3,C,C) -> (768-row, 2C) kcol for shifted->standard shared conv.
    Row blocks ordered (dy, po, e); col halves o. dx = 2*po + e - o."""
    kc = np.zeros((3 * 2 * 2 * c, 2 * c), np.float32)
    kn = np.asarray(k, np.float32)
    for dy in range(3):
        for po in range(2):
            for e in range(2):
                r0 = ((dy * 2 + po) * 2 + e) * c
                for o in range(2):
                    dx = 2 * po + e - o
                    if 0 <= dx <= 2:
                        kc[r0:r0 + c, o * c:(o + 1) * c] = kn[dy, dx]
    return jnp.asarray(kc)


def shared_kernel_bwd(k, c):
    """kcol for the input-grad: standard-pair cotangent -> shifted-pair
    cotangent. Row blocks (dy, po2, o); col halves e. Relation:
    o + dx = 2*(1-po2) + e, and dy flips (rows of g at offset 2-dy)."""
    kc = np.zeros((3 * 2 * 2 * c, 2 * c), np.float32)
    kn = np.asarray(k, np.float32)
    for dy in range(3):
        for po2 in range(2):
            for o in range(2):
                r0 = ((dy * 2 + po2) * 2 + o) * c
                for e in range(2):
                    dx = 2 * (1 - po2) + e - o
                    if 0 <= dx <= 2:
                        # g row offset dy corresponds to kernel row 2-dy
                        # (transposed stencil), kernel transposed ci<->co.
                        kc[r0:r0 + c, e * c:(e + 1) * c] = kn[2 - dy, dx].T
    return jnp.asarray(kc)


def conv_shared_fwd(xs, kcol, h, p_out):
    """xs: shifted pairs (N, H+2, P+? , 2C) ALREADY H zero-padded by 1.
    Patch = concat over (dy, po) of xs[:, dy:dy+h, po:po+p_out, :]."""
    cols = [xs[:, dy:dy + h, po:po + p_out, :]
            for dy in range(3) for po in range(2)]
    xcol = jnp.concatenate(cols, axis=-1)
    n = xs.shape[0]
    c2 = xs.shape[-1]
    y = jnp.dot(xcol.reshape(n * h * p_out, 6 * c2),
                kcol.astype(xs.dtype))
    return y.reshape(n, h, p_out, c2)


def to_shifted(x):
    """pixel (N,H,W,C) -> shifted pairs (N,H,W/2+1,2C): pair p = cols
    (2p-1, 2p), out-of-image cols zero. Host-side helper for the probe."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # cols -1..W
    # padded col index: pair p covers padded cols (2p, 2p+1) = orig (2p-1,2p)
    return xp.reshape(n, h, (w + 2) // 2, 2 * c)


def to_std_pairs(x):
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def from_std_pairs(x2):
    n, h, p, c2 = x2.shape
    return x2.reshape(n, h, 2 * p, c2 // 2)


def check_correctness():
    rng = np.random.RandomState(0)
    n, h, w, c = 1, 8, 12, 5  # c arbitrary for the math check
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)

    y_ref = conv_ref(x, k)

    xs = to_shifted(x)                      # (N,H,W/2+1,2C)
    xsp = jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (0, 0)))  # H zero pad
    kcol = shared_kernel_fwd(k, c)
    y2 = conv_shared_fwd(xsp, kcol, h, w // 2)
    y_shared = from_std_pairs(y2)
    err = float(jnp.max(jnp.abs(y_shared - y_ref)))
    print("fwd max err:", err)
    assert err < 1e-4, err

    # input grad: d/dx sum(y * g0)
    g0 = jnp.asarray(rng.randn(*y_ref.shape).astype(np.float32))

    def f_ref(xx):
        return jnp.sum(conv_ref(xx, k) * g0)

    gx_ref = jax.grad(f_ref)(x)

    # shared backward: standard-pair g -> shifted-pair cotangent via the
    # same patch-dot with kbwd; fold shifted cotangent back to pixel space
    # for comparison.
    g2 = to_std_pairs(g0)
    g2p = jnp.pad(g2, ((0, 0), (1, 1), (1, 1), (0, 0)))  # H and pair pad
    kbwd = shared_kernel_bwd(k, c)
    ct_shift = conv_shared_fwd(g2p, kbwd, h, w // 2 + 1)  # (N,H,W/2+1,2C)
    # shifted pair p covers cols (2p-1, 2p): fold back, dropping col -1 / W
    ct = np.zeros((n, h, w + 2, c), np.float32)
    cs = np.asarray(ct_shift, np.float32)
    for p in range(w // 2 + 1):
        ct[:, :, 2 * p, :] += cs[:, :, p, :c]
        ct[:, :, 2 * p + 1, :] += cs[:, :, p, c:]
    gx_shared = ct[:, :, 1:w + 1, :]
    err = float(np.max(np.abs(gx_shared - np.asarray(gx_ref))))
    print("bwd max err:", err)
    assert err < 1e-4, err
    print("correctness OK")


def bench(h, w, c=64, iters=30, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    p = w // 2
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05)
    x2 = jnp.asarray(rng.rand(1, h, p, 2 * c).astype(np.float32))

    kcol = shared_kernel_fwd(k, c)
    kbwd = shared_kernel_bwd(k, c)

    # forward+input-grad, block-diagonal conv path
    @jax.jit
    def run_block(x2_):
        x2_ = x2_.astype(dtype)

        def f(xx):
            y = conv_block(xx, k)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(f)(x2_)
        return l, jnp.sum(g.astype(jnp.float32))

    # forward+input-grad, shared-patch path (input arrives as shifted
    # pairs — in the real trunk conv1_1 would emit this layout directly)
    xs = jnp.asarray(rng.rand(1, h, p + 1, 2 * c).astype(np.float32))

    @jax.jit
    def run_shared(xs_):
        xs_ = xs_.astype(dtype)

        def f(xx):
            xp_ = jnp.pad(xx, ((0, 0), (1, 1), (0, 0), (0, 0)))
            y = conv_shared_fwd(xp_, kcol, h, p)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(f)(xs_)
        return l, jnp.sum(g.astype(jnp.float32))

    # shared-patch with MANUAL backward (the production form: forward dot
    # + explicit patch-dot input grad, no autodiff patch materialization)
    @jax.jit
    def run_shared_manual(xs_):
        xs_ = xs_.astype(dtype)
        xp_ = jnp.pad(xs_, ((0, 0), (1, 1), (0, 0), (0, 0)))
        y = conv_shared_fwd(xp_, kcol, h, p)
        g = 2.0 * y  # d/dy sum(y^2)
        g2p = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ct = conv_shared_fwd(g2p, kbwd, h, p + 1)
        return jnp.sum(y.astype(jnp.float32) ** 2), jnp.sum(
            ct.astype(jnp.float32))

    for name, fn, arg in (("block2x", run_block, x2),
                          ("shared-ad", run_shared, xs),
                          ("shared-manual", run_shared_manual, xs)):
        out = fn(arg)
        jax.tree.map(lambda a: np.asarray(a), out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(arg)
            jax.tree.map(lambda a: np.asarray(a), out)
            best = min(best, (time.perf_counter() - t0) / iters * 1000)
        print(f"  {name:14s} {best:8.3f} ms/iter  ({h}x{w} c={c})",
              flush=True)


if __name__ == "__main__":
    if "--bench" in sys.argv:
        print("== 512x512 early-trunk shape ==")
        bench(512, 512)
        print("== 2896-canvas early-trunk shape (transposed landscape) ==")
        bench(2896, 2172, iters=10)
    else:
        jax.config.update("jax_platforms", "cpu")
        check_correctness()
