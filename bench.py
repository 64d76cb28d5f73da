"""Benchmark: Adam iterations/second at 512px (the reference's headline unit
of work — one fused VGG-19 forward+backward over the image, W2 style losses
with Newton-Schulz sqrtm, Adam update, clamp, EMA; see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "it/s", "vs_baseline": N}

Baseline derivation (documented, from the reference's published numbers):
the reference does 2896x2172 via its full pyramid in ~15 min on an RTX 3090
(README.md:69) and is linear in pixel count. Its pyramid to 2896 spends
~6.3e9 pixel-iterations (0.75 aspect x [1000*128^2 + 500 * sum(scale^2 for
scales 181..2896)]), i.e. ~7.0e6 pixel-iter/s. A square 512x512 workload is
262144 pixels => ~26.7 it/s equivalent on the 3090. vs_baseline is our
it/s divided by that.
"""

import json
import sys
import time

import numpy as np

BASELINE_512_ITS = 26.7  # RTX 3090 equivalent, derived above
SIZE = 512
CHUNK = 50
TIMED_CHUNKS = 4

# The remote-TPU (axon) attach can wedge at backend init for many minutes
# (PERF.md "session-attach stall"); an in-process jax.devices() cannot be
# cancelled once started. Probe in disposable subprocesses until one
# attaches (or the budget runs out), THEN init in-process — bounded,
# observable, and the wedge often clears between probes.
ATTACH_WAIT_S = 1500.0
PROBE_TIMEOUT_S = 240.0


def _wait_for_device():
    from __graft_entry__ import _probe_real_device_count

    deadline = time.monotonic() + ATTACH_WAIT_S
    attempt = 0
    while True:
        attempt += 1
        n = _probe_real_device_count(timeout=PROBE_TIMEOUT_S)
        if n > 0:
            if attempt > 1:
                print(f"bench: device attach recovered on probe {attempt}",
                      file=sys.stderr)
            return
        if time.monotonic() >= deadline:
            print(f"bench: no device after {attempt} probes; "
                  "proceeding (in-process init may block)", file=sys.stderr)
            return
        print(f"bench: device probe {attempt} failed; retrying",
              file=sys.stderr)
        time.sleep(30.0)


def main():
    _wait_for_device()
    import jax

    dev = jax.devices()[0]
    print(f"bench device: {dev} ({dev.platform})", file=sys.stderr)

    import __graft_entry__ as g
    from style_transfer_tpu.engine import auto_size_knobs
    from style_transfer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    is_tpu = dev.platform == "tpu"
    compute_dtype = "bfloat16" if is_tpu else None
    sqrtm_impl = "xla"  # engine 'auto' (r3: fwd-only XLA NS edges the kernel)
    # The engine's own auto-resolved per-size knobs (single source of truth;
    # hand-mirrored values here silently drift when a threshold changes).
    knobs = auto_size_knobs(SIZE, SIZE, is_tpu=is_tpu)
    runner, params, consts, state = g._build(
        n_h=SIZE, n_w=SIZE, compute_dtype=compute_dtype, sqrtm_impl=sqrtm_impl,
        **knobs,
    )

    # Warmup: compile + one chunk. Synchronize via device_get — on some
    # remote-attached backends block_until_ready returns early.
    state, losses = runner(params, consts, state, CHUNK)
    np.asarray(losses)

    t0 = time.perf_counter()
    for _ in range(TIMED_CHUNKS):
        state, losses = runner(params, consts, state, CHUNK)
    losses = np.asarray(losses)
    dt = time.perf_counter() - t0

    iters = TIMED_CHUNKS * CHUNK
    its_per_sec = iters / dt
    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), "non-finite loss in benchmark"
    print(
        f"{iters} iters in {dt:.3f}s -> {its_per_sec:.2f} it/s @ {SIZE}px "
        f"(final loss {losses[-1]:.4f})",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": f"adam_iters_per_sec_{SIZE}px",
        "value": round(its_per_sec, 2),
        "unit": "it/s",
        "vs_baseline": round(its_per_sec / BASELINE_512_ITS, 3),
    }))


if __name__ == "__main__":
    main()
