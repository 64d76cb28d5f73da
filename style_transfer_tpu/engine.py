"""StyleTransfer engine: multi-scale pyramid orchestration over the fused step.

API-parity facade for the reference engine
(``/root/reference/style_transfer/style_transfer.py:309-499``): same
constructor surface (device selection + pooling), same ``stylize`` keyword
surface and defaults, same ``get_image``/``get_image_tensor`` outputs, same
per-iteration ``STIterate`` callback contract.

Architecture differences (TPU-first, not a port):
* the per-iteration work is one compiled XLA program per scale
  (``style_transfer_tpu.step``), scanned in chunks — not eager op dispatch;
* images/activations are NHWC and can be spatially sharded over an N-chip
  mesh (the reference supports at most a 2-GPU layer split);
* state (image, Adam moments, EMA) is an explicit pytree, which makes the
  cross-scale Adam warm-start (bicubic/bilinear moment resize, ref :285-295)
  and checkpoint/resume trivial.
"""

import dataclasses
import math
import os
import threading
import time
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .models import weights as W
from .models.vgg import extract_features
from .ops import losses as L
from .ops.resize import resize2d
from .parallel.mesh import make_mesh, shard_image
from .step import (
    _LBFGS_MEMORY,
    AdamState,
    LBFGSState,
    LoopState,
    StepConfig,
    adam_init,
    make_adam_runner,
    make_lbfgs_runner,
    make_lbfgs_zoom_runner,
)
from .utils.checkpoint import AsyncCheckpointWriter, load_checkpoint
from .utils.ema import EMAState, ema_get, ema_init
from .utils.jaxcache import enable_persistent_cache
from .utils.scales import (
    align_size,
    gen_scales,
    shard_align_size,
    size_to_fit,
)
from .utils.trace import STIterate, peak_device_ram

__all__ = ["StyleTransfer", "auto_size_knobs"]

_DEBUG_TIMING = bool(os.environ.get("STT_DEBUG_TIMING"))

# Cumulative seconds per phase name, always collected (the contextmanager
# cost is one perf_counter pair — noise next to any phase worth timing).
# ``phase_totals`` lets callers (tools/bench_pyramid.py) attribute a run's
# non-iterating wall to engine phases vs untimed gaps (attach stalls,
# program-load drains between chunks).
_PHASE_TOTALS: dict = {}


def phase_totals(reset: bool = False) -> dict:
    """Snapshot {phase name: cumulative seconds}; optionally reset."""
    out = dict(_PHASE_TOTALS)
    if reset:
        _PHASE_TOTALS.clear()
    return out


class _phase_timer:
    """Accumulates phase wall time; prints it when STT_DEBUG_TIMING is set."""

    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        dur = time.perf_counter() - self.t0
        _PHASE_TOTALS[self.name] = _PHASE_TOTALS.get(self.name, 0.0) + dur
        if _DEBUG_TIMING:
            print(f"[timing] {self.name}: {dur:.2f}s"
                  f" @{time.time():.2f}", flush=True)


def _pil_to_nhwc(image: Image.Image, size=None) -> np.ndarray:
    """PIL RGB -> (1, H, W, 3) f32 in [0,1], optional bicubic resize."""
    if size is not None and image.size != tuple(size):
        image = image.resize(tuple(size), Image.BICUBIC)
    arr = np.asarray(image.convert("RGB"), dtype=np.float32) / 255.0
    return arr[None]


def _pil_to_device_nhwc(image: Image.Image, size=None):
    """PIL RGB -> DEVICE (1, H, W, 3) f32 in [0,1].

    Uploads the uint8 bytes and converts on device: 4x less traffic than
    staging f32 on the host first (the 2896x2172 content plane is 75 MB as
    f32 but 19 MB as uint8 — a real wall-time term per scale on a
    remote-attached backend), with bit-identical values (uint8 -> f32 is
    exact and the single f32 divide rounds the same on host and device).
    """
    if size is not None and image.size != tuple(size):
        image = image.resize(tuple(size), Image.BICUBIC)
    arr = np.asarray(image.convert("RGB"), dtype=np.uint8)[None]
    return jnp.asarray(arr).astype(jnp.float32) / np.float32(255.0)


def _resize_image(x, hw, method: str = "bicubic"):
    """Device-side resize of an NHWC image to (h, w), torch-interpolate
    semantics (ops/resize.py): the reference's scale crossings go through
    F.interpolate (ref :418, :285-295), and matching its kernel exactly is
    what keeps pyramid trajectories parity-testable."""
    return resize2d(x, hw, method)


def _scale_adam(opt: AdamState, hw, mesh=None) -> AdamState:
    """Warm-start Adam moments at a new resolution (ref :285-295):
    first moment resized bicubic, second moment bilinear then clamped >= 0.
    Moments are re-sharded like the image so the step program's input
    shardings stay uniform across scales."""
    mu = shard_image(_resize_image(opt.mu, hw, "bicubic"), mesh)
    nu = shard_image(jnp.maximum(_resize_image(opt.nu, hw, "bilinear"), 0.0), mesh)
    return AdamState(mu=mu, nu=nu, count=opt.count)


def _resolve_device(name: str):
    """'tpu' / 'tpu:1' / 'cpu' -> jax device."""
    platform, _, idx = name.partition(":")
    devs = jax.devices(platform)
    return devs[int(idx)] if idx else devs[0]


# --------------------------------------------------- auto knob resolution
#
# Module-level (deviceless) so bench.py and the tools measure exactly the
# configuration the engine ships: hand-mirrored knob defaults in the
# benchmark silently drift when a threshold here changes (VERDICT r3).
# All thresholds are v5e measurements; see the per-knob comments and
# PERF.md for the numbers behind them.

# Hybrid banding (ops/banded.py) engages where XLA's giant-tensor conv
# tiling dominates. Measured on v5e: full-trunk banding LOSES at
# 2896x2172 (80 px halo recompute, 317-380 ms vs 286 monolithic); the
# pool2-cut hybrid WINS from ~0.8 Mpx up. A round-2 band-count sweep
# found ~340k-px slabs optimal with a floor of 4 bands — 2896x2172:
# 191.6 ms @18 (vs 217 @12); 2048x1536: 112.3 @9; 1448x1086: 56.6 @5;
# 1024x768: 26.3 @4; 724x543 stays monolithic. GIANT-width canvases
# (the reference-aspect 2172x2896 landscape) want smaller ~235k slabs:
# 207.3 ms @27 rows (vs 233.8 @18); paired/column variants measured
# within noise of it (209-215) — see PERF.md "landscape giant scale".
# BELOW the 700k threshold a light 2-band split still wins ~4% down to
# ~150k px (543x724: 10.19 -> 9.81; 384x512: 6.11 -> 5.88; 512x512:
# 7.43 -> 7.21) and loses below it (272x362: 3.78 -> 4.04); the >=4
# floor above 700k re-confirmed under paired (768x1024: 18.44 @4 vs
# 18.85 @3, 19.48 @2).
_BAND_MIN_PX = 700_000
_BAND_LIGHT_MIN_PX = 150_000  # 2-band window below _BAND_MIN_PX
_BAND_SLAB_PX = 340_000
_BAND_SLAB_PX_WIDE = 235_000  # banded-axis width > 2400
_BAND_WIDE_W = 2400
_GRID_SLAB_PX = 175_000  # per-slab target when the 2D grid is active
# NOTE: the fused Pallas early-trunk kernel (r2's ops/pallas/trunk.py)
# was REMOVED in r3 under the dead-by-default standard: it never beat
# the banded-XLA step end-to-end, and a remote-toolchain update then
# regressed its forward ~4x and broke its backward compile outright
# (PERF.md "Pallas early trunk postmortem").


def auto_size_knobs(
    h: int,
    w: int,
    *,
    is_tpu: bool,
    meshed: bool = False,
    mesh_shape: Optional[Tuple[int, int]] = None,
    n_bands: Optional[int] = None,
    n_bands_w: Optional[int] = None,
    paired_early: Optional[bool] = None,
    remat: Optional[bool] = None,
    band_scan: Optional[bool] = None,
) -> dict:
    """All scale-dependent StepConfig knobs for an (h, w) INTERNAL canvas.

    Single source of truth for the engine's per-scale cfg construction, the
    AOT prefetch of upcoming scales, and bench.py/tools (the prefetch cache
    is keyed on the full cfg, so drift between call sites silently turns
    every prefetch into a cache miss; drift in bench.py silently benchmarks
    a non-default config). ``None`` knob arguments mean auto-resolve;
    explicit values are honored subject to hard constraints (even width,
    single mesh for pairing).

    With a mesh (``meshed`` + a ``mesh_shape`` of (rows, cols) whose blocks
    divide (h, w) on the 16-px band quantum), the banding/paired knobs are
    resolved for the PER-SHARD block size and returned with
    ``shard_bands=True`` — the step then runs the early trunk shard-locally
    under shard_map with exactly the single-chip configuration each shard's
    size would get (parallel/shard_early.py; VERDICT r3 #1). Non-divisible
    canvases (small pyramid scales) fall back to the plain GSPMD step.
    """
    if meshed and mesh_shape is not None:
        rows, cols = mesh_shape
        if (rows * cols > 1 and h % (16 * rows) == 0
                and w % (16 * cols) == 0):
            local = auto_size_knobs(
                h // rows, w // cols, is_tpu=is_tpu, meshed=False,
                n_bands=n_bands, n_bands_w=n_bands_w,
                paired_early=paired_early, remat=remat,
            )
            if local["n_bands"] >= 2:
                # The shard-local early trunk runs banded_stats in window
                # mode inside shard_map, which the scan path doesn't serve.
                return dict(local, shard_bands=True, band_scan=False)
        # Shard blocks below the banding threshold (or non-divisible dims):
        # plain GSPMD already splits the tensors small; fall through.

    def maxpool_impl() -> str:
        # Canvas-level decision: 'first' (W-pair/H-pair first_max
        # decomposition, no select_and_scatter) wins at EVERY canvas on
        # v5e. r4 measured it at every scale >= 724px (2896x2172 158.5 vs
        # 163.0 ms/iter, 2048 71.0 vs 74.7, 1448 34.9 vs 36.0, 1024 16.6
        # vs 17.3, 724 10.0 vs 10.3) and kept 'paired' for the 512 class;
        # the r5 re-sweep under the since-changed co-knobs (im2col_grad
        # 'conv', conv4_1 im2col) flipped the small canvases too —
        # 512x512: first 5.91 vs paired 6.21; 362x272: 2.77 vs 2.84;
        # 256x192: 1.59 vs 1.69 ms/iter. Per-pool 'auto' rules based on
        # each pool's own input shape were tried twice and lose above
        # 512px (deep pools at 1024-2896 share shapes with early pools at
        # 512 but sit in a different step regime); pool1 under the paired
        # trunk keeps its halved reduce_window regardless (r5 'first+p1'
        # A/B: slower everywhere — see vgg._pool_max_from_paired).
        return "first" if is_tpu else "xla"

    def im2col_layers() -> tuple:
        # conv3_1 / conv5_1 (torchvision 10 / 28) as explicit im2col
        # matmuls: removes the conv-emitter T(2,128) layout complex on the
        # first conv after a pooling cut (512px: 105.8 -> 111 it/s;
        # 2896x2172 banded: 245 -> 236 ms/iter; 1448px: 74.8 -> 72.5).
        # conv4_1 (19) joins below 4 Mpx — the emitter gives it the same
        # pathological layout at e.g. 2048x1536 (26 TF/s, +4.7 ms/iter r2),
        # and im2col also wins at 1448 (-1.5) and 512 (-0.3) but loses at
        # 2896 (+2.9). TPU-only (XLA's CPU conv is fine).
        if not is_tpu:
            return ()
        return (10, 19, 28) if h * w <= 4_000_000 else (10, 28)

    def grid_cols() -> int:
        # Auto column count of the 2D slab grid (0 = row bands only). A
        # second (column) banding level engages wherever narrower slabs
        # keep winning: the column split pulls every slab into the
        # 128-lane-paired conv1_2/pool window. Measured v5e (r3, paired):
        # 2896x2172 18x2 176.1 vs 192.1 best single-axis; 2048x1536 9x2
        # 77.8 vs 85.0; 1448x1086 5x2 38.3 vs 40.8; 1024x768 4x2 LOSES
        # (18.8 vs 18.0) — floor at w > 1000. Needs even W (paired
        # constraint) and print-size row banding.
        if not is_tpu or meshed:
            return 0
        if n_bands_w is not None:
            return int(n_bands_w)
        if n_bands is not None:
            # An explicit row-band count ('--bands 27' or '--bands off')
            # keeps the user's configuration: silently adding a column
            # split would change the slab economics the user pinned (and
            # with n_bands=0 there is no row banding for a grid to ride).
            return 0
        if h * w >= _BAND_MIN_PX and w > 1000 and w % 2 == 0:
            return max(2, -(-w // 1500))
        return 0

    def bands() -> int:
        if not is_tpu or meshed:
            return 0  # sharding already splits tensors below the threshold
        if n_bands is not None:
            return int(n_bands)
        if h * w < _BAND_LIGHT_MIN_PX:
            return 0
        if h * w < _BAND_MIN_PX:
            return 2
        cols = grid_cols()
        if cols >= 2:
            # Grid slabs: ~175k-px target counting the column split
            # (r3 sweep at 2896x2172: 18x2 176.1 / 19x2 178.8 / 14x2 180.1
            # / 22x2 183.0).
            return min(max(4, round(h * w / (cols * _GRID_SLAB_PX))),
                       h // 16)
        slab = (_BAND_SLAB_PX_WIDE if w > _BAND_WIDE_W else _BAND_SLAB_PX)
        return min(max(4, round(h * w / slab)), h // 16)

    def bands_w() -> int:
        cols = grid_cols()
        # In the auto path grid_cols already requires h*w >= _BAND_MIN_PX,
        # where bands() always returns >= 4 — row banding is active
        # whenever cols >= 2. An explicit n_bands_w is honored as given.
        return cols if cols >= 2 else 0

    def paired() -> bool:
        # Width-paired conv1_1..relu1_2 (vgg paired_early): even width and
        # single-mesh only. Measured v5e (PERF.md "paired early trunk"):
        # wins at every scale up to W=2048 (512px -16%, 1024x768 -26%,
        # 1448x1086 -19%, 2048x1536 -21%). At giant widths FULL-width
        # paired slabs are a wash (+1-2%), but a 2D slab grid halves the
        # slab width into the paired-eligible window, where pairing wins
        # big (2896x2172 @18x2: paired 176.1 vs unpaired 235.0 ms/iter,
        # r3) — so pairing engages whenever W fits OR the grid splits W.
        if paired_early is not None:
            # Explicit opt-in still honors the hard constraints (even
            # width, single mesh).
            return bool(paired_early) and w % 2 == 0 and not meshed
        return (
            is_tpu
            and not meshed
            and w % 2 == 0
            and (w <= 2048 or bands_w() >= 2)
        )

    def auto_remat() -> bool:
        if remat is not None:
            return bool(remat)
        # Remat is a memory tool, not a speed tool here: measured on v5e,
        # storing activations beats recompute at every size that fits HBM
        # (512px: -27%, 2048px: -13%, 2896px: -27% vs remat), except one
        # odd-dimension-cascade anomaly (1448x1086; see PERF.md). bf16
        # tapped-trunk activations are ~0.5 KB/pixel, so a 16 GB chip holds
        # ~14 Mpx comfortably; beyond that, rematerialize.
        return h * w > 14_000_000

    def scan_bands() -> bool:
        # Interior row bands under lax.scan (ops/banded.banded_stats_scan):
        # ~2x smaller compiled programs (2896x2172 @18x2: 63 -> 28-30 MB)
        # but +21-24% execution time (155.8 -> 188-193 ms/iter, r5 A/B:
        # the backward scan carries the full image cotangent and stacks
        # per-band residuals) — the exec loss cancels the program-load
        # saving on the remote-attached backend, so it stays OPT-IN (worth
        # it only when cold-compile/load time dominates, e.g. one-shot
        # giant runs on a slow tunnel).
        return bool(band_scan) if band_scan is not None else False

    return dict(
        maxpool_impl=maxpool_impl(),
        im2col_layers=im2col_layers(),
        # Backward of the im2col deep convs: 'conv' = ONE conv-emitter
        # call (conv-transpose identity), 'patch' = plain autodiff
        # (patch-matrix cotangent + split/pad-adds). r4 measured 'conv'
        # winning big under the then-shipping paired pools (512x512 8.16
        # -> 7.20 ms/iter); the r5 re-sweep under 'first' pools flips the
        # small-canvas sign — 512x512 patch 5.86-5.88 vs conv 5.91-5.95
        # over 3 alternating A/B rounds — while the giant canvas still
        # wants 'conv' (2896x2172: 155.8 vs 158.2 patch). Threshold at
        # the re-measured 512 class; >= 724px keeps the r4 choice.
        im2col_grad=("patch" if not is_tpu or h * w <= 320_000 else "conv"),
        n_bands=bands(),
        n_bands_w=bands_w(),
        paired_early=paired(),
        remat=auto_remat(),
        shard_bands=False,
        band_scan=scan_bands(),
    )


class _AOTPrefetcher:
    """Ahead-of-time compilation of upcoming scales' step programs.

    Per-scale shapes mean per-scale XLA programs; tracing + (cached) program
    load costs seconds to tens of seconds each (PERF.md). The engine submits
    EVERY upcoming scale at the start of the run (nearest first) and a small
    worker pool lowers/compiles them while the device crunches the current
    scale. One-scale-ahead prefetch was not enough: a small scale can finish
    all its iterations in less time than the next program's load (measured:
    ~55 s stalls entering 512x384 and 1024x768 on the warm pyramid).
    Two workers bound host-side tracing (GIL) contention; submission order
    keeps the nearest scale first in the queue.

    ``pause()``/``resume()`` gate job STARTS (in-flight jobs always finish):
    the engine pauses the pool while a scale's chunk loop is dispatching.
    Un-gated, the workers' program loads share the remote-attach tunnel with
    chunk dispatch and their tracing holds the GIL against the dispatch
    thread — the r4 warm pyramid ran every mid scale 1.5-14x above its pure
    step time (512x384: 62.5 ms/iter vs ~4.5 pure = ~29 s wasted on one
    scale; VERDICT r4 #1). Paused loads drain in the inter-scale windows
    (target captures, warm-start resizes) where the dispatch path is cold,
    and ``get()`` re-opens the gate while it blocks — a caller waiting on a
    program means the device is about to idle, so contention is moot.
    """

    # Workers are plain DAEMON threads (not a ThreadPoolExecutor): the
    # stdlib pool's non-daemon workers are joined at interpreter exit, so a
    # Ctrl-C during scale 1 of a cold run would hang for the 1-10 min
    # remote compiles of every queued upcoming scale. Daemon threads let
    # the process exit immediately; abandoned compiles are harmless.

    class _Job:
        __slots__ = ("fn", "done", "result")

        def __init__(self, fn):
            self.fn = fn
            self.done = threading.Event()
            self.result = None

    def __init__(self, workers: int = 2, sync: Optional[bool] = None):
        import queue

        self._q = queue.Queue()
        self._jobs = {}
        self._lock = threading.Lock()
        self._gate = threading.Event()
        self._gate.set()
        self._pause_depth = 0
        # STT_PREFETCH_SYNC: no worker threads; submit() records the job and
        # get() runs it inline (memoized). Same compiles, same results, zero
        # background compilation — the test suite sets this because an XLA
        # CPU compile on a leftover daemon worker racing a later test's own
        # compiles/torch work segfaulted the interpreter once in ~5 full
        # runs (r5; fatal stack: backend_compile on an stt-aot thread).
        self._sync = (bool(os.environ.get("STT_PREFETCH_SYNC"))
                      if sync is None else sync)
        if self._sync:
            return
        for i in range(workers):
            threading.Thread(
                target=self._worker, name=f"stt-aot-{i}", daemon=True
            ).start()

    def _worker(self):
        while True:
            job = self._q.get()
            self._gate.wait()  # paused: hold the (nearest) job until resume
            try:
                job.result = job.fn()
            except Exception:
                job.result = None  # caller falls back to the JIT path
            job.done.set()

    def pause(self):
        """Stop starting new compile/load jobs (in-flight ones finish).
        Nested: every pause() needs a matching resume()."""
        with self._lock:
            self._pause_depth += 1
            self._gate.clear()

    def resume(self):
        with self._lock:
            self._pause_depth = max(0, self._pause_depth - 1)
            if self._pause_depth == 0:
                self._gate.set()

    def submit(self, key, make_fn):
        with self._lock:
            if key in self._jobs:
                return
            job = self._Job(make_fn)
            self._jobs[key] = job
        if not self._sync:
            self._q.put(job)

    @staticmethod
    def _describe_key(key):
        """Short human-readable form of a prefetch key for wait logging.
        Keys are ('exe', capture_key, (h, w)) or (cfg, h, w, chunk, opt)."""
        try:
            if key and key[0] == "exe":
                kind = key[1][0] if isinstance(key[1], tuple) else "capture"
                h, w = key[2]
                return f"{kind} program @ {h}x{w}"
            _, h, w, n, opt = key
            return f"{opt} step program @ {h}x{w} (chunk {n})"
        except Exception:
            return repr(key)[:80]

    def get(self, key):
        """Blocks for an in-flight job (waiting beats recompiling); returns
        None when nothing was submitted or the job failed (the caller then
        falls back to the JIT path). A long block logs what it is waiting
        on — remote compiles take 1-10 min here, and a silent stall is
        indistinguishable from a wedge in the console output."""
        with self._lock:
            job = self._jobs.get(key)
        if job is None:
            return None
        if self._sync:
            if not job.done.is_set():
                try:
                    job.result = job.fn()
                except Exception:
                    job.result = None
                job.done.set()
            return job.result
        if not job.done.is_set():
            # The caller is about to idle on this program: open the gate so
            # paused workers can run it (the queue is nearest-first, so the
            # held jobs are exactly the ones the caller needs next), then
            # restore the pause once this job lands.
            self._gate.set()
            try:
                if not job.done.wait(10.0):
                    desc = self._describe_key(key)
                    print(f"Waiting on in-flight compile of {desc} "
                          "(remote compiles can take minutes)...", flush=True)
                    t0 = time.perf_counter()
                    job.done.wait()
                    print(f"Compile of {desc} finished after a further "
                          f"{time.perf_counter() - t0:.0f}s.", flush=True)
            finally:
                with self._lock:
                    if self._pause_depth > 0:
                        self._gate.clear()
        return job.result


class StyleTransfer:
    """Optimization-based neural style transfer on TPU.

    Args:
      devices: None (all visible devices), an int (first N devices), or an
        explicit list of JAX devices. With more than one device the image is
        spatially sharded over a 2D mesh.
      pooling: 'max' | 'average' | 'l2'.
      weights: path to VGG-19 weights (.npz native or torchvision .pth), or a
        params dict; None resolves via the search order in models/weights.py.
      compute_dtype: trunk dtype; None picks bf16 on TPU, f32 elsewhere.
      style_loss: 'w2' (default, reference behavior) or 'gram'.
      remat: None = auto (rematerialize the trunk only above ~14 Mpx, where
        activations would not fit HBM; remat is slower otherwise), or bool.
      n_bands: banded halo-slab trunk (ops/banded.py); None = auto (engages
        at print sizes on TPU), 0 = monolithic, or an explicit band count.
      n_bands_w: optional second banding level along the other spatial axis
        (2D slab grid; None = auto, currently off — single-axis row bands
        measured best on v5e standard aspects).
      paired_early: run conv1_1..relu1_2 in the width-paired (N, H, W/2, 2C)
        layout (full 128-lane tiles for the C=64 block, halved pool1
        select_and_scatter; vgg.extract_features ``paired_early``). None =
        auto (TPU, even width, single mesh).
      callback_chunk: iterations fused per device round-trip. Telemetry is
        emitted per iteration, but wall-times within a chunk are interpolated.
    """

    def __init__(
        self,
        devices=None,
        pooling: str = "max",
        *,
        weights=None,
        compute_dtype: Optional[str] = None,
        style_loss: str = "w2",
        content_loss: str = "mse",
        sqrtm_impl: str = "auto",
        w2_grad: str = "trace",
        remat: Optional[bool] = None,
        n_bands: Optional[int] = None,
        n_bands_w: Optional[int] = None,
        paired_early: Optional[bool] = None,
        band_scan: Optional[bool] = None,
        transpose_wide: Optional[bool] = None,
        callback_chunk: int = 50,
    ):
        if devices is None:
            self.devices = list(jax.devices())
        elif isinstance(devices, int):
            self.devices = list(jax.devices())[:devices]
        else:
            # Accept device objects or reference-style name strings
            # ('tpu', 'tpu:1', 'cpu' — the analog of the reference's
            # ['cuda:0', 'cuda:1'] constructor surface).
            self.devices = [
                _resolve_device(d) if isinstance(d, str) else d for d in devices
            ]
        if not self.devices:
            raise ValueError("no devices")
        enable_persistent_cache()
        self.mesh = make_mesh(self.devices) if len(self.devices) > 1 else None

        if compute_dtype in (None, "auto"):
            compute_dtype = (
                "bfloat16" if self.devices[0].platform == "tpu" else None
            )
        elif compute_dtype in ("float32", "f32"):
            compute_dtype = None  # f32 trunk
        self.compute_dtype = compute_dtype
        self.pooling = pooling
        self.style_loss = style_loss
        self.content_loss = content_loss
        if sqrtm_impl == "auto":
            # The VMEM-resident Pallas NS chains pay for themselves exactly
            # where a backward matmul chain exists: with the r3+ 'trace'
            # analytic VJP (no backward chain) forward-only XLA fori_loop NS
            # at native HIGH edges the kernel's emulated bf16x3 (512px A/B:
            # xla 6.19-6.27 ms/iter vs pallas 6.26-6.36), but in the
            # reference-flavor 'lyap' mode the fused kernel still wins
            # (r4 512px A/B: pallas 7.317 vs xla 7.536 ms/iter) — so 'auto'
            # engages the kernel for --w2-grad lyap on TPU and stays XLA
            # for the default trace mode.
            sqrtm_impl = ("pallas"
                          if w2_grad == "lyap"
                          and self.devices[0].platform == "tpu" else "xla")
        self.sqrtm_impl = sqrtm_impl
        # 'trace': analytic A^{-1/2}/2 VJP for the W2 sqrt term (exact, no
        # Lyapunov backward chain — see ops/sqrtm.trace_sqrtm_ns); 'lyap':
        # the reference's iterative Lyapunov backward (trajectory-exact
        # against torch oracles; ~0.5% loss-path deviation between the two
        # over 50 iters, same converged output).
        self.w2_grad = w2_grad
        self._is_tpu = self.devices[0].platform == "tpu"
        self.remat = remat
        self.n_bands = n_bands
        self.n_bands_w = n_bands_w
        self.paired_early = paired_early
        self.band_scan = band_scan
        # Landscape canvases run internally TRANSPOSED (portrait): a 3x3
        # conv of the transposed image with the spatially-transposed kernel
        # is exactly the transposed convolution, and every other op in the
        # objective (pool, replicate pad, TV stencil, moments, Adam/EMA,
        # clamp) is orientation-equivariant — so the trajectory is the exact
        # transpose of the landscape one (float reassociation only), but
        # XLA's conv emitters run the tall orientation measurably faster
        # (2172x2896 @27 bands: 205.7 ms/iter; 2896x2172 @18: 192.1 — v5e,
        # PERF.md r3). None = auto (TPU, single mesh, W > H); the transpose
        # happens once per scale boundary / image fetch, never per step.
        self.transpose_wide = transpose_wide
        self._flip = False
        self._params_t = None
        self.callback_chunk = int(callback_chunk)

        # Default layer configuration (Gatys et al. 2015 taps, reference
        # weighting, ref :315-322).
        self.content_layers = [22]
        self.style_layers = [1, 6, 11, 20, 29]
        sw = [256, 64, 16, 4, 1]
        total = sum(abs(w) for w in sw)
        self.style_layer_weights = [w / total for w in sw]

        if isinstance(weights, dict):
            self.params, self.weights_source = (
                {k: jnp.asarray(v) for k, v in weights.items()},
                "caller-provided",
            )
        else:
            params, src = W.resolve_params(weights)
            self.params = {k: jnp.asarray(v) for k, v in params.items()}
            self.weights_source = src

        self.image = None  # NHWC f32 device array (current iterate)
        self.average = None  # EMAState
        self._runner_cache = {}
        self._fn_cache = {}
        self._prefetcher = _AOTPrefetcher()
        self._rng = np.random.RandomState(0)
        self._img_cache_key = None  # EMAState the cached host tensor is of
        self._img_cache = None

    # ------------------------------------------------------------------ API

    def seed(self, seed: int):
        self._rng = np.random.RandomState(seed)

    def _t_img(self, x):
        """Internal <-> external orientation of an NHWC tensor (see
        ``transpose_wide``; an involution, so it goes both ways)."""
        return jnp.swapaxes(x, 1, 2) if self._flip else x

    def _step_params(self):
        """Params as the canvas-side programs consume them: spatially
        transposed kernels when the run is internally transposed (built
        once per stylize; conv(x^T, k^T) == conv(x, k)^T exactly)."""
        if not self._flip:
            return self.params
        if self._params_t is None:
            self._params_t = {
                k: (jnp.swapaxes(v, 0, 1) if k.endswith("_kernel") else v)
                for k, v in self.params.items()
            }
        return self._params_t

    def get_image_tensor(self):
        """Current averaged iterate as (H, W, 3) f32 ndarray in [0, 1].

        Memoized on the EMA state object: the state only changes once per
        fused chunk, but callbacks run per iteration — on a remote-attached
        backend an uncached 75 MB device_get per iterate (e.g. the web
        preview feed) costs seconds each."""
        if self.average is None:
            return None
        if self._img_cache_key is not self.average:
            img = np.asarray(jax.device_get(ema_get(self.average)))[0]
            if self._flip:
                img = img.transpose(1, 0, 2)
            self._img_cache = np.clip(img, 0.0, 1.0)
            self._img_cache_key = self.average
        return self._img_cache

    def get_image_device(self):
        """Device-side snapshot of the averaged iterate, (1, H, W, 3) f32 in
        [0, 1], in the EXTERNAL orientation. A FRESH buffer (never donated),
        so another thread may fetch it while the optimization keeps running —
        the async mid-run saver uses this to keep the device->host transfer
        off the iteration loop."""
        if self.average is None:
            return None
        return self._t_img(jnp.clip(ema_get(self.average), 0.0, 1.0))

    def get_image(self, image_type: str = "pil"):
        if self.average is None:
            return None
        return tensor_to_image(self.get_image_tensor(), image_type)

    def loss_terms(self):
        """Per-term weighted losses of the current iterate (diagnostic;
        reference SumLoss(verbose=True) parity). Returns {name: float}."""
        if self.image is None or getattr(self, "_last_cfg", None) is None:
            return None
        from .step import build_loss_terms_fn

        key = ("terms", self._last_cfg)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                build_loss_terms_fn(self._last_cfg, self.mesh)
            )
        out = self._fn_cache[key](
            self.image, self._step_params(), self._last_consts
        )
        return {k: float(v) for k, v in jax.device_get(out).items()}

    # ------------------------------------------------------------ internals

    def _size_knobs(self, h, w) -> dict:
        """All scale-dependent StepConfig knobs for an (h, w) canvas — a
        view of the module-level :func:`auto_size_knobs` (the single source
        of truth, shared with bench.py/tools) bound to this engine's
        platform/mesh/explicit-knob state."""
        from .ops.banded import DEFAULT_CUT

        # The shard-local early trunk (shard_bands) window mode cannot
        # serve early content taps; a content layer at or below the cut
        # keeps the plain GSPMD step (default content tap 22 is deep).
        mesh_shape = None
        if self.mesh is not None and all(
                l > DEFAULT_CUT for l in self.content_layers):
            mesh_shape = (self.mesh.shape.get("sph", 1),
                          self.mesh.shape.get("spw", 1))
        return auto_size_knobs(
            h, w,
            is_tpu=self._is_tpu,
            meshed=self.mesh is not None,
            mesh_shape=mesh_shape,
            n_bands=self.n_bands,
            n_bands_w=self.n_bands_w,
            paired_early=self.paired_early,
            remat=self.remat,
            band_scan=self.band_scan,
        )

    def _n_bands(self, h, w) -> int:
        return self._size_knobs(h, w)["n_bands"]

    def canvas(self, content_size, scale, align=None):
        """(w, h) optimization canvas for ``scale``. Explicit ``align``
        rounds to that multiple (ref-exact sizing = 1); the default (None)
        keeps exact sizes single-chip and snaps to shard-divisible dims
        under a mesh (utils/scales.shard_align_size — non-divisible dims
        cost a 100 MB/iter all-gather at print sizes)."""
        cw, ch = size_to_fit(content_size, scale, scale_up=True)
        if align is not None and align > 1:
            return align_size((cw, ch), align)
        if align is None and self.mesh is not None:
            rows = self.mesh.shape.get("sph", 1)
            cols = self.mesh.shape.get("spw", 1)
            return shard_align_size((cw, ch), rows, cols)
        return (cw, ch)

    def _capture_knobs(self, h, w):
        """Trunk knobs for the f32 target-capture forwards. Same layout
        fixes as the step (im2col conv taps, per-pool impl, banding at
        print sizes — VERDICT r2: the capture used to run the monolithic
        trunk, the exact giant-tensor-tiling regime the step escaped);
        dtype stays f32 for target fidelity."""
        k = self._size_knobs(h, w)
        # Under a mesh the step's band knobs are SHARD-LOCAL (shard_bands);
        # captures run once per scale on the GSPMD-global image, where
        # host-level banding never applies.
        n_bands = 0 if self.mesh is not None else k["n_bands"]
        return (n_bands, k["im2col_layers"], k["maxpool_impl"])

    def _features_fn(self, layers_t, h, w):
        """Jitted target-capture forward for a canvas size (cached per
        layer set + size knobs). At print sizes the early trunk runs per
        halo-slab band (ops/banded.banded_forward_cut) and the deep trunk
        monolithically from the reassembled pool2 cut."""
        knobs = self._capture_knobs(h, w)
        from .ops.banded import DEFAULT_CUT

        n_bands, im2col, pool_impl = knobs
        banded = n_bands >= 2 and all(l > DEFAULT_CUT for l in layers_t)
        key = ("feat", layers_t, knobs if banded else knobs[1:])
        if key not in self._fn_cache:
            pooling = self.pooling
            flat = self.mesh is None

            if banded:
                from .ops.banded import banded_forward_cut

                def feat(params, img):
                    def early_fn(slab):
                        return extract_features(
                            params, slab, (DEFAULT_CUT,), pooling=pooling,
                            im2col_layers=im2col, pool_impl=pool_impl,
                            im2col_flatten=flat)

                    cut = banded_forward_cut(early_fn, img, n_bands=n_bands)
                    feats = extract_features(
                        params, cut, layers_t, pooling=pooling,
                        start_layer=DEFAULT_CUT + 1, im2col_layers=im2col,
                        pool_impl=pool_impl, im2col_flatten=flat)
                    return {l: feats[l] for l in layers_t}
            else:
                def feat(params, img):
                    feats = extract_features(
                        params, img, layers_t, pooling=pooling,
                        im2col_layers=im2col, pool_impl=pool_impl,
                        im2col_flatten=flat)
                    # int-keyed dict only: a mixed 'input'/int dict is not a
                    # sortable pytree at the jit boundary
                    return {l: feats[l] for l in layers_t}

            self._fn_cache[key] = jax.jit(feat)
        return key, self._fn_cache[key]

    def _features(self, image, layers):
        """Content-feature capture. ``image`` is in the INTERNAL orientation
        (callers transpose wide canvases; see ``transpose_wide``)."""
        h, w = np.shape(image)[1:3]
        layers_t = tuple(sorted(set(layers)))
        key, fn = self._features_fn(layers_t, h, w)
        exe = self._capture_exe(key, fn, (h, w))
        return exe(self._step_params(), jnp.asarray(image, jnp.float32))

    def _style_stats_fn(self, mode: str, h, w):
        """Jitted per-style-image statistics fn: {layer: (mean, srm)} or
        Grams (cached per mode + size knobs).

        At print-size style resolutions the statistics accumulate per band
        (ops/banded.banded_stats — they are pixel sums, so banding is
        exact), with the deep trunk monolithic from the pool2 cut."""
        knobs = self._capture_knobs(h, w)
        n_bands, im2col, pool_impl = knobs
        banded = n_bands >= 2
        key = ("stats", mode, knobs if banded else knobs[1:])
        if key not in self._fn_cache:
            layers_t = tuple(self.style_layers)
            pooling = self.pooling
            flat = self.mesh is None

            def stats(params, img):
                if banded:
                    from .ops.banded import DEFAULT_CUT, banded_stats

                    def early_fn(slab):
                        early_taps = tuple(sorted(
                            {l for l in layers_t if l <= DEFAULT_CUT}
                            | {DEFAULT_CUT}))
                        return extract_features(
                            params, slab, early_taps, pooling=pooling,
                            im2col_layers=im2col, pool_impl=pool_impl,
                            im2col_flatten=flat)

                    def late_fn(cut):
                        late_taps = tuple(
                            l for l in layers_t if l > DEFAULT_CUT)
                        return extract_features(
                            params, cut, late_taps, pooling=pooling,
                            start_layer=DEFAULT_CUT + 1,
                            im2col_layers=im2col, pool_impl=pool_impl,
                            im2col_flatten=flat)

                    moments, _ = banded_stats(
                        early_fn,
                        late_fn if any(l > DEFAULT_CUT for l in layers_t)
                        else None,
                        img,
                        style_layers=layers_t,
                        content_layers=(),
                        content_targets={},
                        n_bands=n_bands,
                    )
                else:
                    feats = extract_features(
                        params, img, layers_t, pooling=pooling,
                        im2col_layers=im2col, pool_impl=pool_impl,
                        im2col_flatten=flat)
                    moments = {l: L.w2_moments(feats[l]) for l in layers_t}
                if mode == "w2":
                    return moments
                # The reference's per-pixel-normalized Gram equals the
                # second raw moment (ref :137-139).
                return {l: (moments[l][1],) for l in layers_t}

            self._fn_cache[key] = jax.jit(stats)
        return key, self._fn_cache[key]

    def _style_stats(self, style_image, mode: str):
        h, w = np.shape(style_image)[1:3]
        key, fn = self._style_stats_fn(mode, h, w)
        exe = self._capture_exe(key, fn, (h, w))
        return exe(self.params, jnp.asarray(style_image, jnp.float32))

    def _capture_exe(self, key, fn, hw):
        """AOT-compiled executable of a capture fn at a concrete canvas.

        Consults the prefetcher first (stylize submits every scale's capture
        compiles up front, so compiles and one-shot program loads overlap
        iteration — and a remote-compile-service stall no longer lands
        inside a scale's target phase); falls back to compiling here."""
        ekey = ("exe", key, hw)
        if ekey in self._fn_cache:
            return self._fn_cache[ekey]
        exe = self._prefetcher.get(ekey)
        if exe is None:
            exe = self._lower_capture(fn, hw).compile()
        self._fn_cache[ekey] = exe
        return exe

    def _lower_capture(self, fn, hw):
        params_in = {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            for k, v in self.params.items()
        }
        img = jax.ShapeDtypeStruct((1, hw[0], hw[1], 3), jnp.float32)
        return fn.lower(params_in, img)

    def _prefetch_capture(self, ch, cw, style_hws, style_loss):
        """Queue AOT compiles for a scale's capture programs."""
        jobs = [self._features_fn(tuple(sorted(set(self.content_layers))),
                                  ch, cw) + ((ch, cw),)]
        for sh, sw in style_hws:
            jobs.append(self._style_stats_fn(style_loss, sh, sw) + ((sh, sw),))
        for key, fn, hw in jobs:
            ekey = ("exe", key, hw)
            if ekey in self._fn_cache:
                continue

            def make(fn=fn, hw=hw):
                return self._lower_capture(fn, hw).compile()

            self._prefetcher.submit(ekey, make)

    def _finalize_w2(self, mean, srm, eps, iters):
        key = ("w2fin", float(eps), int(iters))
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(
                lambda m, s: L.w2_target(m, s, eps, iters)
            )
        return self._fn_cache[key](mean, srm)

    def _init_image(self, init, content_image, style_images, style_weights, hw):
        ch, cw = hw
        if init == "content":
            return _pil_to_device_nhwc(content_image, (cw, ch))
        if init == "gray":
            x = self._rng.uniform(size=(1, ch, cw, 3)).astype(np.float32)
            return jnp.asarray(x / 255.0 + 0.5)
        if init == "uniform":
            return jnp.asarray(self._rng.uniform(size=(1, ch, cw, 3)).astype(np.float32))
        if init == "normal":
            return jnp.asarray(
                _trunc_normal(self._rng, (1, ch, cw, 3), 0.5, 0.25).astype(np.float32)
            )
        if init == "style_stats":
            mean = np.zeros(3, np.float64)
            var = np.zeros(3, np.float64)
            for img, w in zip(style_images, style_weights):
                arr = np.asarray(img.convert("RGB"), dtype=np.float64) / 255.0
                mean += arr.mean(axis=(0, 1)) * w
                var += arr.var(axis=(0, 1), ddof=1) * w
            chans = [
                _trunc_normal(self._rng, (1, ch, cw, 1), mean[c], math.sqrt(max(var[c], 0.0)))
                for c in range(3)
            ]
            return jnp.asarray(np.concatenate(chans, axis=-1).astype(np.float32))
        raise ValueError(
            "init must be one of 'content', 'gray', 'uniform', 'normal', 'style_stats'"
        )

    def _get_runner(self, cfg: StepConfig, optimizer: str):
        key = (cfg, optimizer)
        if key not in self._runner_cache:
            if optimizer == "adam":
                self._runner_cache[key] = make_adam_runner(cfg, self.mesh)
            elif optimizer == "lbfgs":
                self._runner_cache[key] = make_lbfgs_runner(cfg, self.mesh)
            elif optimizer == "lbfgs-zoom":
                self._runner_cache[key] = make_lbfgs_zoom_runner(cfg, self.mesh)
            else:
                raise ValueError(
                    "optimizer must be one of 'adam', 'lbfgs', 'lbfgs-zoom'"
                )
        return self._runner_cache[key]

    # ------------------------------------------------- AOT compile pipeline

    def _consts_struct(self, cfg: StepConfig, ch: int, cw: int):
        from .models.vgg import feature_shape

        f32 = jnp.float32
        sds = jax.ShapeDtypeStruct
        content = {
            l: sds((1, *feature_shape(l, ch, cw)), f32) for l in cfg.content_layers
        }
        style = {}
        for l in cfg.style_layers:
            c = feature_shape(l, ch, cw)[2]
            if cfg.style_loss == "w2":
                style[l] = L.W2Target(
                    mean=sds((1, c), f32),
                    cov=sds((1, c, c), f32),
                    cov_sqrt=sds((1, c, c), f32),
                )
            else:
                style[l] = sds((1, c, c), f32)
        return {"content": content, "style": style}

    def _state_struct(self, ch: int, cw: int, optimizer: str = "adam"):
        f32, i32 = jnp.float32, jnp.int32
        sds = jax.ShapeDtypeStruct
        img = sds((1, ch, cw, 3), f32)
        if optimizer == "adam":
            opt = AdamState(mu=img, nu=img, count=sds((), i32))
        else:  # reference-flavor lbfgs (step.lbfgs_init shapes)
            hist = sds((_LBFGS_MEMORY, 1, ch, cw, 3), f32)
            opt = LBFGSState(
                s_hist=hist, y_hist=hist, rho=sds((_LBFGS_MEMORY,), f32),
                num_old=sds((), i32), head=sds((), i32), d=img,
                t=sds((), f32), prev_grad=img, h_diag=sds((), f32),
                n_iter=sds((), i32),
            )
        return LoopState(
            image=img,
            opt=opt,
            ema=EMAState(value=img, accum=sds((), f32)),
        )

    def _chunk_for(self, ch: int, cw: int, actual_its: int) -> int:
        """Effective fused-chunk size for a scale. Small scales are
        round-trip-bound on remote-attached devices (~45 ms dispatch+get
        over the axon tunnel vs <1 ms of compute at 128px): scale the chunk
        up so a whole small scale takes a few round trips. At >= 0.1 Mpx
        the user-facing ``callback_chunk`` cadence is unchanged (a wider
        threshold measured slower: the extra chunk-size program variants
        contend with the AOT prefetch workers at mid scales).

        The size snaps to a divisor of ``actual_its`` when one lies close
        enough: a non-dividing chunk leaves a remainder-sized program
        VARIANT whose one-shot load costs seconds over the remote-attached
        backend (measured: 4.7 s for the 1000 = 2x450 + 100 leftover at
        128px) and doubles the prefetch compile work for the scale."""
        px = max(ch * cw, 1)
        factor = max(1, -(-100_000 // px))
        target = min(self.callback_chunk * factor, 500)
        if target >= actual_its:
            return actual_its
        divs = [d for d in range(1, target * 2 + 1)
                if actual_its % d == 0 and d <= 500]
        if divs:
            best = min(divs, key=lambda d: (abs(d - target), -d))
            if best * 2 >= target:
                return best
        return target

    def _aot_chunks(self, ch: int, cw: int, actual_its: int):
        n1 = min(self._chunk_for(ch, cw, actual_its), actual_its)
        rem = actual_its % n1
        return (n1,) if rem == 0 else (n1, rem)

    def _prefetch_scale(self, cfg: StepConfig, ch: int, cw: int,
                        actual_its: int, optimizer: str = "adam"):
        """Queue AOT compilation of the runner(s) for an upcoming scale
        (adam and reference-flavor lbfgs; lbfgs-zoom stays on the JIT path).

        Single device: lower from abstract ShapeDtypeStructs. With a mesh:
        lower from concrete zero-filled dummies built exactly like the real
        scale-start state (same shard_image path), so the compiled program's
        input shardings match what it will be fed.
        """
        runner = self._get_runner(cfg, optimizer)
        if optimizer != "adam":
            runner = runner[0]  # (runner, opt_init)
        if self.mesh is None:
            params_in = {
                k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                for k, v in self.params.items()
            }
            consts_in = self._consts_struct(cfg, ch, cw)
            state_in = self._state_struct(ch, cw, optimizer)
        else:
            params_in = self.params

            def zeros(sds):
                return jnp.zeros(sds.shape, sds.dtype)

            consts_in = jax.tree.map(zeros, self._consts_struct(cfg, ch, cw))
            img = shard_image(jnp.zeros((1, ch, cw, 3), jnp.float32), self.mesh)
            # EVERY image-shaped leaf that arrives COMMITTED at runtime
            # must be lowered from the same placement shard_image resolves
            # (the pyramid's odd sizes fall back to replicated): a plain
            # uncommitted zeros dummy lets the compiler CHOOSE that input's
            # sharding, and calling the compiled program with a committed
            # replicated ema.value then fails the sharding check (r5
            # regression — the lbfgs refactor dropped ema.value from this
            # list). Runtime-uncommitted leaves (the lbfgs history stack)
            # may stay plain zeros: uncommitted call args adopt whatever
            # the compiled program requires.
            state_in = jax.tree.map(
                zeros, self._state_struct(ch, cw, optimizer)
            )._replace(image=img)
            state_in = state_in._replace(
                ema=state_in.ema._replace(value=img))
            if optimizer == "adam":
                state_in = state_in._replace(
                    opt=state_in.opt._replace(mu=img, nu=img))
            else:  # lbfgs_init derives d/prev_grad from the placed image
                state_in = state_in._replace(
                    opt=state_in.opt._replace(d=img, prev_grad=img))
        for n in self._aot_chunks(ch, cw, actual_its):
            key = (cfg, ch, cw, n, optimizer)

            def make(n=n):
                return runner.lower(params_in, consts_in, state_in, n).compile()

            self._prefetcher.submit(key, make)

    def _capture_targets(
        self, content, style_images, style_weights, scale,
        style_scale_fac, style_size, cfg,
    ):
        """Compute per-scale content/style targets (once per scale, f32)."""
        with _phase_timer("  targets:content-feats"):
            content_feats = self._features(content, self.content_layers)
        consts = {
            "content": {l: content_feats[l] for l in self.content_layers},
            "style": {},
        }
        blended = {}
        for img, wgt in zip(style_images, style_weights):
            if style_size is None:
                sw, sh = size_to_fit(img.size, round(scale * style_scale_fac))
            else:
                sw, sh = size_to_fit(img.size, style_size)
            print(f"Processing style image ({sw}x{sh})...")
            style = _pil_to_nhwc(img, (sw, sh))
            with _phase_timer("  targets:style-stats"):
                stats = jax.device_get(self._style_stats(style, cfg.style_loss))
            for layer in self.style_layers:
                contrib = [np.asarray(c, np.float32) * wgt for c in stats[layer]]
                if layer not in blended:
                    blended[layer] = contrib
                else:
                    for i, c in enumerate(contrib):
                        blended[layer][i] = blended[layer][i] + c
        with _phase_timer("  targets:finalize"):
            for layer in self.style_layers:
                if cfg.style_loss == "w2":
                    mean, srm = blended[layer]
                    consts["style"][layer] = self._finalize_w2(
                        mean, srm, cfg.w2_eps, cfg.sqrtm_iters
                    )
                else:
                    consts["style"][layer] = blended[layer][0]
        return consts

    # --------------------------------------------------------------- stylize

    def stylize(
        self,
        content_image,
        style_images,
        *,
        style_weights=None,
        content_weight: float = 0.015,
        tv_weight: float = 2.0,
        optimizer: str = "adam",
        min_scale: int = 128,
        end_scale: int = 512,
        iterations: int = 500,
        initial_iterations: int = 1000,
        step_size: float = 0.02,
        avg_decay: float = 0.99,
        init: str = "content",
        style_scale_fac: float = 1.0,
        style_size: int = None,
        align: int = None,
        callback=None,
        checkpoint: str = None,
        checkpoint_every: int = 500,
        resume: bool = False,
    ):
        min_scale = min(min_scale, end_scale)
        content_weights = [content_weight / len(self.content_layers)] * len(
            self.content_layers
        )

        if style_weights is None:
            style_weights = [1 / len(style_images)] * len(style_images)
        else:
            total = sum(abs(w) for w in style_weights)
            style_weights = [w / total for w in style_weights]
        if len(style_images) != len(style_weights):
            raise ValueError("style_images and style_weights must have the same length")

        scales = gen_scales(min_scale, end_scale)

        # Landscape canvases optimize internally transposed (see
        # ``transpose_wide``): decided ONCE per run from the content aspect,
        # so every scale shares the orientation and warm-start resizes stay
        # in one frame. Internal (ih, iw) dims drive state shapes, step
        # knobs and capture programs; every user-facing surface (canvas
        # prints, STIterate, get_image, saves) stays in the real frame.
        c_w, c_h = content_image.size
        if self.transpose_wide is not None:
            self._flip = (bool(self.transpose_wide) and c_w > c_h
                          and self.mesh is None)
        else:
            self._flip = self._is_tpu and self.mesh is None and c_w > c_h
        self._params_t = None

        if checkpoint is not None and optimizer == "lbfgs-zoom":
            print(
                "Warning: --checkpoint supports the adam and lbfgs "
                "optimizers; no checkpoints will be written for this "
                "lbfgs-zoom run (its optax state is not serialized)."
            )
        # Checkpoint .npz writes run on a background thread (the host-array
        # snapshot stays synchronous: the step donates its state, so device
        # buffers must be fetched before the next chunk launches). Cadence:
        # every ``checkpoint_every`` iterations, plus every scale end.
        ckpt_writer = (
            AsyncCheckpointWriter()
            if checkpoint is not None and optimizer in ("adam", "lbfgs")
            else None
        )
        iters_since_ckpt = 0

        resume_state = None
        start_scale_idx = 0
        if resume and checkpoint and Path(checkpoint).is_file():
            resume_state = load_checkpoint(checkpoint)
            ck_opt = resume_state.get("optimizer", "adam")
            if ck_opt != optimizer:
                raise ValueError(
                    f"checkpoint {checkpoint!r} was written with optimizer "
                    f"{ck_opt!r}; refusing to resume with {optimizer!r} "
                    "(the trajectories are not compatible)"
                )
            start_scale_idx = resume_state["scale_index"]
            if start_scale_idx >= len(scales):
                raise ValueError(
                    f"checkpoint scale index {start_scale_idx} is out of range "
                    f"for the current pyramid of {len(scales)} scales — were "
                    "--min-scale/--end-scale changed since the checkpoint?"
                )
            meta = resume_state.get("meta", {})
            exp_cw, exp_ch = self.canvas(
                content_image.size, scales[start_scale_idx], align
            )
            got = (meta.get("w"), meta.get("h"))
            if None not in got and got != (exp_cw, exp_ch):
                raise ValueError(
                    f"checkpoint geometry {got[0]}x{got[1]} does not match the "
                    f"recomputed canvas {exp_cw}x{exp_ch} at scale "
                    f"{start_scale_idx + 1} — content image or "
                    "--end-scale/--min-scale/--align changed since the "
                    "checkpoint was written"
                )
            ck_flip = bool(meta.get("transposed", False))
            if ck_flip != self._flip:
                raise ValueError(
                    "checkpoint was written with internal orientation "
                    f"transposed={ck_flip} but this run resolves "
                    f"transposed={self._flip} — was transpose_wide (or the "
                    "device platform) changed since the checkpoint? "
                    + ("Pass transpose_wide='off' (--transpose-wide off) to "
                       "resume an untransposed checkpoint compatibly."
                       if self._flip and not ck_flip else
                       "Pass transpose_wide='on' (--transpose-wide on) to "
                       "resume it compatibly.")
                )
            if "rng" in resume_state and "rng_keys" in resume_state:
                from .utils.checkpoint import unpack_rng_state

                unpack_rng_state(
                    self._rng, resume_state["rng"], resume_state["rng_keys"]
                )
            print(
                f"Resuming from {checkpoint}: scale {start_scale_idx + 1}/"
                f"{len(scales)}, iteration {resume_state['done_iters']}"
            )
            self.image = jnp.asarray(resume_state["image"])  # internal frame
        else:
            cw, ch = self.canvas(content_image.size, scales[0], align)
            # Init in the REAL frame (same RNG draws / pixel values as an
            # untransposed run), then move to the internal orientation — the
            # whole trajectory is then the exact transpose.
            self.image = self._t_img(self._init_image(
                init, content_image, style_images, style_weights, (ch, cw)
            ))
        self.image = shard_image(self.image, self.mesh)

        prefetch_paused = False
        try:
            opt_state = None
            for scale_idx, scale in enumerate(scales):
                if scale_idx < start_scale_idx:
                    continue
                resuming_here = resume_state is not None and scale_idx == start_scale_idx
                cw, ch = self.canvas(content_image.size, scale, align)
                # Internal (device-side) dims: transposed for wide canvases.
                ih, iw = ((cw, ch) if self._flip else (ch, cw))
                with _phase_timer(f"scale-entry@{scale}"):
                    content = self._t_img(
                        _pil_to_device_nhwc(content_image, (cw, ch))
                    )

                    if resuming_here:
                        self.average = EMAState(
                            value=jnp.asarray(resume_state["ema_value"]),
                            accum=jnp.asarray(resume_state["ema_accum"]),
                        )
                    else:
                        self.image = jnp.clip(
                            _resize_image(self.image, (ih, iw)), 0.0, 1.0)
                        self.image = shard_image(self.image, self.mesh)
                        self.average = ema_init(self.image, avg_decay)

                cfg = StepConfig(
                    content_layers=tuple(self.content_layers),
                    style_layers=tuple(self.style_layers),
                    content_weights=tuple(content_weights),
                    style_layer_weights=tuple(self.style_layer_weights),
                    tv_weight=tv_weight,
                    style_loss=self.style_loss,
                    content_loss=self.content_loss,
                    sqrtm_impl=self.sqrtm_impl,
                    w2_grad=self.w2_grad,
                    pooling=self.pooling,
                    compute_dtype=self.compute_dtype,
                    step_size=step_size,
                    avg_decay=avg_decay,
                    **self._size_knobs(ih, iw),
                )

                actual_its = initial_iterations if scale == scales[0] else iterations

                # Overlap ALL scales' trace/compile/program-loads with target
                # capture and iteration (adam only; see _AOTPrefetcher). Submitted
                # BEFORE target capture so even the first scale's own chunk
                # programs load while the session pays its one-time startup
                # (weight transfer + first compiles dominate the cold path).
                # Submission is idempotent, nearest scale first.
                def style_hws(sc):
                    out = []
                    for img in style_images:
                        if style_size is None:
                            sw, sh = size_to_fit(
                                img.size, round(sc * style_scale_fac))
                        else:
                            sw, sh = size_to_fit(img.size, style_size)
                        out.append((sh, sw))
                    return out

                if optimizer in ("adam", "lbfgs"):
                    self._prefetch_scale(cfg, ih, iw, actual_its, optimizer)
                    self._prefetch_capture(ih, iw, style_hws(scale),
                                           self.style_loss)
                    for nxt in range(scale_idx + 1, len(scales)):
                        cw2, ch2 = self.canvas(
                            content_image.size, scales[nxt], align
                        )
                        ih2, iw2 = ((cw2, ch2) if self._flip else (ch2, cw2))
                        self._prefetch_scale(
                            dataclasses.replace(cfg, **self._size_knobs(ih2, iw2)),
                            ih2, iw2, iterations, optimizer,
                        )
                        # Captures are small programs that load in 0.2-5 s:
                        # one scale ahead is enough, and submitting them all
                        # up front measurably contends with chunk dispatch
                        # for the remote-attach tunnel at the small scales.
                        if nxt == scale_idx + 1:
                            self._prefetch_capture(
                                ih2, iw2, style_hws(scales[nxt]),
                                self.style_loss)

                print(f"Processing content image ({cw}x{ch})...")
                with _phase_timer(f"targets@{scale}"):
                    consts = self._capture_targets(
                    content, style_images, style_weights, scale,
                        style_scale_fac, style_size, cfg,
                    )
                self._last_cfg, self._last_consts = cfg, consts

                if optimizer == "adam":
                    runner = self._get_runner(cfg, "adam")
                    if resuming_here:
                        opt_state = AdamState(
                            mu=jnp.asarray(resume_state["adam_mu"]),
                            nu=jnp.asarray(resume_state["adam_nu"]),
                            count=jnp.asarray(resume_state["adam_count"]),
                        )
                    elif opt_state is None:
                        opt_state = adam_init(self.image)
                    else:
                        opt_state = _scale_adam(opt_state, (ih, iw), self.mesh)
                    state = LoopState(image=self.image, opt=opt_state, ema=self.average)
                elif optimizer in ("lbfgs", "lbfgs-zoom"):
                    runner, opt_init = self._get_runner(cfg, optimizer)
                    if resuming_here and optimizer == "lbfgs":
                        opt0 = LBFGSState(**{
                            f: jnp.asarray(resume_state[f"lbfgs_{f}"])
                            for f in LBFGSState._fields
                        })
                    else:
                        opt0 = opt_init(self.image, self._step_params(), consts)
                    state = LoopState(
                        image=self.image, opt=opt0, ema=self.average,
                    )
                else:
                    raise ValueError(
                        "optimizer must be one of 'adam', 'lbfgs', 'lbfgs-zoom'"
                    )

                done = min(resume_state["done_iters"], actual_its) if resuming_here else 0

                t_prev = time.time()
                first_chunk = True
                scale_chunk = self._chunk_for(ch, cw, actual_its)
                # Global HBM high-water mark at scale start: windows the
                # per-iterate gpu_ram figure to THIS scale (utils/trace.py
                # peak_device_ram; VERDICT r4 weak #6).
                from .utils.trace import device_ram_stats

                ram_baseline = device_ram_stats(self.devices)[0]
                # Gate the AOT prefetch pool while this scale's chunks
                # dispatch: un-gated, upcoming scales' program loads share
                # the remote-attach tunnel with chunk dispatch (and their
                # tracing the GIL), inflating every mid scale 1.5-14x over
                # its pure step time (r4 warm pyramid; VERDICT r4 #1).
                # Loads drain between scales and whenever get() blocks.
                # Balanced by the resume() below / in the finally (interrupt
                # paths), tracked by ``prefetch_paused``.
                self._prefetcher.pause()
                prefetch_paused = True
                last_chunk_wall = 0.0

                # One-chunk software pipeline: chunk N+1 is DISPATCHED
                # before chunk N's losses are fetched, so the per-chunk
                # host/tunnel round-trip (losses fetch, callbacks, ~10-15
                # ms on the remote attach) overlaps device execution
                # instead of serializing with it (512px: 0.27 ms/iter of
                # the 5.6 ms wall was this gap). The runner donates its
                # state, so everything published from chunk N — the
                # image/EMA handles callbacks and the web preview read,
                # and checkpoint snapshots — is captured as DEVICE-side
                # copies between N's dispatch and N+1's (sub-ms enqueues;
                # the originals feed the next chunk).
                pending = None

                def _drain(entry):
                    nonlocal t_prev, last_chunk_wall
                    (n, losses_dev, pub_image, pub_ema, snap, done_after,
                     t_disp, phase_name) = entry
                    # The device still holds queued work past this fetch
                    # (the next chunk is already dispatched), leaving the
                    # tunnel idle while it crunches: re-open the prefetch
                    # gate for the fetch so upcoming scales' program loads
                    # ride the window — but only at scales whose chunk
                    # wall is long enough to absorb a load's bulk (short
                    # windows just put the load's tail in front of the
                    # next dispatch; r5-try1 measured +6-8 s outlier
                    # chunks). Gate on the static pixel count, not the
                    # measured wall: a load drain inside an early chunk's
                    # get() inflates the measured wall and would open
                    # windows at tiny scales (r5-try7: a 13 s bleed into
                    # the second 128px chunk). last_chunk_wall starts 0.0,
                    # so the first chunk never opens the window.
                    exec_window = (ih * iw >= 1_400_000
                                   and last_chunk_wall >= 1.2)
                    with _phase_timer(phase_name):
                        if exec_window:
                            self._prefetcher.resume()
                        try:
                            losses = np.asarray(
                                jax.device_get(losses_dev), np.float64)
                        finally:
                            if exec_window:
                                self._prefetcher.pause()
                        last_chunk_wall = time.perf_counter() - t_disp
                    # Publish state so callbacks (saves, web preview) see
                    # progress (the copies — the originals are donated).
                    self.image, self.average = pub_image, pub_ema
                    t_now = time.time()
                    # Submit the snapshot BEFORE callbacks so an interrupt
                    # raised by a callback still leaves a resumable
                    # checkpoint (the finally below flushes the in-flight
                    # write); the writer thread fetches and writes while
                    # the device crunches subsequent chunks (a synchronous
                    # device_get here cost 4.3 s at 1448x1086 over the
                    # remote-attached backend).
                    if snap is not None:
                        if ckpt_writer.error is not None:
                            print("Warning: checkpoint write failed: "
                                  f"{ckpt_writer.error}")
                            ckpt_writer.error = None
                        ckpt_writer.submit(
                            checkpoint,
                            scale_index=scale_idx,
                            done_iters=done_after,
                            meta={"w": cw, "h": ch, "scale": scale,
                                  "transposed": self._flip},
                            optimizer=optimizer,
                            rng=_snapshot_rng(self._rng),
                            **snap,
                        )
                    if callback is not None:
                        ram = peak_device_ram(self.devices, ram_baseline)
                        for k in range(n):
                            callback(
                                STIterate(
                                    w=cw, h=ch, i=done_after - n + k + 1,
                                    i_max=actual_its,
                                    loss=float(losses[k]),
                                    time=t_prev + (t_now - t_prev) * (k + 1) / n,
                                    gpu_ram=ram,
                                )
                            )
                    t_prev = t_now

                while done < actual_its:
                    n = min(scale_chunk, actual_its - done)
                    aot = None
                    if optimizer in ("adam", "lbfgs"):
                        aot = self._prefetcher.get((cfg, ih, iw, n, optimizer))
                    phase_name = (f"{'chunk1' if first_chunk else 'chunk'}"
                                  f"@{scale}x{n}")
                    with _phase_timer(phase_name):
                        t_disp = time.perf_counter()
                        if aot is not None:
                            state, losses = aot(self._step_params(), consts, state)
                        else:
                            state, losses = runner(
                                self._step_params(), consts, state, n)
                        pub_image = jnp.copy(state.image)
                        pub_ema = jax.tree.map(jnp.copy, state.ema)
                    snap = None
                    if ckpt_writer is not None:
                        iters_since_ckpt += n
                        if (iters_since_ckpt >= checkpoint_every
                                or done + n >= actual_its):
                            opt_key = "adam" if optimizer == "adam" else "lbfgs"
                            with _phase_timer(f"ckpt-snapshot@{scale}"):
                                snap = {
                                    "image": pub_image,
                                    opt_key: jax.tree.map(jnp.copy, state.opt),
                                    "ema": pub_ema,
                                }
                            iters_since_ckpt = 0
                    if pending is not None:
                        _drain(pending)
                    pending = (n, losses, pub_image, pub_ema, snap,
                               done + n, t_disp, phase_name)
                    first_chunk = False
                    done += n
                if pending is not None:
                    _drain(pending)

                self._prefetcher.resume()
                prefetch_paused = False
                if optimizer == "adam":
                    opt_state = state.opt
                # Each new scale starts from the previous scale's averaged iterate
                # (ref :495-497).
                with _phase_timer(f"scale-exit@{scale}"):
                    self.image = jnp.clip(ema_get(state.ema), 0.0, 1.0)
                    self.average = state.ema

        finally:
            if prefetch_paused:
                self._prefetcher.resume()
            if ckpt_writer is not None:
                try:
                    ckpt_writer.close()
                except Exception as err:
                    print(f"Warning: checkpoint write failed: {err}")
        with _phase_timer("final-image"):
            return self.get_image()


def tensor_to_image(arr, image_type: str = "pil"):
    """(H, W, 3) [0,1] float array (host or device) -> PIL / uint16 ndarray
    (ref get_image semantics, :335-347). Triggers the device fetch when
    given a device array — callable from a writer thread."""
    arr = np.clip(np.asarray(arr), 0.0, 1.0)
    if arr.ndim == 4:
        arr = arr[0]
    if image_type.lower() == "pil":
        return Image.fromarray(np.uint8(np.round(arr * 255.0)))
    if image_type.lower() == "np_uint16":
        return np.uint16(np.round(arr * 65535.0))
    raise ValueError("image_type must be 'pil' or 'np_uint16'")


def _snapshot_rng(rng):
    """Point-in-time copy of a RandomState (safe to hand to the async
    checkpoint writer while the live one keeps advancing)."""
    snap = np.random.RandomState()
    snap.set_state(rng.get_state())
    return snap


def _trunc_normal(rng, shape, mean, std, lo=0.0, hi=1.0):
    """Truncated normal in [lo, hi] via rejection (host-side init only)."""
    if std <= 0:
        return np.full(shape, np.clip(mean, lo, hi), np.float32)
    out = rng.normal(mean, std, size=shape)
    bad = (out < lo) | (out > hi)
    while bad.any():
        out[bad] = rng.normal(mean, std, size=int(bad.sum()))
        bad = (out < lo) | (out > hi)
    return out.astype(np.float32)
