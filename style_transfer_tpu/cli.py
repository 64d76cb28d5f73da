"""Command-line interface.

Flag-surface parity with the reference CLI
(``/root/reference/style_transfer/cli.py:143-270``), including its
single-source-of-truth trick: engine hyperparameter flags take their defaults
and types from ``StyleTransfer.stylize``'s keyword defaults/annotations, so
CLI and engine can never drift. TPU adaptations:

* ``--devices`` selects *how many* TPU chips to shard over (``N`` or ``all``)
  instead of CUDA device names — parallelism is SPMD spatial sharding, not
  the reference's 2-GPU layer split;
* new flags for TPU-native capabilities: ``--precision``, ``--style-loss``
  (exposes the Gram mode the reference defines but never wires up),
  ``--vgg-weights``, ``--remat``, ``--callback-chunk``.
"""

import argparse
import atexit
import json
import sys
import webbrowser
from pathlib import Path

from .io_color import load_image, print_error, save_image
from .utils.scales import get_safe_scale
from .utils.trace import TraceRecorder

__doc_short__ = "Neural style transfer on TPU (JAX/XLA), W2/Gram losses over VGG-19."


def setup_exceptions():
    """Pretty tracebacks when IPython is around (ref cli.py:90-95)."""
    try:
        from IPython.core.ultratb import FormattedTB

        sys.excepthook = FormattedTB(mode="Plain")
    except Exception:
        pass  # IPython absent or its API changed — plain tracebacks are fine


def print_hardware_banner(devices):
    """CPU-thread count and per-device kind + memory (ref cli.py:225-231)."""
    import os

    print(f"CPU threads: {os.cpu_count()}")
    for d in devices:
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        lim = stats.get("bytes_limit")
        mem = f" ({lim / 2**30:.2f} GB memory)" if lim else ""
        print(f"Device {d.id}: {d.device_kind}{mem}")


def fix_start_method():
    """Use spawn on macOS — fork breaks the web-preview child there
    (ref cli.py:98-100)."""
    import multiprocessing as mp
    import platform

    if platform.system() == "Darwin":
        mp.set_start_method("spawn", force=True)


class _AsyncImageSaver:
    """Background writer for mid-run image saves (single-slot, latest wins).

    Both the device->host fetch (the payload is a fresh device-side
    snapshot from ``StyleTransfer.get_image_device`` — never a donated
    buffer) and the PIL encode + disk write run here, off the iteration
    loop: a synchronous 75 MB EMA fetch per --save-every costs seconds
    each on a remote-attached backend.
    """

    def __init__(self):
        import threading

        self._cond = threading.Condition()
        self._pending = None
        self._busy = False
        threading.Thread(target=self._run, name="stt-save", daemon=True).start()

    def _run(self):
        from .engine import tensor_to_image

        while True:
            with self._cond:
                while self._pending is None:
                    self._cond.wait()
                path, image, image_type = self._pending
                self._pending = None
                self._busy = True
            try:
                # A device-array payload is fetched HERE, off the iteration
                # loop (the engine hands out fresh non-donated snapshots).
                if not hasattr(image, "save") and image_type is not None:
                    image = tensor_to_image(image, image_type)
                save_image(path, image)
            except (OSError, ValueError) as err:
                print_error(err)
            with self._cond:
                self._busy = False
                self._cond.notify_all()

    def submit(self, path, image, image_type=None):
        with self._cond:
            self._pending = (path, image, image_type)
            self._cond.notify_all()

    def flush(self):
        with self._cond:
            while self._pending is not None or self._busy:
                self._cond.wait()


class Callback:
    """Per-iteration progress: tqdm line, periodic saves, web events, trace.

    Behavior parity with reference cli.py:107-140. Mid-run image saves are
    asynchronous (latest-wins writer thread); the final save in ``main`` is
    synchronous after a flush, so the output on disk is never stale.
    """

    def __init__(self, st, args, image_type="pil", web_interface=None):
        self.st = st
        self.args = args
        self.image_type = image_type
        self.web_interface = web_interface
        self.recorder = TraceRecorder(args)
        self.progress = None
        self.saver = _AsyncImageSaver()

    def _is_final_scale(self, iterate):
        # Compare against the precomputed aligned final canvas, not the raw
        # end_scale: with --align the final dims need not equal end_scale.
        final = getattr(self.args, "final_dims", None)
        if final is not None:
            return (iterate.w, iterate.h) == tuple(final)
        return max(iterate.w, iterate.h) == self.args.end_scale

    def __call__(self, iterate):
        from tqdm import tqdm

        self.recorder.append(iterate)
        if iterate.i == 1 or self.progress is None:
            # Lazy creation also covers resumed runs, where the first
            # callback arrives mid-scale with i > 1.
            self.progress = tqdm(
                total=iterate.i_max, initial=iterate.i - 1, dynamic_ncols=True
            )
        msg = "Size: {}x{}, iteration: {}, loss: {:g}"
        tqdm.write(msg.format(iterate.w, iterate.h, iterate.i, iterate.loss))
        self.progress.update()
        if self.web_interface is not None:
            self.web_interface.put_iterate(iterate, self.st.get_image_tensor())
        if iterate.i == iterate.i_max:
            self.progress.close()
            self.progress = None
            if not self._is_final_scale(iterate):
                self.saver.submit(self.args.output,
                                  self.st.get_image_device(),
                                  self.image_type)
            elif self.web_interface is not None:
                self.web_interface.put_done()
        elif iterate.i % self.args.save_every == 0:
            self.saver.submit(self.args.output,
                              self.st.get_image_device(),
                              self.image_type)

    def close(self):
        self.saver.flush()
        if self.progress is not None:
            self.progress.close()

    def get_trace(self):
        return self.recorder.get_trace()


def build_parser(stylize_fn):
    p = argparse.ArgumentParser(
        description=__doc_short__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )

    defaults = stylize_fn.__kwdefaults__
    types = stylize_fn.__annotations__

    def arg_info(name):
        return {"default": defaults[name], "type": types[name]}

    p.add_argument("content", type=str, help="the content image")
    p.add_argument("styles", type=str, nargs="+", metavar="style",
                   help="the style images")
    p.add_argument("--output", "-o", type=str, default="out.png",
                   help="the output image")
    p.add_argument("--style-weights", "-sw", type=float, nargs="+", default=None,
                   metavar="STYLE_WEIGHT",
                   help="the relative weights for each style image")
    p.add_argument("--devices", type=str, nargs="+", default=["1"],
                   metavar="DEVICE",
                   help="devices to shard over: a chip count, 'all', or "
                        "explicit device names (e.g. tpu:0 tpu:1 — the "
                        "analog of the reference's cuda:0 cuda:1)")
    p.add_argument("--random-seed", "-r", type=int, default=0, help="the random seed")
    p.add_argument("--content-weight", "-cw", **arg_info("content_weight"),
                   help="the content weight")
    p.add_argument("--tv-weight", "-tw", **arg_info("tv_weight"),
                   help="the smoothing weight")
    p.add_argument("--optimizer", **arg_info("optimizer"),
                   choices=["adam", "lbfgs", "lbfgs-zoom"],
                   help="the optimizer to use (lbfgs = the reference's "
                        "fixed-step flavor; lbfgs-zoom adds a zoom "
                        "linesearch)")
    p.add_argument("--min-scale", "-ms", **arg_info("min_scale"),
                   help="the minimum scale (max image dim), in pixels")
    p.add_argument("--end-scale", "-s", type=str, default="512",
                   help="the final scale (max image dim), in pixels; append + "
                        "to cap total pixels for non-square images")
    p.add_argument("--iterations", "-i", **arg_info("iterations"),
                   help="the number of iterations per scale")
    p.add_argument("--initial-iterations", "-ii", **arg_info("initial_iterations"),
                   help="the number of iterations on the first scale")
    p.add_argument("--save-every", type=int, default=50,
                   help="save the image every SAVE_EVERY iterations")
    p.add_argument("--step-size", "-ss", **arg_info("step_size"),
                   help="the step size (learning rate) for Adam")
    p.add_argument("--avg-decay", "-ad", **arg_info("avg_decay"),
                   help="the EMA decay rate for iterate averaging")
    p.add_argument("--init", **arg_info("init"),
                   choices=["content", "gray", "uniform", "normal", "style_stats"],
                   help="the initial image")
    p.add_argument("--style-scale-fac", **arg_info("style_scale_fac"),
                   help="the relative scale of the style to the content")
    p.add_argument("--style-size", **arg_info("style_size"),
                   help="the fixed scale of the style at different content scales")
    p.add_argument("--pooling", type=str, default="max",
                   choices=["max", "average", "l2"], help="the model's pooling mode")
    p.add_argument("--proof", type=str, default=None,
                   help="the ICC color profile (CMYK) for soft proofing the "
                        "content and styles")
    p.add_argument("--web", default=False, action="store_true",
                   help="enable the web interface")
    p.add_argument("--host", type=str, default="0.0.0.0",
                   help="the host the web interface binds to")
    p.add_argument("--port", type=int, default=8080,
                   help="the port the web interface binds to")
    p.add_argument("--browser", type=str, default="", nargs="?",
                   help="open a web browser (specify the browser if not "
                        "system default)")
    # --- TPU-native extensions -------------------------------------------
    p.add_argument("--style-loss", type=str, default="w2", choices=["w2", "gram"],
                   help="style objective: Wasserstein-2 or Gram matrix")
    p.add_argument("--content-loss", type=str, default="mse",
                   choices=["mse", "scaled"],
                   help="content objective: plain MSE (reference default) or "
                        "gradient-normalized ScaledMSE")
    p.add_argument("--precision", type=str, default="auto",
                   choices=["auto", "bf16", "f32"],
                   help="VGG trunk precision (auto = bf16 on TPU, f32 on CPU)")
    p.add_argument("--vgg-weights", type=str, default=None,
                   help="path to VGG-19 weights (.npz native or torchvision .pth)")
    p.add_argument("--sqrtm", type=str, default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="matrix-sqrt implementation (pallas = fused "
                        "VMEM-resident Newton-Schulz kernel, TPU only)")
    p.add_argument("--w2-grad", type=str, default="trace",
                   choices=["trace", "lyap"],
                   help="W2 sqrt-term gradient: analytic trace VJP (exact, "
                        "faster) or the reference's iterative Lyapunov "
                        "backward")
    p.add_argument("--remat", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="rematerialize the trunk in backward (memory vs compute)")
    p.add_argument("--bands", type=str, default="auto",
                   help="bands for the banded trunk at print sizes: auto, "
                        "off, a row count N, or RxC for a 2D slab grid "
                        "(see ops/banded.py)")
    p.add_argument("--paired-early", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="width-paired conv1_1..relu1_2 layout (full 128-lane "
                        "MXU tiles for the C=64 block; TPU only)")
    p.add_argument("--band-scan", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="roll the interior band slabs into one lax.scan "
                        "body: ~2x smaller compiled programs at +21-24%% "
                        "step time — for cold one-shot runs where "
                        "compile/load dominates (default: off)")
    p.add_argument("--transpose-wide", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="optimize landscape canvases internally transposed "
                        "(exactly-equivalent computation; XLA runs the tall "
                        "orientation faster — TPU single-chip only)")
    p.add_argument("--align", **arg_info("align"),
                   help="round optimization dims to a multiple (1 = exact "
                        "reference sizing; 8/16 avoids odd pooling cascades "
                        "that slow TPU mid-scales; default: exact "
                        "single-chip, shard-divisible under a mesh)")
    p.add_argument("--callback-chunk", type=int, default=50,
                   help="iterations fused per device round-trip")
    p.add_argument("--trace", type=str, default="trace.json",
                   help="where to write the run trace")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="path to write full optimization-state checkpoints")
    p.add_argument("--checkpoint-every", **arg_info("checkpoint_every"),
                   help="iterations between checkpoint writes (scale ends "
                        "always checkpoint; writes are asynchronous)")
    p.add_argument("--resume", default=False, action="store_true",
                   help="resume from --checkpoint if it exists")
    return p


def main(argv=None):
    setup_exceptions()
    fix_start_method()

    from .engine import StyleTransfer  # deferred: heavy jax import
    from .web.server import WebInterface

    p = build_parser(StyleTransfer.stylize)
    args = p.parse_args(argv)

    try:
        content_img = load_image(args.content, args.proof)
        style_imgs = [load_image(img, args.proof) for img in args.styles]
    except OSError as err:
        print_error(err)
        sys.exit(1)

    image_type = "pil"
    if Path(args.output).suffix.lower() in {".tif", ".tiff"}:
        image_type = "np_uint16"

    import jax

    all_devices = jax.devices()
    spec = args.devices
    if len(spec) == 1 and (spec[0] == "all" or spec[0].isdigit()):
        # Count form: '--devices N' / '--devices all'.
        n_devices = len(all_devices) if spec[0] == "all" else int(spec[0])
        if not 1 <= n_devices <= len(all_devices):
            print(f"Requested {n_devices} devices but {len(all_devices)} available.")
            sys.exit(1)
        devices = all_devices[:n_devices]
    else:
        # Explicit name form (ref cli.py:161-162, 214-222): 'tpu:0 tpu:1'.
        from .engine import _resolve_device

        try:
            devices = [_resolve_device(name) for name in spec]
        except (RuntimeError, IndexError, ValueError) as err:
            print_error(err)
            sys.exit(1)
        if len({d.platform for d in devices}) > 1:
            print("Devices must all be the same type.")
            sys.exit(1)
    print("Using devices:", " ".join(str(d) for d in devices))
    print_hardware_banner(devices)

    end_scale = int(str(args.end_scale).rstrip("+"))
    if str(args.end_scale).endswith("+"):
        end_scale = get_safe_scale(*content_img.size, end_scale)
    args.end_scale = end_scale
    # The aligned final canvas the engine will actually optimize at — used by
    # the callback to detect the last scale (put_done vs intermediate save).
    # Filled in after the engine exists (the effective alignment depends on
    # the mesh; see StyleTransfer.canvas).
    args.final_dims = None

    web_interface = None
    if args.web:
        web_interface = WebInterface(args.host, args.port)
        atexit.register(web_interface.close)

    print("Loading model...")
    remat = {"auto": None, "on": True, "off": False}[args.remat]
    n_bands = {"auto": None, "off": 0}.get(args.bands, args.bands)
    n_bands_w = None
    if isinstance(n_bands, str):
        if "x" in n_bands:  # RxC 2D slab grid
            rows, cols = n_bands.lower().split("x", 1)
            n_bands, n_bands_w = int(rows), int(cols)
        else:
            n_bands = int(n_bands)
    precision = {"auto": "auto", "bf16": "bfloat16", "f32": "float32"}[args.precision]
    st = StyleTransfer(
        devices=devices,
        pooling=args.pooling,
        weights=args.vgg_weights,
        compute_dtype=precision,
        style_loss=args.style_loss,
        content_loss=args.content_loss,
        sqrtm_impl=args.sqrtm,
        w2_grad=args.w2_grad,
        remat=remat,
        n_bands=n_bands,
        n_bands_w=n_bands_w,
        paired_early={"auto": None, "on": True, "off": False}[
            args.paired_early],
        band_scan={"auto": None, "on": True, "off": False}[args.band_scan],
        transpose_wide={"auto": None, "on": True, "off": False}[
            args.transpose_wide],
        callback_chunk=args.callback_chunk,
    )
    st.seed(args.random_seed)
    # The aligned final canvas the engine will optimize at — used by the
    # callback to detect the last scale (put_done vs intermediate save).
    args.final_dims = st.canvas(content_img.size, args.end_scale, args.align)
    print(f"VGG-19 weights: {st.weights_source}")

    callback = Callback(st, args, image_type=image_type, web_interface=web_interface)
    atexit.register(callback.close)

    url = f"http://{args.host}:{args.port}/"
    if args.web:
        if args.browser:
            webbrowser.get(args.browser).open(url)
        elif args.browser is None:
            webbrowser.open(url)

    defaults = StyleTransfer.stylize.__kwdefaults__
    st_kwargs = {k: v for k, v in args.__dict__.items() if k in defaults}
    import contextlib

    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )
    try:
        with profile_cm:
            st.stylize(content_img, style_imgs, **st_kwargs, callback=callback)
    except KeyboardInterrupt:
        pass

    # Drain any in-flight async save first so it cannot land after (and
    # clobber) the final image written below.
    callback.saver.flush()
    output_image = st.get_image(image_type)
    if output_image is not None:
        try:
            save_image(args.output, output_image)
        except (OSError, ValueError) as err:
            print_error(err)
            sys.exit(1)
    with open(args.trace, "w") as fp:
        json.dump(callback.get_trace(), fp, indent=4)


if __name__ == "__main__":
    main()
