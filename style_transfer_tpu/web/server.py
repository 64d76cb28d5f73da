"""Live web preview server.

Capability parity with the reference's observability UI
(``/root/reference/style_transfer/web_interface.py`` + ``web_static/``): an
aiohttp app running in a separate OS process, fed per-iteration events over a
``multiprocessing.Queue``; browsers get ``STIterate`` stats pushed over a
WebSocket and poll ``GET /image`` for the current iterate as a JPEG (quality
95, 4:4:4, sRGB ICC embedded).

Own design notes (not a port): events are plain picklable payloads (the image
crosses the process boundary as uint8 HWC, already quantized — JPEG is 8-bit
anyway, and this is 4x less IPC traffic than shipping float tensors); the
client is dependency-free vanilla JS.
"""

import asyncio
import io
import json
import multiprocessing as mp
import queue as queue_mod
from dataclasses import asdict, is_dataclass
from pathlib import Path

import numpy as np

__all__ = ["WebInterface"]

_STATIC = Path(__file__).resolve().parent / "static"


def _encode_event(obj):
    if is_dataclass(obj):
        d = asdict(obj)
        d["_type"] = type(obj).__name__
        return d
    return obj


def _to_uint8(image) -> np.ndarray:
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        return arr
    return np.uint8(np.round(np.clip(arr, 0.0, 1.0) * 255.0))


class _Server:
    """Runs inside the child process."""

    def __init__(self, host, port, q, srgb_profile):
        self.host = host
        self.port = port
        self.q = q
        self.srgb_profile = srgb_profile
        self.image = None
        self.wss = []
        self.loop = None

    def _compress(self):
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(self.image).save(
            buf, format="jpeg", icc_profile=self.srgb_profile,
            quality=95, subsampling=0,
        )
        return buf.getvalue()

    async def _broadcast(self, payload):
        text = json.dumps(payload)
        for ws in list(self.wss):
            try:
                await ws.send_str(text)
            except (ConnectionError, RuntimeError):
                try:
                    self.wss.remove(ws)
                except ValueError:
                    pass

    async def _pump(self):
        while True:
            event = await self.loop.run_in_executor(None, self.q.get)
            kind = event[0]
            if kind == "iterate":
                _, iterate_dict, image = event
                self.image = image
                iterate_dict = dict(iterate_dict)
                iterate_dict["_type"] = "STIterate"
                await self._broadcast(iterate_dict)
            elif kind == "done":
                await self._broadcast({"_type": "WIDone"})
                if self.wss:
                    print("Waiting for web clients to finish...")
                    await asyncio.sleep(5)
            elif kind == "stop":
                for ws in list(self.wss):
                    await ws.close()
                await self.runner.cleanup()
                self.loop.stop()
                return

    async def handle_index(self, request):
        from aiohttp import web

        return web.Response(
            body=(_STATIC / "index.html").read_bytes(), content_type="text/html"
        )

    async def handle_image(self, request):
        from aiohttp import web

        if self.image is None:
            raise web.HTTPNotFound()
        body = await self.loop.run_in_executor(None, self._compress)
        return web.Response(body=body, content_type="image/jpeg")

    async def handle_websocket(self, request):
        from aiohttp import web

        ws = web.WebSocketResponse()
        await ws.prepare(request)
        self.wss.append(ws)
        async for _ in ws:
            pass
        try:
            self.wss.remove(ws)
        except ValueError:
            pass
        return ws

    async def _start_app(self):
        from aiohttp import web

        app = web.Application()
        app.router.add_routes(
            [
                web.get("/", self.handle_index),
                web.get("/image", self.handle_image),
                web.get("/websocket", self.handle_websocket),
                web.static("/", _STATIC),
            ]
        )
        self.runner = web.AppRunner(app)
        await self.runner.setup()
        site = web.TCPSite(self.runner, self.host, self.port, shutdown_timeout=5)
        await site.start()

    def run(self):
        self.loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self.loop)
        self.loop.create_task(self._start_app())
        self.loop.create_task(self._pump())
        try:
            self.loop.run_forever()
        except KeyboardInterrupt:
            self.q.put(("stop",))
            self.loop.run_forever()


def _child_main(host, port, q, srgb_profile):
    _Server(host, port, q, srgb_profile).run()


class WebInterface:
    """Engine-side handle: spawns the server process and feeds it events."""

    def __init__(self, host: str = "0.0.0.0", port: int = 8080, max_queue: int = 8):
        from .. import srgb_profile

        self.host = host
        self.port = port
        # Bounded queue: backpressure comes from put_nowait raising Full, not
        # from qsize() — mp.Queue.qsize raises NotImplementedError on macOS
        # (sem_getvalue is unimplemented there), the exact platform
        # cli.fix_start_method exists for. Control events ('done'/'stop')
        # use blocking puts so they are never dropped.
        self.q = mp.Queue(maxsize=max_queue)
        self.max_queue = max_queue
        print(f"Starting web interface at http://{host}:{port}/")
        self.process = mp.Process(
            target=_child_main, args=(host, port, self.q, srgb_profile), daemon=True
        )
        self.process.start()
        self._closed = False

    def put_iterate(self, iterate, image):
        """iterate: STIterate dataclass; image: HWC array, f32 [0,1] or uint8.

        Backpressure: if the preview process is behind, drop frames rather
        than stall the optimization loop or grow the queue unboundedly.
        """
        try:
            self.q.put_nowait(("iterate", asdict(iterate), _to_uint8(image)))
        except queue_mod.Full:
            pass

    def put_done(self):
        # Control events must not hang on a full (stalled-child) queue:
        # bounded blocking, then give up — an unresponsive child is torn
        # down by close()'s terminate path anyway.
        try:
            self.q.put(("done",), timeout=5)
        except queue_mod.Full:
            pass

    def close(self):
        if self._closed:
            return
        self._closed = True
        try:
            try:
                self.q.put(("stop",), timeout=5)
            except queue_mod.Full:
                pass
            self.process.join(12)
        finally:
            if self.process.is_alive():
                self.process.terminate()
