"""Web preview server (SURVEY.md §4.6): event encoding, process lifecycle,
HTTP endpoints against a live child-process server on localhost."""

import json
import socket
import time
import urllib.request

import numpy as np
import pytest

from style_transfer_tpu.utils.trace import STIterate
from style_transfer_tpu.web.server import WebInterface, _encode_event, _to_uint8


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_encode_event_adds_type():
    it = STIterate(w=1, h=2, i=3, i_max=4, loss=0.5, time=1.0, gpu_ram=0)
    d = _encode_event(it)
    assert d["_type"] == "STIterate" and d["w"] == 1
    assert json.dumps(d)  # serializable


def test_to_uint8():
    arr = np.asarray([[[0.0, 0.5, 1.0]]], np.float32)
    out = _to_uint8(arr)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[[0, 128, 255]]])
    u8 = np.zeros((2, 2, 3), np.uint8)
    assert _to_uint8(u8) is u8


@pytest.mark.timeout(60)
def test_server_endpoints():
    port = free_port()
    wi = WebInterface("127.0.0.1", port)
    try:
        base = f"http://127.0.0.1:{port}"

        def get(path, ok=(200,), tries=50):
            last = None
            for _ in range(tries):
                try:
                    with urllib.request.urlopen(base + path, timeout=2) as r:
                        return r.status, r.read(), r.headers
                except urllib.error.HTTPError as e:
                    if e.code in ok:
                        return e.code, b"", {}
                    last = e
                except Exception as e:
                    last = e
                time.sleep(0.2)
            raise AssertionError(f"GET {path} failed: {last}")

        status, body, _ = get("/")
        assert status == 200 and b"style_transfer_tpu" in body

        # /image is 404 before any iterate arrives
        status, _, _ = get("/image", ok=(404,))
        assert status == 404

        img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
        it = STIterate(w=16, h=16, i=1, i_max=10, loss=1.0, time=time.time(), gpu_ram=0)
        wi.put_iterate(it, img)

        deadline = time.time() + 20
        status = 404
        while time.time() < deadline and status == 404:
            status, body, headers = get("/image", ok=(404, 200))
            time.sleep(0.2)
        assert status == 200
        assert body[:2] == b"\xff\xd8"  # JPEG magic

        status, body, _ = get("/main.js")
        assert status == 200 and b"websocket" in body.lower()
        wi.put_done()
    finally:
        wi.close()
    assert not wi.process.is_alive()


def test_backpressure_drops_frames():
    port = free_port()
    wi = WebInterface("127.0.0.1", port, max_queue=2)
    try:
        img = np.zeros((8, 8, 3), np.float32)
        it = STIterate(w=8, h=8, i=1, i_max=1, loss=0.0, time=0.0, gpu_ram=0)
        for _ in range(50):  # must not block or raise
            wi.put_iterate(it, img)
    finally:
        wi.close()


def test_backpressure_without_qsize():
    """macOS regression guard: mp.Queue.qsize raises NotImplementedError
    there (sem_getvalue is unimplemented), so the backpressure path must
    never call it — frames drop via the bounded queue's put_nowait/Full
    instead (ref web_interface.py:44,130-131 is the capability anchor)."""

    def qsize_raises():
        raise NotImplementedError("qsize unsupported (macOS semantics)")

    port = free_port()
    wi = WebInterface("127.0.0.1", port, max_queue=2)
    try:
        wi.q.qsize = qsize_raises  # instance-attr shadow, like macOS
        img = np.zeros((8, 8, 3), np.float32)
        it = STIterate(w=8, h=8, i=1, i_max=1, loss=0.0, time=0.0, gpu_ram=0)
        for _ in range(50):  # must not block, raise, or touch qsize
            wi.put_iterate(it, img)
        wi.put_done()
    finally:
        wi.close()
