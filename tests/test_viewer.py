"""Browser viewer server: stream, status, and event round-trip
(sapien.utils.Viewer analog — maniskill_tpu/viewer/server.py)."""
import json
import urllib.request

import numpy as np


def test_viewer_roundtrip():
    from maniskill_tpu.viewer import BrowserViewer

    v = BrowserViewer(port=0, host="127.0.0.1")
    try:
        base = f"http://127.0.0.1:{v.port}"

        # index page serves the client
        html = urllib.request.urlopen(f"{base}/", timeout=5).read()
        assert b"/stream" in html and b"api/event" in html

        # status round-trip
        v.set_status({"step": 3, "success": True})
        got = json.loads(
            urllib.request.urlopen(f"{base}/api/status", timeout=5).read()
        )
        assert got["step"] == 3 and got["success"] is True

        # push a frame, then read one multipart JPEG part off the stream
        frame = np.zeros((32, 48, 3), np.uint8)
        frame[:, :, 0] = 255
        v.push_frame(frame)
        r = urllib.request.urlopen(f"{base}/stream", timeout=5)
        assert "multipart/x-mixed-replace" in r.headers["Content-Type"]
        head = r.readline()  # --f
        assert head.strip() == b"--f"
        ctype = r.readline()
        assert b"image/jpeg" in ctype
        clen = int(r.readline().split(b":")[1])
        r.readline()  # blank
        jpeg = r.read(clen)
        assert jpeg[:2] == b"\xff\xd8"  # JPEG SOI marker

        # browser -> sim event queue
        req = urllib.request.Request(
            f"{base}/api/event",
            data=json.dumps({"type": "key", "key": "w"}).encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req, timeout=5).status == 204
        evs = v.poll_events()
        assert evs == [{"type": "key", "key": "w"}]
    finally:
        v.close()
