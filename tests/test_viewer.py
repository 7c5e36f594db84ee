"""Viewer bridge: wire-protocol round trip over a real socket."""

import json
import socket
import threading

import numpy as np

from rain_tpu.viewer.network_gui import NetworkGUI


def _send_msg(sock, payload: dict):
    data = json.dumps(payload).encode("utf-8")
    sock.sendall(len(data).to_bytes(4, "little"))
    sock.sendall(data)


def _recv_reply(sock, image_bytes_len):
    img = b""
    while len(img) < image_bytes_len:
        img += sock.recv(image_bytes_len - len(img))
    n = int.from_bytes(sock.recv(4), "little")
    verify = sock.recv(n).decode("ascii")
    return img, verify


def test_viewer_roundtrip():
    gui = NetworkGUI("127.0.0.1", 16009)
    W = H = 8

    wv = np.eye(4, dtype=np.float32)
    payload = {
        "resolution_x": W, "resolution_y": H, "train": True,
        "fov_y": 0.8, "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": False, "scaling_modifier": 1.0,
        "view_matrix": wv.flatten().tolist(),
        "view_projection_matrix": wv.flatten().tolist(),
    }

    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", gui.port), timeout=5)
        _send_msg(s, payload)
        result["reply"] = _recv_reply(s, W * H * 3)
        # a zero-resolution message (viewer keepalive) then disconnect
        _send_msg(s, dict(payload, resolution_x=0, resolution_y=0))
        n = int.from_bytes(s.recv(4), "little")
        s.recv(n)
        s.close()

    t = threading.Thread(target=client)
    t.start()

    calls = []

    def render_fn(cam, scaling_modifier):
        calls.append(cam)
        assert cam["width"] == W and cam["height"] == H
        # axis flips + transpose applied: identity row-vector matrix with
        # flipped Y/Z columns transposed back
        assert cam["world_view"].shape == (4, 4)
        img = np.full((H, W, 3), 7, np.uint8)
        return memoryview(img.copy())

    # poll until the connection is accepted and the render request served
    # (the listener is non-blocking, so the first handle calls may no-op
    # before the client connects)
    import time
    for _ in range(100):
        gui.handle(render_fn, "srcpath", training_done=False)
        if calls:
            break
        time.sleep(0.05)
    # consume the zero-resolution message + disconnect
    gui.handle(render_fn, "srcpath", training_done=False)
    t.join(timeout=5)

    img, verify = result["reply"]
    assert verify == "srcpath"
    assert img == bytes(np.full((H, W, 3), 7, np.uint8))
    assert len(calls) == 1
