"""Wire-protocol test for the live-viewer socket server: a fake SIBR viewer
connects, requests a frame at a custom pose, and receives raw RGB bytes plus
the length-prefixed verify string."""
import json
import math
import socket
import threading

import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.render import network_gui
from lightgaussian_tpu.utils.synthetic import random_scene

MAXI = 1 << 16


def _viewer_message(cam: Camera, train=True, keep_alive=False, scale=1.0) -> dict:
    # the viewer sends the reference's transposed-layout matrices with
    # columns 1,2 sign-flipped relative to ours
    wvt = np.asarray(cam.world_view).T.copy()
    wvt[:, 1] *= -1
    wvt[:, 2] *= -1
    fpt = np.asarray(cam.full_proj).T.copy()
    fpt[:, 1] *= -1
    fpt[:, 2] *= -1
    return {
        "resolution_x": cam.width,
        "resolution_y": cam.height,
        "train": train,
        "fov_y": 2.0 * math.atan(float(cam.tan_fovy)),
        "fov_x": 2.0 * math.atan(float(cam.tan_fovx)),
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": keep_alive,
        "scaling_modifier": scale,
        "view_matrix": wvt.reshape(-1).tolist(),
        "view_projection_matrix": fpt.reshape(-1).tolist(),
    }


def _send_msg(sock: socket.socket, payload: dict) -> None:
    raw = json.dumps(payload).encode("utf-8")
    sock.sendall(len(raw).to_bytes(4, "little") + raw)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def test_camera_from_message_roundtrip():
    cam = Camera.look_at((1.0, 0.5, 2.0), (0, 0, 0), fovx=0.9, width=48, height=32)
    rebuilt = network_gui.camera_from_message(_viewer_message(cam))
    np.testing.assert_allclose(
        np.asarray(rebuilt.world_view), np.asarray(cam.world_view), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rebuilt.full_proj), np.asarray(cam.full_proj), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rebuilt.camera_center), np.asarray(cam.camera_center), atol=1e-4
    )


def test_gui_serves_frame_over_socket():
    scene = random_scene(n=80, seed=0, extent=0.8, scale_range=(0.04, 0.1))
    bg = jnp.zeros(3)
    cam = Camera.look_at((2.0, 0.4, 1.5), (0, 0, 0), fovx=0.9, width=40, height=30)
    expected = network_gui.image_to_bytes(
        render(scene, cam, bg, max_instances=MAXI, interpret=True).render
    )

    gui = network_gui.NetworkGUI()
    gui.init("127.0.0.1", 0)  # ephemeral port
    port = gui.listener.getsockname()[1]

    def render_fn(c, scale_mod):
        return render(
            scene, c, bg, scale_modifier=scale_mod, max_instances=MAXI, interpret=True
        ).render

    server = threading.Thread(
        target=lambda: gui.poll(render_fn, "/data/scene", training_done=False)
    )

    client = socket.create_connection(("127.0.0.1", port), timeout=10)
    server.start()
    try:
        _send_msg(client, _viewer_message(cam, train=True, keep_alive=False))
        img = _recv_exact(client, cam.width * cam.height * 3)
        verify_len = int.from_bytes(_recv_exact(client, 4), "little")
        verify = _recv_exact(client, verify_len).decode("ascii")
        assert verify == "/data/scene"
        assert img == expected
    finally:
        server.join(timeout=30)
        client.close()
        gui.close()
    assert not server.is_alive()


def test_zero_resolution_means_no_frame():
    gui = network_gui.NetworkGUI()
    gui.init("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]
    client = socket.create_connection(("127.0.0.1", port), timeout=10)
    try:
        gui.try_connect()
        assert gui.conn is not None
        msg = _viewer_message(
            Camera.look_at((1, 0, 1), (0, 0, 0), width=16, height=16)
        )
        msg["resolution_x"] = 0
        _send_msg(client, msg)
        out = gui.receive()
        assert out == (None,) * 6
    finally:
        client.close()
        gui.close()
