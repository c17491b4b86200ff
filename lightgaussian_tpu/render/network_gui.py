"""Live-viewer TCP protocol (SIBR remote viewer compatible).

Wire-compatible build of `/root/reference/gaussian_renderer/network_gui.py`:
a non-blocking TCP listener; inbound messages are 4-byte little-endian
length-prefixed JSON carrying resolution, FoVs, near/far, training toggles,
a scaling modifier, and row-major *transposed* view / view-projection matrices
(columns 1,2 sign-flipped on receipt, `network_gui.py:79-85`); outbound is the
raw HxWx3 uint8 render followed by a length-prefixed verify string
(`network_gui.py:54-59`).

State lives in a `NetworkGUI` object instead of module globals; module-level
`init/try_connect/receive/send` wrappers keep the reference's call shape for
drop-in use in training loops (`train_densify_prune.py:75-106`).
"""
from __future__ import annotations

import json
import math
import socket
import traceback

import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.models.camera import Camera


def camera_from_message(message: dict) -> Camera | None:
    """Build a render Camera from a viewer message (`network_gui.py:62-111`).

    The viewer sends the reference's transposed-layout matrices; flipping
    their columns 1,2 and transposing yields our column-vector w2c / w2clip.
    """
    width = int(message["resolution_x"])
    height = int(message["resolution_y"])
    if width == 0 or height == 0:
        return None
    wvt = np.array(message["view_matrix"], np.float32).reshape(4, 4)
    wvt[:, 1] *= -1
    wvt[:, 2] *= -1
    fpt = np.array(message["view_projection_matrix"], np.float32).reshape(4, 4)
    fpt[:, 1] *= -1
    fpt[:, 2] *= -1
    world_view = wvt.T
    full_proj = fpt.T
    cam_center = np.linalg.inv(world_view)[:3, 3]
    return Camera(
        world_view=jnp.asarray(world_view),
        full_proj=jnp.asarray(full_proj),
        camera_center=jnp.asarray(cam_center.astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(float(message["fov_x"]) / 2.0)),
        tan_fovy=jnp.float32(math.tan(float(message["fov_y"]) / 2.0)),
        width=width,
        height=height,
    )


def image_to_bytes(img) -> bytes:
    """[3, H, W] float render -> the viewer's HxWx3 uint8 byte stream."""
    arr = np.asarray(jnp.clip(img, 0.0, 1.0))
    return np.ascontiguousarray(
        (arr * 255.0).astype(np.uint8).transpose(1, 2, 0)
    ).tobytes()


class NetworkGUI:
    def __init__(self):
        self.listener: socket.socket | None = None
        self.conn: socket.socket | None = None
        self.addr = None

    def init(self, host: str, port: int) -> None:
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self) -> None:
        if self.listener is None:
            return
        try:
            self.conn, self.addr = self.listener.accept()
            print(f"\nConnected by {self.addr}")
            self.conn.settimeout(None)
        except OSError:
            pass

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def read(self) -> dict:
        n = int.from_bytes(self._recv_exact(4), "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def send(self, image_bytes: bytes | None, verify: str) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """-> (camera|None, do_training, shs_python, rot_scale_python,
        keep_alive, scaling_modifier) — the reference's tuple shape."""
        message = self.read()
        if int(message["resolution_x"]) == 0 or int(message["resolution_y"]) == 0:
            return None, None, None, None, None, None
        try:
            cam = camera_from_message(message)
        except Exception:
            traceback.print_exc()
            raise
        return (
            cam,
            bool(message["train"]),
            bool(message["shs_python"]),
            bool(message["rot_scale_python"]),
            bool(message["keep_alive"]),
            float(message["scaling_modifier"]),
        )

    def poll(self, render_fn, source_path: str, training_done: bool) -> None:
        """One training-iteration GUI service pass
        (`train_densify_prune.py:75-106`): accept a pending connection, then
        answer view requests until the viewer lets training proceed."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                image_bytes = None
                cam, do_training, _, _, keep_alive, scale_mod = self.receive()
                if cam is not None:
                    image_bytes = image_to_bytes(render_fn(cam, scale_mod))
                self.send(image_bytes, source_path)
                if do_training and (not training_done or not keep_alive):
                    break
            except Exception:
                self.conn = None

    def close(self) -> None:
        for s in (self.conn, self.listener):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass
        self.conn = self.listener = None


# Module-level instance mirroring the reference's global API.
_default = NetworkGUI()
init = _default.init
try_connect = _default.try_connect
receive = _default.receive
send = _default.send
poll = _default.poll
close = _default.close


def conn():
    return _default.conn
