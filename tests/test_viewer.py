"""Live viewer protocol + in-training polling (reference network_gui,
gaussian_renderer/network_gui.py:26-86, polled in train.py:129-144)."""

import json
import socket
import struct
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.data.meshing import grid_cloth_mesh
from cloth_splatting_tpu.models import gaussians as G
from cloth_splatting_tpu.models.deform import init_residual_simulator
from cloth_splatting_tpu.ops.camera import Camera
from cloth_splatting_tpu.train.config import Config
from cloth_splatting_tpu.train.loop import _poll_viewer
from cloth_splatting_tpu.train.step import Trainer
from cloth_splatting_tpu.utils import viewer


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestViewerPolling:
    def test_request_render_roundtrip(self):
        rng = np.random.default_rng(0)
        mesh = grid_cloth_mesh(6, 6, size=1.2)
        cfg = Config()
        cfg.opt.raster_k_cap = 64
        cfg.opt.raster_k_chunk = 16
        params, gstate = G.init_from_mesh(rng, mesh, cfg.model.sh_degree, 2,
                                          capacity=256)
        sim = init_residual_simulator(rng, int(mesh.pos.shape[0]))
        preds = jnp.tile(mesh.pos[None], (2, 1, 1))
        fov = 2 * np.arctan(0.4)
        cam = Camera.create(R=np.eye(3), t=np.asarray([0.0, 0.0, 3.0]),
                            fovx=fov, fovy=fov, width=32, height=32, time=0.5)
        trainer = Trainer(cfg, mesh, preds, 32, 32, cam.tanfovx, cam.tanfovy,
                          2.0)
        state = trainer.init_state(rng, params, gstate, sim)

        port = _free_port()
        viewer.init("127.0.0.1", port)
        try:
            result = {}

            def client():
                c = socket.create_connection(("127.0.0.1", port), timeout=240)
                msg = json.dumps({
                    "world_view": np.asarray(cam.world_view).tolist(),
                    "full_proj": np.asarray(cam.full_proj).tolist(),
                    "width": 32, "height": 32, "time": 0.5,
                    "do_training": True, "keep_alive": False,
                }).encode()
                c.sendall(struct.pack("<I", len(msg)) + msg)
                (length,) = struct.unpack("<I", c.recv(4))
                buf = b""
                while len(buf) < length:
                    buf += c.recv(length - len(buf))
                result["img"] = np.frombuffer(buf, np.uint8)
                c.close()

            t = threading.Thread(target=client)
            t.start()
            # poll until the request is answered (accept + render + send);
            # deadline-based — a fixed poll count can finish before the
            # client thread is even scheduled under load
            import time

            deadline = time.time() + 300
            while t.is_alive() and time.time() < deadline:
                _poll_viewer(trainer, state, sh_degree=1)
                time.sleep(0.02)
            t.join(timeout=240)
            assert "img" in result
            assert result["img"].size == 32 * 32 * 3
            assert result["img"].max() > 0     # something rendered
            # keep_alive=False -> server dropped the connection
            assert viewer.conn is None
        finally:
            viewer.disconnect()
            if viewer._listener is not None:
                viewer._listener.close()


class TestSibrCodec:
    """The reference SIBR byte protocol (network_gui.py:43-86), exercised
    against hand-built frames — no sockets needed for the codec itself."""

    def _message(self, w=64, h=48):
        wv = np.arange(16, dtype=np.float32)
        vp = np.arange(16, 32, dtype=np.float32)
        return {
            "resolution_x": w, "resolution_y": h, "train": True,
            "fov_y": 0.8, "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": False, "scaling_modifier": 0.5,
            "view_matrix": wv.tolist(),
            "view_projection_matrix": vp.tolist(),
        }

    def test_decode_applies_sign_flips(self):
        cam, do_training, keep_alive, scaling = viewer.decode_sibr_message(
            self._message())
        assert cam["width"] == 64 and cam["height"] == 48
        assert do_training is True and keep_alive is False
        assert scaling == 0.5
        wv = np.asarray(cam["world_view"])
        raw = np.arange(16, dtype=np.float32).reshape(4, 4)
        # columns 1,2 sign-flipped (network_gui.py:75-76)
        np.testing.assert_allclose(wv[:, 0], raw[:, 0])
        np.testing.assert_allclose(wv[:, 1], -raw[:, 1])
        np.testing.assert_allclose(wv[:, 2], -raw[:, 2])
        np.testing.assert_allclose(wv[:, 3], raw[:, 3])
        fp = np.asarray(cam["full_proj"])
        raw_p = np.arange(16, 32, dtype=np.float32).reshape(4, 4)
        np.testing.assert_allclose(fp[:, 1], -raw_p[:, 1])
        np.testing.assert_allclose(fp[:, 2], raw_p[:, 2])

    def test_decode_zero_resolution_is_no_camera(self):
        msg = self._message(w=0, h=0)
        cam, *_ = viewer.decode_sibr_message(msg)
        assert cam is None

    def test_encode_reply_frame(self):
        img = bytes(range(12))
        frame = viewer.encode_sibr_reply(img, "/data/scene")
        # raw image (NOT length-prefixed), then LE length + ascii verify
        assert frame[:12] == img
        (n,) = struct.unpack("<I", frame[12:16])
        assert n == len("/data/scene")
        assert frame[16:] == b"/data/scene"

    def test_socket_roundtrip_sibr(self):
        """receive()/send() over a real socket pair with protocol='sibr'."""
        server, client = socket.socketpair()
        old_conn, old_proto = viewer.conn, viewer.protocol
        viewer.conn, viewer.protocol = server, "sibr"
        try:
            body = json.dumps(self._message()).encode()
            client.sendall(struct.pack("<I", len(body)) + body)
            cam, do_training, keep_alive, scaling = viewer.receive()
            assert cam is not None and cam["width"] == 64
            viewer.send(b"\x01\x02\x03", source_path="src")
            reply = client.recv(64)
            assert reply[:3] == b"\x01\x02\x03"
            (n,) = struct.unpack("<I", reply[3:7])
            assert reply[7:7 + n] == b"src"
        finally:
            viewer.conn, viewer.protocol = old_conn, old_proto
            server.close()
            client.close()
