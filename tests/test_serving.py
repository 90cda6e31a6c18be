"""Serving-layer tests: TAEHV decoder vs. the torch reference, streaming
overlap continuity, int8 quantized linears, WebSocket transport loopback
(reference demo_utils/taehv.py, demo.py)."""
import base64
import json
import socket
import struct
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models import taehv as taehv_mod
from tests.reference_loader import load_ref_module


def _torch_params_to_jax(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return taehv_mod.convert_taehv_state_dict(sd)


@pytest.fixture(scope="module")
def ref_taehv():
    import torch
    mod = load_ref_module("demo_utils/taehv.py", "ref_taehv")
    torch.manual_seed(0)
    model = mod.TAEHV(checkpoint_path=None)
    return mod, model


def test_taehv_decode_matches_torch(ref_taehv):
    import torch
    mod, model = ref_taehv
    params = _torch_params_to_jax(model)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = model.decode_video(torch.from_numpy(x), parallel=True,
                                 show_progress_bar=False).numpy()
    ref = ref[:, taehv_mod.FRAMES_TO_TRIM:]
    out = taehv_mod.decode_video(params, jnp.asarray(x), trim=True)
    assert out.shape == ref.shape  # [1, 9, 3, 64, 64]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_taehv_encode_matches_torch(ref_taehv):
    import torch
    mod, model = ref_taehv
    params = _torch_params_to_jax(model)
    rng = np.random.default_rng(7)
    x = rng.uniform(size=(1, 8, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_video(torch.from_numpy(x), parallel=True,
                                 show_progress_bar=False).numpy()
    out = taehv_mod.encode_video(params, jnp.asarray(x))
    assert out.shape == ref.shape  # [1, 2, 16, 8, 8]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_taehv_encode_decode_round_trip(ref_taehv):
    # encode -> decode round-trips through the latent space without
    # blowing up (shape contract: T px -> T/4 latents -> T-3 px).
    _, model = ref_taehv
    params = _torch_params_to_jax(model)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(size=(1, 8, 3, 64, 64)).astype(np.float32))
    lat = taehv_mod.encode_video(params, x)
    assert lat.shape == (1, 2, 16, 8, 8)
    px = taehv_mod.decode_video(params, lat, trim=True)
    assert px.shape == (1, 2 * 4 - taehv_mod.FRAMES_TO_TRIM, 3, 64, 64)
    assert np.isfinite(np.asarray(px)).all()


def test_taehv_streamer_matches_full_decode(ref_taehv):
    _, model = ref_taehv
    params = _torch_params_to_jax(model)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.normal(size=(1, 9, 16, 8, 8)).astype(np.float32))

    full = taehv_mod.decode_video(params, lat, trim=True)  # [1, 33, ...]

    s = taehv_mod.TAEHVStreamer(params, overlap=3)
    chunks = [s.decode_chunk(lat[:, i:i + 3]) for i in range(0, 9, 3)]
    streamed = jnp.concatenate(chunks, axis=1)
    assert streamed.shape == full.shape
    # overlap re-decode gives the reference demo's continuity — the first
    # 9 frames are exact; later chunks see only 3 frames of context
    # (demo.py:423-435), so allow a loose tolerance there.
    np.testing.assert_allclose(np.asarray(streamed[:, :9]),
                               np.asarray(full[:, :9]), rtol=2e-4, atol=2e-4)
    assert np.isfinite(np.asarray(streamed)).all()


def test_quantized_linear_accuracy():
    from self_forcing_tpu.ops.quant import (quantize_linear_params,
                                            quantized_linear)
    k = jax.random.PRNGKey(0)
    p = {"w": jax.random.normal(k, (256, 512)) * 0.02,
         "b": jnp.zeros((512,))}
    x = jax.random.normal(jax.random.fold_in(k, 1), (4, 256))
    ref = x @ p["w"] + p["b"]
    for mode, key, dt, tol in [("w8", "w_q", jnp.int8, 0.02),
                               ("w8a8", "w_qa", jnp.int8, 0.03),
                               ("fp8", "w_f8", jnp.float8_e4m3fn, 0.06)]:
        q = quantize_linear_params(p, mode=mode)
        assert q[key].dtype == dt
        out = quantized_linear(q, x)
        err = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
        assert err < tol, (mode, err)


def test_quantized_dit_forward():
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.models.wan.rope import RopeTables
    from self_forcing_tpu.ops.quant import quantize_dit_params
    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY,
                             dtype=jnp.float32)
    # the head is zero-init like the reference (causal_model.py:1128);
    # randomize it so the output is non-degenerate and rel-err meaningful
    params["head"]["head"]["w"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), params["head"]["head"]["w"].shape)
    rope = RopeTables.create(WAN_TINY.head_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, WAN_TINY.text_dim))
    ref = dit.forward_train(params, WAN_TINY, x, jnp.full((1, 2), 500.0),
                            ctx, None, rope, remat=False)
    for mode, key in [("w8", "w_q"), ("w8a8", "w_qa"), ("fp8", "w_f8")]:
        qp = quantize_dit_params(params, min_dim=64, mode=mode)
        assert key in qp["blocks"]["ffn"]["fc1"]
        out = dit.forward_train(qp, WAN_TINY, x, jnp.full((1, 2), 500.0),
                                ctx, None, rope, remat=False)
        assert np.isfinite(np.asarray(out)).all()
        err = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
        assert err < 0.25, (mode, err)  # quality toggle, not exactness


# ------------------------------------------------------------- websocket

def _client_handshake(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    key = base64.b64encode(b"0123456789abcdef").decode()
    s.sendall((f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
               f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    assert b"101" in resp.split(b"\r\n")[0]
    return s


def _client_send(s, event, data):
    payload = json.dumps({"event": event, "data": data}).encode()
    mask = b"\x01\x02\x03\x04"
    n = len(payload)
    if n < 126:
        head = bytes([0x81, 0x80 | n])
    else:
        head = bytes([0x81, 0x80 | 126]) + struct.pack(">H", n)
    masked = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    s.sendall(head + mask + masked)


def _client_recv(s):
    head = s.recv(2)
    n = head[1] & 0x7F
    if n == 126:
        n = struct.unpack(">H", s.recv(2))[0]
    elif n == 127:
        n = struct.unpack(">Q", s.recv(8))[0]
    buf = b""
    while len(buf) < n:
        buf += s.recv(n - len(buf))
    return json.loads(buf.decode())


def test_websocket_echo_server():
    from self_forcing_tpu.serving.websocket import make_server

    def handler(conn):
        while True:
            msg = conn.recv_event()
            if msg is None:
                return
            event, data = msg
            conn.send_event("echo_" + event, data)

    def route():
        return 200, "text/plain", b"ok"

    server = make_server("127.0.0.1", 0, {"/health": route}, handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        import urllib.request
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=5).read()
        assert body == b"ok"

        s = _client_handshake(port)
        _client_send(s, "ping_me", {"x": 1, "big": "z" * 500})
        msg = _client_recv(s)
        assert msg["event"] == "echo_ping_me"
        assert msg["data"]["x"] == 1
        assert len(msg["data"]["big"]) == 500
        s.close()
    finally:
        server.shutdown()


def test_websocket_fragmented_and_ping():
    """RFC 6455 fragmentation: a text frame with FIN=0 plus continuation
    frames delivers one event; interleaved pings are answered and a final
    client ping still gets a pong (regression: fragments were dropped)."""
    from self_forcing_tpu.serving.websocket import make_server

    def handler(conn):
        while True:
            msg = conn.recv_event()
            if msg is None:
                return
            event, data = msg
            conn.send_event("echo_" + event, data)

    server = make_server("127.0.0.1", 0, {}, handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        s = _client_handshake(port)
        payload = json.dumps({"event": "frag", "data": {"v": 7}}).encode()
        mask = b"\x05\x06\x07\x08"

        def frame(first_byte, chunk):
            masked = bytes(c ^ mask[i % 4] for i, c in enumerate(chunk))
            return bytes([first_byte, 0x80 | len(chunk)]) + mask + masked

        mid = len(payload) // 2
        s.sendall(frame(0x01, payload[:mid]))        # text, FIN=0
        # control frame between fragments (allowed by the RFC)
        s.sendall(frame(0x89, b"hb"))                # ping, FIN=1
        # pong comes back before the echo
        head = s.recv(2)
        assert head[0] & 0x0F == 0xA
        n = head[1] & 0x7F
        assert s.recv(n) == b"hb"
        s.sendall(frame(0x80, payload[mid:]))        # continuation, FIN=1
        msg = _client_recv(s)
        assert msg["event"] == "echo_frag"
        assert msg["data"]["v"] == 7
        s.close()
    finally:
        server.shutdown()


def test_demo_app_stream_and_busy():
    """DemoApp end-to-end over a real socket: frames arrive as base64
    JPEGs, a second start while busy is refused, completion clears busy."""
    import numpy as np
    import time as _time
    from self_forcing_tpu.serving.demo_server import DemoApp
    from self_forcing_tpu.serving.websocket import make_server

    started = threading.Event()
    release = threading.Event()

    class FakePipe:
        def stream(self, noise, context, rng=None):
            started.set()
            release.wait(timeout=10)   # hold busy until the test checks
            for _ in range(2):
                yield np.zeros((1, 1, 16, 4, 4), np.float32)

    app = DemoApp(FakePipe(), encode_text_fn=lambda p: np.zeros((1, 4, 8)),
                  decode_chunk_fn=lambda blk: np.zeros((2, 8, 8, 3),
                                                       np.uint8),
                  latent_shape=(1, 2, 16, 4, 4), fps=100.0)
    server = make_server("127.0.0.1", 0, {}, app.ws_handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        s = _client_handshake(port)
        _client_send(s, "start_generation", {"prompt": "x", "seed": 0})
        assert started.wait(timeout=10)
        s2 = _client_handshake(port)
        _client_send(s2, "start_generation", {"prompt": "y", "seed": 0})
        msg = _client_recv(s2)
        assert msg["event"] == "error" and msg["data"]["message"] == "busy"
        s2.close()
        release.set()
        events = []
        deadline = _time.time() + 20
        while _time.time() < deadline:
            msg = _client_recv(s)
            events.append(msg["event"])
            if msg["event"] == "generation_complete":
                break
        assert "frame_ready" in events and "block_ready" in events
        assert events[-1] == "generation_complete"
        for _ in range(100):
            if not app.busy:
                break
            _time.sleep(0.1)
        assert not app.busy
        s.close()
    finally:
        server.shutdown()


def test_demo_app_lookahead_overlap():
    """The generation loop must dispatch block N+1's work (generator
    resume + decode) BEFORE fetching block N's pixels, so the device never
    idles while the host JPEG-encodes (PERF.md serving overlap).  Also
    covers decode_chunk returning a lazy/device array: np.asarray is the
    only sync point."""
    from self_forcing_tpu.serving.demo_server import DemoApp

    order = []

    class LazyPixels:
        def __init__(self, i):
            self.i = i

        def __array__(self, dtype=None, copy=None):
            order.append(("fetch", self.i))
            return np.zeros((2, 8, 8, 3), np.uint8)

    class FakePipe:
        def stream(self, noise, context, rng=None):
            for i in range(3):
                order.append(("denoise", i))
                yield i

    class FakeConn:
        open = True

        def __init__(self):
            self.events = []

        def send_event(self, event, data):
            self.events.append(event)

    def decode(blk):
        order.append(("decode", blk))
        return LazyPixels(blk)

    app = DemoApp(FakePipe(), encode_text_fn=lambda p: np.zeros((1, 4, 8)),
                  decode_chunk_fn=decode, latent_shape=(1, 3, 16, 4, 4),
                  fps=100.0)
    conn = FakeConn()
    app._generate(conn, "prompt", 0)

    fetches = [order.index(("fetch", i)) for i in range(3)]
    assert order.index(("decode", 1)) < fetches[0]
    assert order.index(("denoise", 2)) < fetches[1]
    assert conn.events.count("block_ready") == 3
    assert conn.events[-1] == "generation_complete"


def test_demo_app_lookahead_flushes_pending_on_error():
    """If dispatching block N+1 raises, the already-decoded block N held
    by the lookahead must still reach the client before the error event
    (code-review regression: the held block was silently dropped)."""
    from self_forcing_tpu.serving.demo_server import DemoApp

    class FakePipe:
        def stream(self, noise, context, rng=None):
            yield 0
            raise RuntimeError("device poof")

    class FakeConn:
        open = True

        def __init__(self):
            self.events = []

        def send_event(self, event, data):
            self.events.append((event, data))

    app = DemoApp(FakePipe(), encode_text_fn=lambda p: np.zeros((1, 4, 8)),
                  decode_chunk_fn=lambda blk: np.zeros((2, 8, 8, 3),
                                                       np.uint8),
                  latent_shape=(1, 2, 16, 4, 4), fps=100.0)
    conn = FakeConn()
    app._generate(conn, "prompt", 0)
    names = [e for e, _ in conn.events]
    assert names.count("block_ready") == 1
    assert names.count("frame_ready") == 2
    assert "error" in names
    assert names.index("block_ready") < names.index("error")
    err = dict(conn.events)["error"]
    assert "device poof" in err["message"]


def test_demo_app_per_request_toggles():
    """Flipping taehv/quantize between two generations in one server
    lifetime swaps the decoder and the pipeline param tree per request
    (reference demo.py:581-584 reads enable_fp8/use_taehv out of each
    start_generation payload)."""
    import time as _time
    from self_forcing_tpu.serving.demo_server import DemoApp
    from self_forcing_tpu.serving.websocket import make_server

    used = []

    class FakePipe:
        params = "base"

        def stream(self, noise, context, rng=None):
            used.append(("params", self.params))
            yield np.zeros((1, 1, 16, 4, 4), np.float32)

    def wan_decode(blk):
        used.append(("decoder", "wan"))
        return np.zeros((1, 8, 8, 3), np.uint8)

    def tae_decode(blk):
        used.append(("decoder", "taehv"))
        return np.zeros((1, 8, 8, 3), np.uint8)

    app = DemoApp(FakePipe(), encode_text_fn=lambda p: np.zeros((1, 4, 8)),
                  decode_chunk_fn=wan_decode,
                  latent_shape=(1, 1, 16, 4, 4), fps=100.0,
                  taehv_decoder=(tae_decode, lambda: None),
                  quantized_params_fn=lambda: "int8")
    server = make_server("127.0.0.1", 0, {"/api/status": app.status},
                         app.ws_handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        s = _client_handshake(port)

        def run_one(payload):
            _client_send(s, "start_generation", dict(payload, prompt="p",
                                                     seed=0))
            deadline = _time.time() + 20
            while _time.time() < deadline:
                if _client_recv(s)["event"] == "generation_complete":
                    break
            for _ in range(100):
                if not app.busy:
                    return
                _time.sleep(0.05)

        run_one({})                                   # defaults: wan + base
        run_one({"taehv": True, "quantize": True})    # both speed modes
        run_one({"use_taehv": False, "enable_fp8": False})  # ref key names
        assert used == [
            ("params", "base"), ("decoder", "wan"),
            ("params", "int8"), ("decoder", "taehv"),
            ("params", "base"), ("decoder", "wan")]

        import urllib.request
        status = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/status", timeout=5).read())
        assert status["taehv_available"] and status["quantize_available"]
        assert status["taehv"] is False and status["quantize"] is False
        s.close()
    finally:
        server.shutdown()


def test_taehv_streamer_short_first_chunk(ref_taehv):
    """A first chunk shorter than the overlap (independent first frame)
    must not drop fresh pixel frames: frame counts stay 4*T_new per chunk
    (regression: skip was computed from the configured overlap, not the
    actual tail length)."""
    _, model = ref_taehv
    params = _torch_params_to_jax(model)
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.normal(size=(1, 7, 16, 8, 8)).astype(np.float32))

    s = taehv_mod.TAEHVStreamer(params, overlap=3)
    c0 = s.decode_chunk(lat[:, :1])     # 1-frame first block
    c1 = s.decode_chunk(lat[:, 1:4])
    c2 = s.decode_chunk(lat[:, 4:7])
    assert c0.shape[1] == 4 * 1 - taehv_mod.FRAMES_TO_TRIM
    assert c1.shape[1] == 12 and c2.shape[1] == 12
    total = c0.shape[1] + c1.shape[1] + c2.shape[1]
    full = taehv_mod.decode_video(params, lat, trim=True)
    assert total == full.shape[1]


def test_demo_app_blocks_and_progress():
    """Round-4 frontend parity surface: start_generation carries a
    'blocks' count (reference UI blocks slider) that resizes the noise,
    and the server announces generation_started with the progress
    denominator (expected pixel frames) before the first frame."""
    import numpy as np
    import time as _time
    from self_forcing_tpu.serving.demo_server import DemoApp
    from self_forcing_tpu.serving.websocket import make_server

    seen_shapes = []

    class FakePipe:
        class cfg:
            num_frame_per_block = 2
            independent_first_frame = False

        def stream(self, noise, context, rng=None):
            seen_shapes.append(tuple(noise.shape))
            for _ in range(noise.shape[1] // 2):
                yield np.zeros((1, 2, 16, 4, 4), np.float32)

    app = DemoApp(FakePipe(), encode_text_fn=lambda p: np.zeros((1, 4, 8)),
                  decode_chunk_fn=lambda blk: np.zeros((2, 8, 8, 3),
                                                       np.uint8),
                  latent_shape=(1, 6, 16, 4, 4), fps=100.0)
    server = make_server("127.0.0.1", 0, {}, app.ws_handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        s = _client_handshake(port)
        _client_send(s, "start_generation",
                     {"prompt": "x", "seed": 0, "blocks": 2})
        events = {}
        deadline = _time.time() + 20
        while _time.time() < deadline:
            msg = _client_recv(s)
            events.setdefault(msg["event"], msg["data"])
            if msg["event"] == "generation_complete":
                break
        # blocks=2 x nb=2 -> 4 latent frames (not the default 6)
        assert seen_shapes == [(1, 4, 16, 4, 4)], seen_shapes
        assert events["generation_started"]["latent_frames"] == 4
        assert events["generation_started"]["expected_frames"] == 13
        assert "generation_complete" in events
        s.close()
    finally:
        server.shutdown()


@pytest.mark.slow
def test_demo_app_windowed_soak_flat():
    """Windowed infinite-streaming soak through the REAL product surface
    (VERDICT r4 next #3): stream 40 blocks of a windowed-config
    CausalInferencePipeline through DemoApp over the real WebSocket and
    assert (a) every frame arrives, (b) the per-block wall time the
    server reports stays FLAT — the constant-cost-at-any-length claim
    (reference wan/modules/causal_model.py:203-229 rolling window;
    demo.py:331-458 block loop) — and (c) the KV buffer stays at its
    configured size across the ~17 host-scheduled compactions (bounded
    memory).  A global config's cost would grow linearly over 40 blocks.
    """
    import time as _time
    from self_forcing_tpu.config import Config
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WanConfig
    from self_forcing_tpu.pipelines.causal_inference import (
        CausalInferencePipeline)
    from self_forcing_tpu.serving.demo_server import DemoApp
    from self_forcing_tpu.serving.websocket import make_server

    cfg = WanConfig(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                    text_dim=32, freq_dim=16, num_frame_per_block=2,
                    local_attn_size=4, sink_size=1,
                    windowed_buffer_frames=8)
    args = Config({"denoising_step_list": [1000, 500],
                   "warp_denoising_step": False, "timestep_shift": 5.0,
                   "num_frame_per_block": 2,
                   "independent_first_frame": False, "context_noise": 0})
    params = dit.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    pipe = CausalInferencePipeline(args, params, cfg)
    ctx = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                       (1, 8, 32), jnp.float32))

    app = DemoApp(pipe, encode_text_fn=lambda p: ctx,
                  decode_chunk_fn=lambda blk: np.zeros((2, 8, 8, 3),
                                                       np.uint8),
                  latent_shape=(1, 6, 16, 8, 8), fps=1000.0)
    server = make_server("127.0.0.1", 0, {}, app.ws_handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    n_blocks = 40
    try:
        s = _client_handshake(port)
        s.settimeout(120)
        _client_send(s, "start_generation",
                     {"prompt": "soak", "seed": 3, "blocks": n_blocks})
        block_s, frames, complete = [], 0, False
        deadline = _time.time() + 600
        while _time.time() < deadline:
            msg = _client_recv(s)
            if msg["event"] == "block_ready":
                block_s.append(msg["data"]["block_s"])
            elif msg["event"] == "frame_ready":
                frames += 1
            elif msg["event"] == "generation_complete":
                complete = True
                break
            elif msg["event"] == "error":
                raise AssertionError(msg["data"])
        s.close()
    finally:
        server.shutdown()

    assert complete, (len(block_s), frames)
    assert len(block_s) == n_blocks, len(block_s)
    assert frames == n_blocks * 2, frames
    # flatness: post-warmup medians must not drift (blocks 1-3 include
    # the denoise/refresh/compaction compiles; a generous 2x bound keeps
    # the 1-core CI host's scheduling noise out while still refuting
    # linear growth, which would be ~4x between these windows)
    early = sorted(block_s[5:15])[5]
    late = sorted(block_s[-10:])[5]
    assert late <= 2.0 * early + 0.05, (early, late, block_s)
    # bounded memory: the append-only buffer never grew past its
    # configured 8-frame size (fs = 4*4 tokens at 8x8 latents)
    k = pipe._cache.k
    assert k.shape[2] == 8 * 16, k.shape


def test_taehv_stateful_stream_equals_full_decode(ref_taehv):
    """The stateful streaming decode (decode_video_stateful) is EXACTLY
    the whole-video decode, chunked — the mem-layer carry replaces the
    reference demo's approximate 3-latent overlap re-decode
    (demo.py:423-435) at half the steady-state FLOPs."""
    _, model = ref_taehv
    params = _torch_params_to_jax(model)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 9, 16, 8, 8),
                          jnp.float32)
    full = np.asarray(taehv_mod.decode_video(params, x, trim=True))

    streamer = taehv_mod.TAEHVStreamer(params)          # stateful default
    chunks = [np.asarray(streamer.decode_chunk(x[:, i:i + 3]))
              for i in range(0, 9, 3)]
    out = np.concatenate(chunks, axis=1)
    assert out.shape == full.shape
    np.testing.assert_allclose(out, full, rtol=2e-5, atol=2e-5)

    # short first chunk (the independent-first-frame serving case)
    streamer.reset()
    chunks = [np.asarray(streamer.decode_chunk(x[:, :1]))] + \
        [np.asarray(streamer.decode_chunk(x[:, i:i + 4]))
         for i in range(1, 9, 4)]
    out = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(out, full, rtol=2e-5, atol=2e-5)


def test_taehv_int8_decoder_accuracy(ref_taehv):
    """Opt-in int8 W8A8 TAEHV decoder (taehv.quantize_decoder_params):
    per-channel weight + per-tensor activation quantization through the
    whole decoder stack stays in the int8-noise class vs the f32 decode
    (the demo DiT's int8-linear quality class, PERF.md)."""
    _, model = ref_taehv
    params = _torch_params_to_jax(model)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 6, 16, 8, 8),
                          jnp.float32)
    full = np.asarray(taehv_mod.decode_video(params, x, trim=True))
    qp = taehv_mod.quantize_decoder_params(params)
    quant = np.asarray(taehv_mod.decode_video(qp, x, trim=True))
    assert quant.shape == full.shape
    rel = np.abs(quant - full).mean() / (np.abs(full).mean() + 1e-8)
    assert rel < 0.08, rel
    # the stateful streamer path accepts the quantized tree too
    streamer = taehv_mod.TAEHVStreamer(qp)
    chunks = [np.asarray(streamer.decode_chunk(x[:, i:i + 3]))
              for i in range(0, 6, 3)]
    out = np.concatenate(chunks, axis=1)
    np.testing.assert_allclose(out, quant, rtol=2e-3, atol=2e-3)
