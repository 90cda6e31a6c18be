"""Streaming demo app (reference demo.py) — block-by-block generation with
immediate per-frame push to the browser.

Architecture mirrors the reference (demo.py:155-238,242-506):
- a generation thread runs the chunk-wise AR pipeline, enqueueing frames;
- a sender thread drains the queue and pushes 'frame_ready' events with
  base64 JPEGs at the client-controlled FPS;
- WebSocket events: start_generation / stop_generation / set_fps
  (SocketIO events, demo.py:553-631), plus /api/status JSON (demo.py:
  618-626) with HBM telemetry instead of VRAM.

The TPU win the reference can't have: denoising of block N+1 overlaps the
VAE decode + JPEG encode of block N for free, because JAX dispatch is
async — the host thread only blocks when fetching pixels.
"""
from __future__ import annotations

import base64
import json
import os
import queue
import threading
import time
from typing import Optional

import numpy as np

from self_forcing_tpu.serving.websocket import (WebSocketConnection,
                                                make_server)
from self_forcing_tpu.utils.memory import get_hbm_stats


def _encode_jpeg(frame_u8: np.ndarray, quality: int = 85) -> bytes:
    import cv2
    ok, buf = cv2.imencode(".jpg", frame_u8[..., ::-1],
                           [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    assert ok
    return buf.tobytes()


class DemoApp:
    """Wires a CausalInferencePipeline + VAE streamer to the WS transport."""

    def __init__(self, pipeline, encode_text_fn, decode_chunk_fn,
                 latent_shape=(1, 21, 16, 60, 104), fps: float = 6.0,
                 reset_decoder_fn=None, taehv_decoder=None,
                 quantized_params_fn=None, default_taehv: bool = False,
                 default_quantize: bool = False):
        """``taehv_decoder``: optional (decode_fn, reset_fn) pair for the
        fast-VAE mode; ``quantized_params_fn``: lazy builder of the int8
        DiT param tree.  Both make the speed modes per-request toggles
        read out of each start_generation payload, like the reference
        (demo.py:581-584 enable_fp8 / use_taehv); the CLI flags become
        the defaults for requests that don't specify."""
        self.pipeline = pipeline
        self.encode_text = encode_text_fn
        self.decode_chunk = decode_chunk_fn  # latents [B,nb,C,h,w] -> u8 px
        # called at the start of every generation: streaming decoders
        # carry temporal caches (VAE feat cache / TAEHV tail) that must
        # not leak the previous video's state into the next one
        self.reset_decoder = reset_decoder_fn
        self._decoders = {"wan": (decode_chunk_fn, reset_decoder_fn)}
        if taehv_decoder is not None:
            self._decoders["taehv"] = tuple(taehv_decoder)
        self._quantized_params_fn = quantized_params_fn
        self._base_params = getattr(pipeline, "params", None)
        self._quantized_params = None
        self.default_taehv = bool(default_taehv)
        self.default_quantize = bool(default_quantize)
        self.active_taehv = self.default_taehv and "taehv" in self._decoders
        self.active_quantize = (self.default_quantize
                                and quantized_params_fn is not None)
        self.latent_shape = tuple(latent_shape)
        self.fps = fps
        self.stop_event = threading.Event()
        self.busy = False
        self._busy_lock = threading.Lock()
        self._owner_conn = None  # connection that started the active run

    def _apply_toggles(self, data: dict):
        """Per-request speed modes (reference demo.py:581-584): accepts
        both our key names (taehv/quantize) and the reference frontend's
        (use_taehv/enable_fp8).  Runs between generations only — the
        caller holds the busy claim."""
        want_taehv = bool(data.get(
            "taehv", data.get("use_taehv", self.default_taehv)))
        if want_taehv and "taehv" not in self._decoders:
            want_taehv = False  # no checkpoint loaded at server start
        self.decode_chunk, self.reset_decoder = \
            self._decoders["taehv" if want_taehv else "wan"]
        self.active_taehv = want_taehv

        want_quant = bool(data.get(
            "quantize", data.get("enable_fp8", self.default_quantize)))
        if want_quant and self._quantized_params_fn is None \
                and self._quantized_params is None:
            want_quant = False
        if self._base_params is not None:
            import dataclasses
            if want_quant:
                if self._quantized_params is None:
                    self._quantized_params = self._quantized_params_fn()
                self.pipeline.params = self._quantized_params
            else:
                self.pipeline.params = self._base_params
            # int8 mode also switches the attention kernel; the VARIANT
            # is chip-keyed (ops/chip.py: int8-QK/bf16-PV on v5e where
            # full-int8 is VPU-bound, full-int8 on v6e where the 2x
            # int8:VPU ratio makes it pay — the reference's
            # FA3-on-Hopper-style hardware dispatch,
            # wan/modules/attention.py:4-20)
            cfg = getattr(self.pipeline, "cfg", None)
            if cfg is not None and hasattr(cfg, "attn_quant"):
                from self_forcing_tpu.ops.chip import chip_defaults
                want_aq = (chip_defaults()["demo_attn_quant"]
                           if want_quant else None)
                if cfg.attn_quant != want_aq:
                    self.pipeline.cfg = dataclasses.replace(
                        cfg, attn_quant=want_aq)
        self.active_quantize = want_quant

    # --------------------------------------------------------- generation
    def _latent_frames_for(self, blocks) -> int:
        """Requested video length in latent frames (the reference UI's
        blocks slider, templates/demo.html + demo.py:581-592): clamp to
        [1, 40] blocks; the block size comes from the pipeline config."""
        cfg = getattr(self.pipeline, "cfg", None)
        nb = int(getattr(cfg, "num_frame_per_block", 3) or 3)
        default_f = self.latent_shape[1]
        if blocks is None:
            return default_f
        # windowed configs stream at constant memory/cost, so any length
        # goes; a GLOBAL config's KV cache grows with the video, so cap
        # at the configured default (a 21-frame global cache is ~6 GB at
        # 1.3B — 40 blocks would be ~34 GB)
        windowed = getattr(cfg, "local_attn_size", -1) != -1
        cap = 40 if windowed else max(1, default_f // nb)
        try:
            b = max(1, min(cap, int(blocks)))
        except (TypeError, ValueError):
            return default_f
        if bool(getattr(getattr(self.pipeline, "cfg", None),
                        "independent_first_frame", False)):
            return 1 + b * nb
        return b * nb

    def _generate(self, conn: WebSocketConnection, prompt: str, seed: int,
                  latent_frames: int | None = None):
        import jax
        import jax.numpy as jnp
        self.stop_event.clear()
        if self.reset_decoder is not None:
            self.reset_decoder()
        frame_q: queue.Queue = queue.Queue(maxsize=256)

        def sender():
            idx = 0
            while True:
                item = frame_q.get()
                if item is None:
                    break
                t0 = time.time()
                try:
                    jpg = _encode_jpeg(item)
                    conn.send_event("frame_ready", {
                        "frame_id": idx,
                        "jpeg": base64.b64encode(jpg).decode(),
                    })
                except Exception:  # noqa: BLE001 — a bad frame/encoder
                    # must not kill the drain loop (the generation thread
                    # blocks on the bounded queue if nobody drains it)
                    pass
                idx += 1
                # fps is client-controlled; clamp so set_fps 0 can't
                # divide by zero and kill the sender
                delay = max(0.0, 1.0 / max(self.fps, 0.1)
                            - (time.time() - t0))
                if delay:
                    time.sleep(delay)
            conn.send_event("generation_complete", {"frames": idx})

        def put_frame(f) -> bool:
            """Bounded put that aborts on stop/disconnect instead of
            blocking forever if the sender died or the client stalled."""
            while not self.stop_event.is_set():
                try:
                    frame_q.put(f, timeout=1.0)
                    return True
                except queue.Full:
                    if not sender_t.is_alive() or not conn.open:
                        return False
            return False

        sender_t = threading.Thread(target=sender, daemon=True)
        sender_t.start()
        t_start = time.time()
        n_blocks = 0
        # One-block lookahead: fetch block N's pixels only AFTER the
        # generator has dispatched block N+1's work (refresh + denoise)
        # — the host-side fetch + frame enqueue then overlaps device
        # compute instead of idling the chip for an RTT per block.
        # decode_chunk may return a device array; np.asarray is the
        # only synchronization point.
        pending = None

        t_block = [time.time()]

        def flush_pending():
            nonlocal pending, n_blocks
            if pending is None:
                return
            frames, pending = np.asarray(pending), None
            n_blocks += 1
            now = time.time()
            conn.send_event("block_ready", {
                "block": n_blocks,
                "block_s": round(now - t_block[0], 3),
                "elapsed_s": round(now - t_start, 3)})
            t_block[0] = now
            for f in frames:
                if not put_frame(f):
                    break

        try:
            context = self.encode_text([prompt])
            rng = jax.random.PRNGKey(seed)
            shape = list(self.latent_shape)
            if latent_frames is not None:
                shape[1] = latent_frames
            noise = jax.random.normal(rng, tuple(shape), jnp.bfloat16)
            # progress denominator for the client's progress bar
            # (reference demo.py:553-560 progress events): latent F ->
            # pixel frames under the Wan VAE's 4x temporal expansion
            conn.send_event("generation_started", {
                "latent_frames": shape[1],
                "expected_frames": (shape[1] - 1) * 4 + 1,
            })
            t_start = time.time()
            t_block[0] = t_start
            gen = self.pipeline.stream(noise, context, rng=rng)
            while not self.stop_event.is_set():
                blk = next(gen, None)
                px = self.decode_chunk(blk) if blk is not None else None
                flush_pending()
                pending = px
                if blk is None:
                    break
        except Exception as e:  # noqa: BLE001 (reference demo.py:489-506)
            # deliver the already-decoded held block before reporting: a
            # failure while dispatching block N+1 must not eat block N
            try:
                flush_pending()
            except Exception:  # noqa: BLE001 — the flush itself may sync
                pass           # a poisoned device array; error wins then
            conn.send_event("error", {"message": str(e)})
        finally:
            try:
                frame_q.put(None, timeout=1.0)
            except queue.Full:
                pass  # sender dead; nothing to signal
            sender_t.join(timeout=30)
            self.busy = False

    # --------------------------------------------------------- transport
    def ws_handler(self, conn: WebSocketConnection):
        while True:
            msg = conn.recv_event()
            if msg is None:
                # stop on disconnect ONLY if this connection owns the
                # active generation — another client dropping (e.g. one
                # just refused with 'busy') must not kill the run
                if self._owner_conn is conn:
                    self.stop_event.set()
                return
            event, data = msg
            data = data or {}
            if event == "start_generation":
                # claim busy HERE (handler thread, under the lock) — the
                # spawned thread setting it raced a double-click past the
                # guard into two concurrent generations
                with self._busy_lock:
                    if self.busy:
                        claimed = False
                    else:
                        self.busy = True
                        claimed = True
                if not claimed:
                    conn.send_event("error", {"message": "busy"})
                    continue
                self._owner_conn = conn
                self._apply_toggles(data)
                t = threading.Thread(
                    target=self._generate,
                    args=(conn, data.get("prompt", ""),
                          int(data.get("seed", 0)),
                          self._latent_frames_for(data.get("blocks"))),
                    daemon=True)
                t.start()
            elif event == "stop_generation":
                self.stop_event.set()
                conn.send_event("generation_stopped", {})
            elif event == "set_fps":
                try:
                    self.fps = max(0.1, float(data.get("fps", self.fps)))
                except (TypeError, ValueError):
                    pass

    def status(self):
        hbm = get_hbm_stats()
        body = json.dumps({
            "busy": self.busy,
            "fps": self.fps,
            "taehv": self.active_taehv,
            "quantize": self.active_quantize,
            "taehv_available": "taehv" in self._decoders,
            "quantize_available": (self._quantized_params_fn is not None
                                   or self._quantized_params is not None),
            "hbm_free_gb": round(
                (hbm["bytes_limit"] - hbm["bytes_in_use"]) / 1024 ** 3, 2),
            "hbm_in_use_gb": round(hbm["bytes_in_use"] / 1024 ** 3, 2),
        }).encode()
        return 200, "application/json", body

    def index(self):
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "templates", "demo.html")
        with open(path, "rb") as f:
            return 200, "text/html", f.read()

    def serve(self, host: str = "0.0.0.0", port: int = 5001):
        server = make_server(host, port,
                             routes={"/": self.index,
                                     "/api/status": self.status},
                             ws_handler=self.ws_handler)
        print(f"demo server on http://{host}:{port}")
        server.serve_forever()
