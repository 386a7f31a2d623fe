"""Compute-node inference server.

Re-implementation of the reference's Flask endpoint (app/computeroot/
cv_endpoint.py) on the stdlib HTTP server (Flask is not a dependency of
this framework): same three routes with the same request/response
contracts —

  POST /cv_algo/        base64-JSON image → {fen, position,
                        confidence_scores, processing_time} + CORS
                        (cv_endpoint.py:136-192).  The reference's
                        ``confidence_scores`` crash (field referenced but
                        never defined, cv_endpoint.py:169) is fixed: real
                        per-square max probabilities are returned.
  POST /classify_image  multipart variant (cv_endpoint.py:195-251)
  POST /feedback/       persists user corrections as JSON
                        (cv_endpoint.py:254-295)
  GET  /ping            liveness probe

Uploads are persisted under user_uploads/{raw,boards} when not in LOCAL
mode (cv_endpoint.py:174-187) — asynchronously, off a bounded queue, so
production requests ride the same micro-batched engine path as local mode
(the engine's serve program returns the extracted board without the
logits buffer).  The model is eager-loaded at startup like the reference
(cv_endpoint.py:131-133).

Run: python -m chessvision_tpu.serve.server --port 7777 [--local]
"""

from __future__ import annotations

import argparse
import base64
import datetime
import json
import logging
import os
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any

import numpy as np

from chessvision_tpu.chessboard import expand_fen

logger = logging.getLogger(__name__)


def fen_2_json(fen: str) -> dict[str, str]:
    """Per-square piece map for the web client (cv_endpoint.py:121-127)."""
    expanded = expand_fen(fen)
    out: dict[str, str] = {}
    i = 0
    for rank in range(8, 0, -1):
        for file in "abcdefgh":
            piece = expanded[i]
            i += 1
            if piece != ".":
                out[f"{file}{rank}"] = piece
    return out


def init_uploads_folder(root: str | Path) -> Path:
    """Create the uploads tree incl. the 13 per-class square dirs (the
    reference's make_uploads_folder.sh; '_x' naming for black pieces to
    survive case-insensitive filesystems, cv_endpoint.py:33-35)."""
    root = Path(root)
    for sub in ("raw", "boards", "feedback"):
        (root / sub).mkdir(parents=True, exist_ok=True)
    for label in ("B", "K", "N", "P", "Q", "R", "_b", "_k", "_n", "_p", "_q", "_r", "f"):
        (root / "squares" / label).mkdir(parents=True, exist_ok=True)
    return root


def clean_uploads_folder(root: str | Path) -> None:
    """Purge and recreate the uploads tree (clean_uploads_folder.sh)."""
    import shutil

    root = Path(root)
    if root.exists():
        shutil.rmtree(root)
    init_uploads_folder(root)


class _MicroBatcher:
    """Coalesces concurrent requests into ONE engine batch.

    The engine is batched end-to-end, so N simultaneous uploads cost one
    fused device program instead of N serialized B=1 calls (~the
    difference between ~5 req/s and hundreds under load).  A worker
    thread drains whatever is queued (no added latency when idle — the
    first request is processed immediately), groups by (flip, shape),
    and pads each group to the next power of two so at most log2(cap)
    batch shapes ever compile.  The reference's Flask endpoint has no
    analogue — every request pays a full per-image pipeline
    (cv_endpoint.py:136-192)."""

    def __init__(
        self,
        engine: Any,
        max_batch: int = 16,
        timeout_s: float = 900.0,
        include_board: bool = False,
    ) -> None:
        import queue

        self.engine = engine
        self.max_batch = max_batch
        # production (persisting) mode also needs the extracted board — the
        # engine's serve program returns it without the logits buffer
        self.include_board = include_board
        # generous: a COLD batch shape pays a full remote XLA compile,
        # which is minutes on this backend (CLAUDE.md) — the timeout only
        # needs to catch a dead worker, so it sits above worst-case
        # compile; warmed shapes answer in well under a second
        self.timeout_s = timeout_s
        # bounded: a wedged (not dead) worker must shed load with 503s, not
        # accumulate one ~512 KB image per timed-out retry forever
        self.q: "queue.Queue" = queue.Queue(maxsize=max(64, 8 * max_batch))
        self._queue_mod = queue
        t = threading.Thread(target=self._loop, daemon=True, name="cv-microbatch")
        t.start()

    def submit(
        self, img: np.ndarray, flip: bool
    ) -> tuple[bool, str, np.ndarray, np.ndarray | None]:
        ev = threading.Event()
        slot: dict[str, Any] = {}
        try:
            self.q.put_nowait((img, bool(flip), ev, slot))
        except self._queue_mod.Full:
            raise TimeoutError(
                "micro-batch queue full — worker overloaded or wedged"
            ) from None  # handler maps TimeoutError to 503
        if not ev.wait(timeout=self.timeout_s):
            # worker wedged or dead — fail this request instead of hanging
            # the connection forever (mapped to 503 by the handler)
            raise TimeoutError(
                f"micro-batch worker did not answer within {self.timeout_s:.0f}s"
            )
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["found"], slot["fen"], slot["conf"], slot.get("board")

    def _loop(self) -> None:
        while True:
            items = [self.q.get()]
            while len(items) < self.max_batch:
                try:
                    items.append(self.q.get_nowait())
                except self._queue_mod.Empty:
                    break
            groups: dict[tuple, list] = {}
            for it in items:
                groups.setdefault((it[1], it[0].shape), []).append(it)
            for (flip, _shape), group in groups.items():
                try:
                    n = len(group)
                    imgs = np.stack([it[0] for it in group])
                    padded = 1 << (n - 1).bit_length()
                    if padded > n:
                        imgs = np.concatenate([imgs, np.repeat(imgs[-1:], padded - n, axis=0)])
                    kw = {"include_board": True} if self.include_board else {}
                    batch = self.engine.process_batch(imgs, flip=flip, lite=True, **kw)
                    for i, (_, _, ev, slot) in enumerate(group):
                        slot["found"] = bool(batch.board_found[i])
                        slot["fen"] = batch.fens[i]
                        slot["conf"] = np.max(batch.probabilities[i], axis=1)
                        if self.include_board and slot["found"]:
                            slot["board"] = np.asarray(batch.board_image[i])
                        ev.set()
                except Exception as e:  # noqa: BLE001
                    logger.exception("micro-batch failed")
                    for _, _, ev, slot in group:
                        slot["error"] = str(e)
                        ev.set()


class ChessVisionService:
    """Holds the model + persistence dirs; handler delegates here."""

    def __init__(self, local: bool = True, upload_root: str | None = None, cv_model: Any = None) -> None:
        self.local = local
        self.lock = threading.Lock()
        if cv_model is None:
            from chessvision_tpu.core import ChessVision

            logger.info("Eager-loading ChessVision models...")
            cv_model = ChessVision(lazy_load=False)
        self.cv = cv_model
        # The micro-batcher serves BOTH modes (round-3 review: production
        # mode used to bypass it and serialize per-image calls at ~5 req/s
        # vs 22+ batched).  In production (local=False) the engine's serve
        # program also returns the extracted board, and persistence happens
        # on a background thread so responses never wait on disk I/O.
        self.batcher = (
            _MicroBatcher(cv_model.engine, include_board=not local)
            if hasattr(cv_model, "engine")
            else None
        )
        self.upload_root = Path(upload_root or "user_uploads")
        init_uploads_folder(self.upload_root)
        self._persist_q: Any = None
        if not local:
            import queue

            # bounded + best-effort: under overload, dropping an upload
            # beats blocking responses (the response already shipped)
            self._persist_q = queue.Queue(maxsize=256)
            threading.Thread(
                target=self._persist_loop, daemon=True, name="cv-persist"
            ).start()

    def warmup(self, image_hw: tuple[int, int] = (512, 512)) -> None:
        """Pre-compile the lite engine program at every micro-batch shape
        (1, 2, ..., cap) so no client request ever pays a first-compile
        stall (remote XLA compiles run minutes on some backends; the
        persistent compilation cache makes this a no-op on warm hosts)."""
        if self.batcher is None:
            return
        b = 1
        kw = {"include_board": True} if self.batcher.include_board else {}
        while b <= self.batcher.max_batch:
            zeros = np.zeros((b, *image_hw, 3), np.uint8)
            self.cv.engine.process_batch(zeros, lite=True, **kw)
            logger.info("warmup: serving batch %d compiled", b)
            b *= 2

    # -- request handlers ------------------------------------------------------

    def cv_algo(self, payload: dict[str, Any]) -> tuple[int, dict[str, Any]]:
        if "image" not in payload:
            return 400, {"success": False, "error": "Missing image data"}
        try:
            raw = payload["image"]
            if isinstance(raw, str) and raw.startswith("data:"):
                raw = raw.split(",", 1)[1]
            buf = base64.b64decode(raw)
            img = self._decode_image(buf)
        except Exception as e:  # noqa: BLE001
            return 400, {"success": False, "error": f"Invalid image data: {e}"}
        return self._process(img, payload.get("flip", False), payload.get("tokens"))

    def classify_image(self, image_bytes: bytes, flip: bool = False) -> tuple[int, dict[str, Any]]:
        try:
            img = self._decode_image(image_bytes)
        except Exception as e:  # noqa: BLE001
            return 400, {"success": False, "error": f"Invalid image data: {e}"}
        return self._process(img, flip, None)

    def _decode_image(self, buf: bytes) -> np.ndarray:
        import cv2

        arr = np.frombuffer(buf, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("could not decode image")
        return img

    def _process(self, img: np.ndarray, flip: bool, tokens: Any) -> tuple[int, dict[str, Any]]:
        import time

        raw_id = str(uuid.uuid4())
        t0 = time.time()
        if self.batcher is not None:
            # latency path: lite engine outputs (plus the extracted board
            # in persisting mode), with concurrent requests coalesced into
            # one device batch by the micro-batcher
            found, fen, confidences, board = self.batcher.submit(img, bool(flip))
            if not found:
                return 400, {"success": False, "error": "No chessboard detected"}
            if not self.local:
                self._persist_async(raw_id, img, board)
            elapsed = time.time() - t0
        else:
            with self.lock:
                result = self.cv.process_image(img, flip=bool(flip))
                if result.position is None:
                    return 400, {"success": False, "error": "No chessboard detected"}
                if not self.local:
                    self._persist(raw_id, img, result)
                fen = result.position.fen
                confidences = result.position.confidence_scores
                elapsed = result.processing_time

        return 200, {
            "success": True,
            "id": raw_id,
            "FEN": fen,
            "fen": fen,
            "position": fen_2_json(fen),
            "confidence_scores": [float(c) for c in confidences],
            "processing_time": elapsed,
        }

    def _persist_async(self, raw_id: str, img: np.ndarray, board: np.ndarray | None) -> None:
        try:
            self._persist_q.put_nowait((raw_id, img, board))
        except Exception:  # noqa: BLE001 — queue full: drop, never block
            logger.warning("persist queue full — dropping upload %s", raw_id)

    def _persist_loop(self) -> None:
        while True:
            raw_id, img, board = self._persist_q.get()
            try:
                import cv2

                cv2.imwrite(str(self.upload_root / "raw" / f"{raw_id}.JPG"), img)
                if board is not None:
                    cv2.imwrite(str(self.upload_root / "boards" / f"{raw_id}.JPG"), board)
            except Exception:  # noqa: BLE001
                logger.exception("Failed to persist upload %s", raw_id)

    def _persist(self, raw_id: str, img: np.ndarray, result: Any) -> None:
        try:
            import cv2

            cv2.imwrite(str(self.upload_root / "raw" / f"{raw_id}.JPG"), img)
            if result.board_extraction.board_image is not None:
                cv2.imwrite(
                    str(self.upload_root / "boards" / f"{raw_id}.JPG"),
                    result.board_extraction.board_image,
                )
        except Exception:  # noqa: BLE001
            logger.exception("Failed to persist upload %s", raw_id)

    def feedback(self, payload: dict[str, Any]) -> tuple[int, dict[str, Any]]:
        if not payload.get("id") or "position" not in payload:
            return 400, {"success": False, "error": "Missing id or position"}
        entry = {
            "id": str(payload["id"]),
            "position": payload["position"],
            "flip": payload.get("flip", False),
            "timestamp": datetime.datetime.now().isoformat(),
        }
        # Server-generated filename: the client id is stored INSIDE the JSON,
        # never used as a path component (the reference names feedback files
        # with a server-side uuid4 for the same reason — cv_endpoint.py:254-295).
        path = self.upload_root / "feedback" / f"{uuid.uuid4().hex}.json"
        path.write_text(json.dumps(entry, indent=2))
        return 200, {"success": True}


def make_handler(service: ChessVisionService) -> type[BaseHTTPRequestHandler]:
    class Handler(BaseHTTPRequestHandler):
        def _send(self, status: int, body: dict[str, Any]) -> None:
            data = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            # CORS, like the reference's crossdomain decorator
            # (cv_endpoint.py:70-115)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods", "GET, POST, OPTIONS")
            self.send_header("Access-Control-Allow-Headers", "Content-Type")
            self.end_headers()
            self.wfile.write(data)

        def do_OPTIONS(self) -> None:  # noqa: N802
            self._send(200, {})

        def do_GET(self) -> None:  # noqa: N802
            if self.path.rstrip("/") == "/ping":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self) -> None:  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length) if length else b""
            path = self.path.rstrip("/")
            try:
                if path == "/cv_algo":
                    ctype = self.headers.get("Content-Type", "")
                    if "application/json" in ctype:
                        payload = json.loads(body or b"{}")
                    else:
                        payload = {"image": body.decode("ascii", "ignore")}
                    status, resp = service.cv_algo(payload)
                elif path == "/classify_image":
                    ctype = self.headers.get("Content-Type", "")
                    image_bytes, flip = _parse_multipart(body, ctype)
                    if image_bytes is None:
                        status, resp = 400, {"success": False, "error": "No file part"}
                    else:
                        status, resp = service.classify_image(image_bytes, flip)
                elif path == "/feedback":
                    status, resp = service.feedback(json.loads(body or b"{}"))
                else:
                    status, resp = 404, {"error": "not found"}
            except TimeoutError as e:
                logger.exception("Request timed out in the micro-batcher")
                status, resp = 503, {"success": False, "error": str(e)}
            except Exception as e:  # noqa: BLE001
                logger.exception("Request failed")
                status, resp = 500, {"success": False, "error": str(e)}
            self._send(status, resp)

        def log_message(self, fmt: str, *args: Any) -> None:
            logger.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def _parse_multipart(body: bytes, content_type: str) -> tuple[bytes | None, bool]:
    """Minimal multipart/form-data parser for the /classify_image route."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return None, False
    boundary = b"--" + m.group(1).encode()
    image_bytes = None
    flip = False
    for part in body.split(boundary):
        if b"\r\n\r\n" not in part:
            continue
        head, _, content = part.partition(b"\r\n\r\n")
        content = content.rstrip(b"\r\n-")
        head_l = head.decode("latin-1", "ignore").lower()
        if 'name="file"' in head_l or "filename=" in head_l:
            image_bytes = content
        elif 'name="flip"' in head_l:
            flip = content.strip().lower() in (b"true", b"1", b"yes")
    return image_bytes, flip


def serve(
    port: int = 7777,
    local: bool = True,
    cv_model: Any = None,
    upload_root: str | None = None,
    warmup: bool = False,
) -> ThreadingHTTPServer:
    service = ChessVisionService(local=local, cv_model=cv_model, upload_root=upload_root)
    if warmup:
        service.warmup()
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    logger.info("chessvision-tpu compute endpoint on :%d (local=%s)", port, local)
    return server


def main() -> None:
    from chessvision_tpu.utils import setup_logger

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=int(os.getenv("PORT", "7777")))
    parser.add_argument("--local", action="store_true", default=bool(os.getenv("LOCAL")))
    parser.add_argument("--upload-root", type=str, default=None)
    parser.add_argument("--clean-uploads", action="store_true", help="purge + recreate the uploads tree and exit")
    parser.add_argument("--warmup", action="store_true", help="pre-compile all micro-batch shapes before accepting traffic")
    args = parser.parse_args()
    setup_logger("chessvision_tpu")
    if args.clean_uploads:
        clean_uploads_folder(args.upload_root or "user_uploads")
        print("uploads folder reset")
        return
    server = serve(port=args.port, local=args.local, upload_root=args.upload_root, warmup=args.warmup)
    server.serve_forever()


if __name__ == "__main__":
    main()
