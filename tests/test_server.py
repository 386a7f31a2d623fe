"""Serving endpoint tests: drive the real HTTP server with a stub model."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest

from chessvision_tpu import constants
from chessvision_tpu.cv_types import (
    BoardExtractionResult,
    ChessVisionResult,
    PositionResult,
)
from chessvision_tpu.serve.server import fen_2_json, serve

START_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"


class StubCV:
    """process_image stub returning a fixed start position."""

    def __init__(self, found: bool = True):
        self.found = found

    def process_image(self, img, threshold=0.5, flip=False):
        probs = np.zeros((64, 13), np.float32)
        probs[:, constants.LABEL_INDICES["f"]] = 1.0
        board = BoardExtractionResult(
            probabilities=np.zeros((256, 256), np.float32),
            binary_mask=np.zeros((256, 256), np.uint8),
            quadrangle=np.zeros((4, 2), np.float32) if self.found else None,
            board_image=np.zeros((512, 512), np.uint8) if self.found else None,
        )
        position = None
        if self.found:
            position = PositionResult(
                fen=START_FEN,
                original_fen=START_FEN,
                model_probabilities=probs,
                squares=np.zeros((64, 64, 64, 1), np.uint8),
                square_names=constants.SQUARE_NAMES_NORMAL,
                validation_fixes=[],
            )
        return ChessVisionResult(board_extraction=board, position=position, processing_time=0.01)


@pytest.fixture(scope="module")
def server_port(tmp_path_factory):
    import cv2

    server = serve(
        port=0,
        local=True,
        cv_model=StubCV(),
        upload_root=str(tmp_path_factory.mktemp("uploads")),
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield port
    server.shutdown()


def _post(port: int, path: str, payload: dict, ctype: str = "application/json"):
    data = json.dumps(payload).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, headers={"Content-Type": ctype}, method="POST"
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _jpeg_b64() -> str:
    import cv2

    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def test_ping(server_port: int) -> None:
    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/ping") as resp:
        assert resp.status == 200
        assert json.loads(resp.read())["status"] == "ok"


def test_cv_algo_success(server_port: int) -> None:
    status, body = _post(server_port, "/cv_algo/", {"image": _jpeg_b64()})
    assert status == 200
    assert body["success"] is True
    assert body["FEN"] == START_FEN
    assert len(body["confidence_scores"]) == 64  # the fixed reference bug
    assert body["position"]["a1"] == "R"
    assert body["position"]["e8"] == "k"
    assert "e4" not in body["position"]
    assert body["processing_time"] > 0


def test_cv_algo_missing_image(server_port: int) -> None:
    status, body = _post(server_port, "/cv_algo/", {})
    assert status == 400
    assert body["success"] is False


def test_cv_algo_invalid_image(server_port: int) -> None:
    status, body = _post(server_port, "/cv_algo/", {"image": base64.b64encode(b"junk").decode()})
    assert status == 400
    assert "Invalid image" in body["error"] or "error" in body


def test_feedback_roundtrip(server_port: int) -> None:
    status, body = _post(
        server_port, "/feedback/", {"id": "test-123", "position": {"a1": "R"}, "flip": False}
    )
    assert status == 200 and body["success"]
    status, body = _post(server_port, "/feedback/", {"position": {}})
    assert status == 400


def test_fen_2_json() -> None:
    pos = fen_2_json(START_FEN)
    assert pos["a8"] == "r" and pos["h1"] == "R" and pos["e2"] == "P"
    assert len(pos) == 32


def test_no_board_detected(tmp_path) -> None:
    server = serve(port=0, local=True, cv_model=StubCV(found=False), upload_root=str(tmp_path))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        status, body = _post(port, "/cv_algo/", {"image": _jpeg_b64()})
        assert status == 400
        assert body["error"] == "No chessboard detected"
    finally:
        server.shutdown()


class StubEngine:
    """Counts process_batch calls; slow enough that concurrent requests
    pile up behind the first and get coalesced."""

    def __init__(self):
        self.calls: list[int] = []

    def process_batch(self, imgs, threshold=0.5, flip=False, lite=False, include_board=False):
        import time

        from chessvision_tpu.cv_types import BatchResult

        self.calls.append(len(imgs))
        time.sleep(0.25)
        b = len(imgs)
        probs = np.zeros((b, 64, 13), np.float32)
        probs[:, :, constants.LABEL_INDICES["f"]] = 1.0
        board_hw = (512, 512) if include_board else (0, 0)
        return BatchResult(
            logits=np.zeros((b, 0, 0), np.float32),
            binary_mask=np.zeros((b, 0, 0), np.uint8),
            quadrangle=np.zeros((b, 4, 2), np.float32),
            board_found=np.ones(b, bool),
            board_image=np.full((b, *board_hw), 7, np.uint8),
            probabilities=probs,
            fens=["8/8/8/8/8/8/8/8"] * b,
            original_fens=["8/8/8/8/8/8/8/8"] * b,
            validation_fixes=[[] for _ in range(b)],
        )


def test_microbatcher_coalesces_concurrent_requests(tmp_path):
    """N simultaneous uploads must become far fewer engine batches (the
    engine is batched end-to-end; serialized B=1 calls were the old
    behavior and its throughput ceiling)."""
    import cv2

    class EngineCV:
        pass

    cv_model = EngineCV()
    cv_model.engine = StubEngine()
    server = serve(port=0, local=True, cv_model=cv_model, upload_root=str(tmp_path))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = np.zeros((64, 64, 3), np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        payload = json.dumps(
            {"image": base64.b64encode(enc.tobytes()).decode(), "flip": False}
        ).encode()

        results = []

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/cv_algo/",
                data=payload,
                headers={"Content-Type": "application/json"},
            )
            results.append(json.loads(urllib.request.urlopen(req, timeout=30).read()))

        n = 8
        threads = [threading.Thread(target=post) for _ in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()

        assert len(results) == n and all(r["success"] for r in results)
        calls = cv_model.engine.calls
        assert len(calls) < n, f"no coalescing happened: {calls}"
        assert max(calls) > 1, f"never batched: {calls}"
        # padding keeps compiled batch shapes to powers of two
        assert all(c & (c - 1) == 0 for c in calls), calls
    finally:
        server.shutdown()


def test_production_mode_batches_and_persists(tmp_path):
    """local=False must ride the SAME micro-batched engine path (round-3
    review: production used to fall back to serialized per-image calls)
    AND persist raw+board uploads asynchronously (reference contract:
    cv_endpoint.py:174-187)."""
    import time

    import cv2

    class EngineCV:
        pass

    cv_model = EngineCV()
    cv_model.engine = StubEngine()
    server = serve(port=0, local=False, cv_model=cv_model, upload_root=str(tmp_path))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = np.zeros((64, 64, 3), np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        payload = json.dumps(
            {"image": base64.b64encode(enc.tobytes()).decode(), "flip": False}
        ).encode()

        results = []

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/cv_algo/",
                data=payload,
                headers={"Content-Type": "application/json"},
            )
            results.append(json.loads(urllib.request.urlopen(req, timeout=30).read()))

        n = 8
        threads = [threading.Thread(target=post) for _ in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()

        assert len(results) == n and all(r["success"] for r in results)
        calls = cv_model.engine.calls
        assert len(calls) < n, f"prod mode didn't micro-batch: {calls}"
        assert max(calls) > 1, f"prod mode never batched: {calls}"

        # async persistence: raw + extracted board land under the uploads tree
        deadline = time.time() + 10
        while time.time() < deadline:
            raws = list((tmp_path / "raw").glob("*.JPG"))
            boards = list((tmp_path / "boards").glob("*.JPG"))
            if len(raws) == n and len(boards) == n:
                break
            time.sleep(0.05)
        assert len(raws) == n, f"raw uploads not persisted: {len(raws)}/{n}"
        assert len(boards) == n, f"boards not persisted: {len(boards)}/{n}"
        board = cv2.imread(str(boards[0]), cv2.IMREAD_GRAYSCALE)
        assert board is not None and board.shape == (512, 512) and board[0, 0] == 7
    finally:
        server.shutdown()
