"""Tests for the local run/metrics/table platform (3LC replacement)."""

import numpy as np
import pytest

from chessvision_tpu.runstore import Run, Table, init
from chessvision_tpu.runstore import metrics as collectors
from chessvision_tpu.runstore.runs import list_runs


@pytest.fixture(autouse=True)
def store_root(tmp_path, monkeypatch):
    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))
    return tmp_path / "store"


def _table(n=10) -> Table:
    rng = np.random.default_rng(0)
    return Table(
        "proj",
        "ds",
        "initial",
        {
            "image": rng.integers(0, 255, (n, 4, 4), np.uint8),
            "label": rng.integers(0, 13, n).astype(np.int64),
            "path": np.asarray([f"img_{i}.jpg" for i in range(n)], object),
        },
    )


def test_table_save_load_roundtrip() -> None:
    t = _table().save()
    t2 = Table.load("proj", "ds", "initial")
    assert len(t2) == len(t)
    np.testing.assert_array_equal(t2["image"], t["image"])
    np.testing.assert_array_equal(t2["label"], t["label"])
    assert list(t2["path"]) == list(t["path"])
    assert list(t2["example_id"]) == list(t["example_id"])
    assert Table.exists("proj", "ds", "initial")
    assert not Table.exists("proj", "ds", "nope")


def test_table_split_deterministic() -> None:
    t = _table(20)
    tr1, va1 = t.split(0.1, seed=0, names=("train", "val"))
    tr2, va2 = t.split(0.1, seed=0, names=("train", "val"))
    assert list(tr1["example_id"]) == list(tr2["example_id"])
    assert len(va1) == 2
    assert set(tr1["example_id"]) | set(va1["example_id"]) == set(t["example_id"])
    assert tr1.lineage["op"] == "select"
    assert tr1.lineage["parents"] == [t.url]


def test_table_filter_and_join() -> None:
    t = _table(10)
    even = t.filter(t["label"] % 2 == 0, "even")
    assert all(l % 2 == 0 for l in even["label"])
    odd = t.filter(lambda r: r["label"] % 2 == 1, "odd")
    merged = even.join(odd, "merged")
    assert len(merged) == 10
    assert len(merged.lineage["parents"]) == 2


def test_sample_weights_sampler() -> None:
    t = _table(4)
    t.with_column("sample_weight", np.array([0.0, 0.0, 0.0, 1.0]))
    sampler = t.create_sampler(np.random.default_rng(0))
    idx = sampler(100)
    assert (idx == 3).all()


def test_run_lifecycle() -> None:
    run = init("proj", "r1", parameters={"lr": 1e-3, "epochs": 5}, description="test")
    assert run.parameters["lr"] == 1e-3
    assert run.parameters["status"] == "running"
    run.log({"val_dice": 0.9, "step": 1})
    run.log({"val_dice": 0.95, "step": 2})
    assert [s["val_dice"] for s in run.scalars()] == [0.9, 0.95]
    run.set_parameters({"best_val_score": 0.95})
    run.set_status_completed()
    assert run.parameters["status"] == "completed"
    assert run.parameters["best_val_score"] == 0.95
    assert "r1" in list_runs("proj")
    assert run.bulk_data_url.exists()


def test_metrics_tables_and_embedding_reduction() -> None:
    run = init("proj", "r2")
    n = 12
    emb = np.random.default_rng(0).normal(size=(n, 32)).astype(np.float32)
    run.write_metrics_table(
        "val_epoch5",
        {"example_id": np.asarray([f"e{i}" for i in range(n)], object),
         "loss": np.linspace(0, 1, n).astype(np.float32),
         "embedding": emb},
    )
    assert run.list_metrics_tables() == ["val_epoch5"]
    run.reduce_embeddings("val_epoch5", "embedding", n_components=2)
    cols = run.read_metrics_table("val_epoch5")
    assert "embedding_2d" in cols and cols["embedding_2d"].shape == (n, 2)
    assert "embedding" not in cols


def test_collectors_shapes() -> None:
    import jax.numpy as jnp

    logits = jnp.asarray(np.random.default_rng(0).normal(size=(5, 8, 8)))
    targets = jnp.asarray((np.random.default_rng(1).random((5, 8, 8)) > 0.5).astype(np.float32))
    m = collectors.segmentation_loss_per_sample(logits, targets)
    assert m["loss"].shape == (5,)
    q = collectors.segmentation_quality(logits, targets)
    assert q["iou"].shape == (5,)
    assert (np.asarray(q["iou"]) >= 0).all() and (np.asarray(q["iou"]) <= 1).all()

    cl = jnp.asarray(np.random.default_rng(2).normal(size=(6, 13)))
    lab = jnp.asarray(np.arange(6) % 13)
    cm = collectors.classification_metrics(cl, lab)
    assert cm["loss"].shape == (6,)
    assert cm["predicted"].shape == (6,)

    te = collectors.top2_margin_and_entropy(jnp.asarray(np.full((3, 13), 1 / 13)))
    np.testing.assert_allclose(np.asarray(te["top_2_confidence_difference"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(te["prediction_entropy"]), np.log(13), rtol=1e-5)


def test_runstore_view_pages(store_root, tmp_path) -> None:
    """The dashboard serves the index, a run page with params/sparklines/
    metrics table + artifact thumbnail, and jails /file to the store."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import numpy as np

    from chessvision_tpu import runstore
    from chessvision_tpu.runstore import view

    run = runstore.init("viewproj", "run-a", {"lr": 1e-3})
    for i in range(5):
        run.log({"epoch": i, "val_dice": 0.9 + 0.01 * i})
    # artifact image inside the run's bulk dir (inside the store root)
    art = run.bulk_data_url / "m.png"
    art.write_bytes(
        b"\x89PNG\r\n\x1a\n" + bytes(100)  # enough to be a file; content unchecked
    )
    run.write_metrics_table(
        "val_epoch1",
        {
            "example_id": np.asarray(["a", "b"], object),
            "loss": np.asarray([0.1, 0.2], np.float32),
            "mask_image": np.asarray([str(art), ""], object),
            "embedding_2d": np.asarray([[0.0, 1.0], [1.0, 0.0]], np.float32),
        },
    )
    run.set_status_completed()

    server = ThreadingHTTPServer(("127.0.0.1", 0), view.make_handler())
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.status, r.read()

        status, body = get("/")
        assert status == 200 and b"viewproj" in body and b"run-a" in body

        status, body = get("/run?project=viewproj&name=run-a")
        assert status == 200
        assert b"val_dice" in body and b"<polyline" in body  # sparkline
        assert b"val_epoch1" in body and b"img class='thumb'" in body
        assert b"<circle" in body  # embedding scatter

        # artifact served; escape attempts jailed
        status, _ = get("/file?p=" + str(art))
        assert status == 200
        import urllib.error

        try:
            status, _ = get("/file?p=/etc/passwd")
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == 403
    finally:
        server.shutdown()
