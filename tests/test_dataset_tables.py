"""Dataset table registration tests (the reference's get_or_create_tables
layer) + sweep data collection/plot."""

from pathlib import Path

import numpy as np
import pytest

from chessvision_tpu import constants


@pytest.fixture(autouse=True)
def store_root(tmp_path, monkeypatch):
    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))


fixtures = pytest.mark.skipif(
    not (Path(constants.DATA_ROOT) / "board_extraction").exists(),
    reason="fixture datasets unavailable",
)


@fixtures
def test_get_or_create_board_extraction_tables() -> None:
    from chessvision_tpu.train.tables import get_or_create_board_extraction_tables

    t = get_or_create_board_extraction_tables()
    assert len(t["train"]) + len(t["val"]) == 631
    assert len(t["val"]) == 63
    # deterministic + reloadable
    t2 = get_or_create_board_extraction_tables()
    assert list(t2["val"]["example_id"]) == list(t["val"]["example_id"])
    assert t["train"].lineage["op"] == "select"


@fixtures
def test_get_or_create_classification_tables_and_weights() -> None:
    from chessvision_tpu.train.tables import (
        get_or_create_classification_tables,
        sample_weights_for_ids,
    )

    t = get_or_create_classification_tables()
    assert len(t["train"]) == 8931 and len(t["val"]) == 2134
    # uniform weights -> None
    ids = list(t["train"]["example_id"][:10])
    assert sample_weights_for_ids(t["train"], ids) is None
    # curated weights flow through
    w = np.ones(len(t["train"]))
    w[0] = 5.0
    t["train"].with_column("sample_weight", w)
    got = sample_weights_for_ids(t["train"], ids)
    assert got is not None and got[0] == 5.0 and got[1] == 1.0


def test_sweep_collect_and_plot(tmp_path) -> None:
    from chessvision_tpu.runstore import init
    from chessvision_tpu.train.sweep import collect_sweep_data, plot_sweep

    for i, (lr, score) in enumerate([(1e-5, 0.91), (3e-5, 0.95), (1e-4, 0.93)]):
        run = init("sweep-proj", f"s-{i}", parameters={
            "learning_rate": lr, "threshold": 0.5, "use_sample_weights": False,
            "best_val_score": score, "sweep_id": 7,
        })
    rows = collect_sweep_data("sweep-proj", sweep_id=7)
    assert len(rows) == 3
    assert {r["best_val_score"] for r in rows} == {0.91, 0.95, 0.93}
    out = plot_sweep("sweep-proj", 7, out_path=str(tmp_path / "sweep.png"))
    assert Path(out).stat().st_size > 1000


def test_yolo_seg_export(tmp_path) -> None:
    """Mask→YOLO-seg export (reference
    notebooks/prepare_yolo_segmentation_dataset.py capability): images +
    normalized polygon labels + dataset.yaml, with the polygon covering
    the mask's quadrilateral."""
    from types import SimpleNamespace

    import numpy as np

    from chessvision_tpu.train.yolo_export import (
        export_yolo_segmentation_dataset,
        mask_to_polygon,
    )

    rng = np.random.default_rng(0)
    masks = np.zeros((3, 256, 256), np.float32)
    # axis-aligned boards at known positions
    boxes = [(40, 40, 200, 220), (10, 90, 120, 240), (60, 5, 250, 100)]
    for i, (y0, x0, y1, x1) in enumerate(boxes):
        masks[i, y0:y1, x0:x1] = 1.0
    data = SimpleNamespace(
        train_images=rng.integers(0, 256, (2, 256, 256, 3), np.uint8),
        train_masks=masks[:2],
        train_ids=["a.JPG", "b.JPG"],
        val_images=rng.integers(0, 256, (1, 256, 256, 3), np.uint8),
        val_masks=masks[2:],
        val_ids=["c.JPG"],
    )
    counts = export_yolo_segmentation_dataset(tmp_path / "ds", data=data)
    assert counts == {"train": 2, "val": 1}
    assert (tmp_path / "ds" / "dataset.yaml").exists()
    assert (tmp_path / "ds" / "images" / "train" / "a.png").exists()

    line = (tmp_path / "ds" / "labels" / "train" / "a.txt").read_text().strip()
    parts = line.split()
    assert parts[0] == "0" and len(parts) >= 7 and len(parts) % 2 == 1
    xy = np.asarray([float(v) for v in parts[1:]]).reshape(-1, 2)
    assert ((xy >= 0) & (xy <= 1)).all()
    # polygon spans the box extents (normalized; contour is inclusive of
    # the boundary pixel, so allow a 2px slack)
    y0, x0, y1, x1 = boxes[0]
    assert abs(xy[:, 0].min() * 256 - x0) <= 2 and abs(xy[:, 0].max() * 256 - (x1 - 1)) <= 2
    assert abs(xy[:, 1].min() * 256 - y0) <= 2 and abs(xy[:, 1].max() * 256 - (y1 - 1)) <= 2

    # hull fallback agrees with the cv2 contour on extents
    hull_poly = mask_to_polygon(masks[0] * 255)
    assert hull_poly is not None and len(hull_poly) >= 4


def test_load_image_mask_dir(tmp_path) -> None:
    """--extra-data dirs (e.g. scripts/make_screen_boards.py output) load in
    the board_extraction layout, resizing off-size pairs to 256²."""
    import cv2

    from chessvision_tpu.train import data as data_lib

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.default_rng(0)
    for i, side in enumerate([256, 128]):  # one native, one needing resize
        img = rng.integers(0, 255, (side, side, 3), np.uint8)
        mask = np.zeros((side, side), np.uint8)
        mask[side // 4 : 3 * side // 4, side // 4 : 3 * side // 4] = 255
        cv2.imwrite(str(tmp_path / "images" / f"b{i}.png"), img)
        cv2.imwrite(str(tmp_path / "masks" / f"b{i}.png"), mask)

    images, masks, ids = data_lib.load_image_mask_dir(tmp_path)
    assert images.shape == (2, 256, 256, 3) and images.dtype == np.uint8
    assert masks.shape == (2, 256, 256) and masks.dtype == np.float32
    assert set(np.unique(masks)) <= {0.0, 1.0}
    assert 0.2 < masks[1].mean() < 0.3  # resized mask keeps its area
    assert ids == ["b0", "b1"]

    with pytest.raises(ValueError):
        data_lib.load_image_mask_dir(tmp_path / "images")  # no pairs


def test_load_squares_dir(tmp_path) -> None:
    """--extra-data squares dirs load in the ImageFolder layout mapped onto
    an existing class order; unknown class dirs fail loudly."""
    import cv2

    from chessvision_tpu.train import data as data_lib

    class_names = ["B", "_b", "f"]
    rng = np.random.default_rng(0)
    for d, n in [("f", 2), ("_b", 1)]:
        (tmp_path / d).mkdir()
        for i in range(n):
            cv2.imwrite(str(tmp_path / d / f"s{i}.png"), rng.integers(0, 255, (64, 64), np.uint8))
    images, labels, ids = data_lib.load_squares_dir(tmp_path, class_names)
    assert images.shape == (3, 64, 64) and labels.tolist() == [1, 2, 2]
    assert ids == ["_b/s0.png", "f/s0.png", "f/s1.png"]

    (tmp_path / "zz").mkdir()
    cv2.imwrite(str(tmp_path / "zz" / "s.png"), np.zeros((64, 64), np.uint8))
    with pytest.raises(ValueError):
        data_lib.load_squares_dir(tmp_path, class_names)
