"""Curation utility tests: issue scan, subsets, mask ingestion."""

import numpy as np
import pytest

from chessvision_tpu.curation import (
    attach_issue_scan,
    create_subset,
    ingest_edited_masks,
    scan_image_issues,
)
from chessvision_tpu.runstore import Table


@pytest.fixture(autouse=True)
def store_root(tmp_path, monkeypatch):
    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))


def _write_images(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    # normal textured image
    normal = rng.integers(0, 256, (64, 64), np.uint8)
    # dark / bright / flat / blurry / duplicate-of-normal
    dark = (normal * 0.1).astype(np.uint8)
    bright = np.clip(normal * 0.2 + 215, 0, 255).astype(np.uint8)
    flat = np.full((64, 64), 128, np.uint8)
    blurry = cv2.GaussianBlur(normal, (15, 15), 8)
    dup = normal.copy()
    for name, img in [
        ("normal", normal), ("dark", dark), ("bright", bright),
        ("flat", flat), ("blurry", blurry), ("dup", dup),
    ]:
        p = tmp_path / f"{name}.png"
        cv2.imwrite(str(p), img)
        paths.append(p)
    return paths


def test_scan_image_issues(tmp_path) -> None:
    paths = _write_images(tmp_path)
    issues = scan_image_issues(paths)
    by = {str(p): i for i, p in enumerate(issues["path"])}

    def flag(name, col):
        return bool(issues[col][by[str(tmp_path / f'{name}.png')]])

    assert not flag("normal", "is_dark") and not flag("normal", "is_blurry")
    assert flag("dark", "is_dark")
    assert flag("bright", "is_bright")
    assert flag("flat", "is_low_contrast")
    assert flag("blurry", "is_blurry")
    assert flag("dup", "is_near_duplicate")
    assert not flag("normal", "is_near_duplicate")  # first occurrence kept


def test_attach_and_subset(tmp_path) -> None:
    paths = _write_images(tmp_path)
    t = Table("proj", "ds", "raw", {"path": np.asarray([str(p) for p in paths], object)})
    attach_issue_scan(t)
    clean = create_subset(t, "clean")
    names = {str(p).split("/")[-1] for p in clean["path"]}
    assert "normal.png" in names
    assert "dark.png" not in names and "blurry.png" not in names and "dup.png" not in names
    assert clean.lineage["parents"] == [t.url]


def test_ingest_edited_masks(tmp_path) -> None:
    import cv2

    masks = np.zeros((3, 32, 32), np.uint8)
    t = Table(
        "proj", "ds", "seg",
        {"example_id": np.asarray(["a", "b", "c"], object), "mask": masks},
    )
    edit_dir = tmp_path / "edits"
    edit_dir.mkdir()
    edited = np.zeros((32, 32), np.uint8)
    edited[8:24, 8:24] = 255
    cv2.imwrite(str(edit_dir / "b.png"), edited)

    out = ingest_edited_masks(t, edit_dir, "seg-edited")
    assert out.lineage["edited_masks"] == 1
    assert np.asarray(out["mask"])[1].sum() > 0
    assert np.asarray(out["mask"])[0].sum() == 0


def test_make_screen_boards_compose() -> None:
    """Synthetic screen-board generator: deterministic, correct layout,
    mask is a filled quad that actually covers the rendered board."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "make_screen_boards",
        Path(__file__).resolve().parent.parent / "scripts" / "make_screen_boards.py",
    )
    msb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(msb)

    img, mask = msb.compose(np.random.default_rng(3))
    img2, mask2 = msb.compose(np.random.default_rng(3))
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert mask.shape == (256, 256) and set(np.unique(mask)) <= {0, 255}
    assert np.array_equal(img, img2) and np.array_equal(mask, mask2)
    # board occupies a plausible fraction of the frame (scale 0.35-0.95)
    frac = (mask > 0).mean()
    assert 0.05 < frac < 0.95
