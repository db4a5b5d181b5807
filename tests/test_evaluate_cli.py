"""End-to-end evaluation harness test over a generated Middlebury-format
dataset (the reference's Flyte workflow path, workflows/evaluation/).

A synthetic scene directory (im0/im1.png, disp0/disp1.pfm, calib.txt) is
built from the ground-truth generator, then stm-eval runs the reference's
three configs over it, producing the markdown table, JSON rows, and the
disparity cache.
"""

import json

import numpy as np
import pytest

from stereomatch_tpu.cli.evaluate import main as evaluate_main
from stereomatch_tpu.io.data import MiddleburyDataset, write_pfm

from .conftest import STM_MAX_DISPARITY, synthetic_stereo_pair

D = STM_MAX_DISPARITY


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    PIL = pytest.importorskip("PIL.Image")
    root = tmp_path_factory.mktemp("middlebury")
    for i, seed in enumerate([3, 11]):
        left, right, gt = synthetic_stereo_pair(32, 48, D, seed=seed)
        scene = root / f"scene{i}"
        scene.mkdir()
        PIL.fromarray((left * 255).astype(np.uint8)).save(scene / "im0.png")
        PIL.fromarray((right * 255).astype(np.uint8)).save(scene / "im1.png")
        write_pfm(scene / "disp0.pfm", gt.astype(np.float32))
        write_pfm(scene / "disp1.pfm", gt.astype(np.float32))
        (scene / "calib.txt").write_text(
            f"width={left.shape[1]}\nheight={left.shape[0]}\nndisp={D}\n")
    return root


def test_dataset_loads(dataset_dir):
    ds = MiddleburyDataset(dataset_dir)
    assert len(ds) == 2
    item = ds[0]
    assert item["left"].shape == (32, 48)
    assert item["gt_disparity"].shape == (32, 48)
    assert item["max_disparity"] == D


def test_evaluate_cli_end_to_end(dataset_dir, tmp_path, capsys):
    json_out = tmp_path / "metrics.json"
    rc = evaluate_main([str(dataset_dir), "--json", str(json_out),
                        "--configs", "ssd:wta,ssd:wta:sgm",
                        "--cache", str(tmp_path / "cache")])
    assert rc == 0
    table = capsys.readouterr().out
    assert "ssd-wta" in table and "ssd-wta-sgm" in table

    rows = json.loads(json_out.read_text())
    assert len(rows) == 2
    for row in rows:
        assert row["rmse"] >= 0
        assert 0 <= row["bad_pixel_ratio"] <= 1
        assert len(row["scenes"]) == 2
    # SGM should not be worse than raw WTA on the synthetic scenes.
    by_name = {r["name"]: r for r in rows}
    assert (by_name["ssd-wta-sgm"]["bad_pixel_ratio"]
            <= by_name["ssd-wta"]["bad_pixel_ratio"] + 0.02)

    # Cached re-run: identical metrics, no recompute needed.
    rc = evaluate_main([str(dataset_dir), "--json", str(json_out),
                        "--configs", "ssd:wta",
                        "--cache", str(tmp_path / "cache")])
    assert rc == 0
    rows2 = json.loads(json_out.read_text())
    assert rows2[0]["rmse"] == pytest.approx(by_name["ssd-wta"]["rmse"])
    assert list((tmp_path / "cache").glob("*.npy"))


def test_evaluate_synthetic_mode(tmp_path):
    """--synthetic: zero-data evaluation on occlusion-aware scenes, with
    occluded pixels excluded via the gt=0 unknown convention."""
    out = tmp_path / "rows.json"
    rc = evaluate_main(["--synthetic", "2", "--synthetic-size", "48x64x16",
                        "--configs", "ssd:wta:sgm,census:wta:sgm",
                        "--json", str(out)])
    assert rc == 0
    rows = json.loads(out.read_text())
    assert {r["name"] for r in rows} == {"ssd-wta-sgm", "census-wta-sgm"}
    for r in rows:
        assert 0.0 <= r["bad_pixel_ratio"] < 0.2
        assert len(r["scenes"]) == 2


def test_evaluate_confidence_ause(tmp_path):
    """--confidence: PKRN sparsification AUSE per config, cached alongside
    the disparities; the confidence must beat a random ranking by a clear
    margin (AUSE well below the config's own bad-pixel ratio)."""
    out = tmp_path / "rows.json"
    args = ["--synthetic", "2", "--synthetic-size", "48x64x16",
            "--configs", "ssd:wta:sgm", "--confidence",
            "--cache", str(tmp_path / "cache"), "--json", str(out)]
    assert evaluate_main(args) == 0
    rows = json.loads(out.read_text())
    (row,) = rows
    assert 0.0 <= row["ause"] <= max(row["bad_pixel_ratio"], 1e-6)
    assert all("ause" in m for m in row["scenes"])
    assert list((tmp_path / "cache").glob("*_conf.npy"))
    # Cached re-run reproduces the same AUSE without recomputing.
    assert evaluate_main(args) == 0
    rows2 = json.loads(out.read_text())
    assert rows2[0]["ause"] == pytest.approx(row["ause"])


def test_evaluate_tune(tmp_path):
    """--tune: gradient-tuned penalties (disjoint tuning seeds) must not
    lose to the SSD-scaled defaults on the census config, and the row
    records the fitted values."""
    out = tmp_path / "rows.json"
    common = ["--synthetic", "2", "--synthetic-size", "48x64x16",
              "--configs", "census:wta:sgm", "--json", str(out)]
    assert evaluate_main(common) == 0
    base = json.loads(out.read_text())[0]
    assert evaluate_main(common + ["--tune", "2", "--tune-steps", "30",
                                   "--tune-tau", "0.5"]) == 0
    tuned = json.loads(out.read_text())[0]
    assert tuned["name"] == "census-wta-sgm-tuned"
    assert tuned["penalty1"] > 0 and tuned["penalty2"] > 0
    assert tuned["bad_pixel_ratio"] <= base["bad_pixel_ratio"] + 1e-9


def test_evaluate_tune_requires_synthetic(tmp_path):
    assert evaluate_main(["--tune", "2", str(tmp_path)]) == 2


def test_evaluate_pyramid_config(tmp_path):
    """pyramidN configs run the coarse-to-fine pipeline per scene and
    stay within a few bad-pixel points of the full-resolution census
    config on the synthetic suite."""
    out = tmp_path / "rows.json"
    assert evaluate_main(["--synthetic", "2", "--synthetic-size",
                          "64x96x16", "--configs",
                          "census:wta:sgm,pyramid1", "--json",
                          str(out)]) == 0
    rows = {r["name"]: r for r in json.loads(out.read_text())}
    assert set(rows) == {"census-wta-sgm", "pyramid1"}
    assert rows["pyramid1"]["bad_pixel_ratio"] < \
        rows["census-wta-sgm"]["bad_pixel_ratio"] + 0.05


def test_evaluate_pyramid_rejects_confidence(tmp_path):
    assert evaluate_main(["--synthetic", "1", "--configs", "pyramid1",
                          "--confidence"]) == 2


def test_parse_configs_modifier_suffixes():
    import pytest as _pytest
    from stereomatch_tpu.cli.evaluate import parse_configs
    assert parse_configs(
        "ssd:wta,census:wta:sgm+refine+speckle,pyramid2+refine,"
        "census:wta:sgm+wmf") == [
        ("ssd", "wta", None, frozenset()),
        ("census", "wta", "sgm", frozenset({"refine", "speckle"})),
        ("pyramid2", None, None, frozenset({"refine"})),
        ("census", "wta", "sgm", frozenset({"wmf"})),
    ]
    with _pytest.raises(ValueError):
        parse_configs("ssd:wta+bogus")
    # pyramidN names a whole pipeline: trailing :parts must fail as a
    # bad spec, not slip through as a cost method named "pyramid1".
    with _pytest.raises(ValueError, match="Bad config spec"):
        parse_configs("pyramid1:wta")


def test_eval_refined_config_runs(capsys):
    from stereomatch_tpu.cli.evaluate import main
    rc = main(["--synthetic", "1", "--synthetic-size", "32x48x8",
               "--configs", "census:wta:sgm+refine"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "census-wta-sgm-refine" in out


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    """KITTI 2015 layout built from the same synthetic scenes: image_2/
    image_3 left/right PNGs, disp_occ_0 uint16 disparity*256 with a
    zeroed (no-ground-truth) band."""
    PIL = pytest.importorskip("PIL.Image")
    root = tmp_path_factory.mktemp("kitti")
    for sub in ("image_2", "image_3", "disp_occ_0"):
        (root / sub).mkdir()
    for i, seed in enumerate([3, 11]):
        left, right, gt = synthetic_stereo_pair(32, 48, D, seed=seed)
        name = f"{i:06d}_10.png"
        PIL.fromarray((left * 255).astype(np.uint8)).save(
            root / "image_2" / name)
        PIL.fromarray((right * 255).astype(np.uint8)).save(
            root / "image_3" / name)
        d16 = (gt.astype(np.float32) * 256.0).astype(np.uint16)
        d16[:, :4] = 0                      # unknown pixels stay masked
        PIL.fromarray(d16).save(root / "disp_occ_0" / name)
    return root


def test_kitti_dataset_loads(kitti_dir):
    from stereomatch_tpu.io.data import KittiDataset
    ds = KittiDataset(kitti_dir, max_disparity=D)
    assert len(ds) == 2
    item = ds[0]
    assert item["left"].shape == (32, 48)
    assert item["max_disparity"] == D
    assert item["gt_disparity"].dtype == np.float32
    assert (item["gt_disparity"][:, :4] == 0).all()      # unknown band
    _, _, gt = synthetic_stereo_pair(32, 48, D, seed=3)
    np.testing.assert_allclose(item["gt_disparity"][:, 4:],
                               gt.astype(np.float32)[:, 4:], atol=1 / 256)


def test_evaluate_cli_kitti_format(kitti_dir, tmp_path, capsys):
    json_out = tmp_path / "kitti.json"
    rc = evaluate_main([str(kitti_dir), "--format", "kitti",
                        "--configs", "census:wta:sgm",
                        "--json", str(json_out)])
    assert rc == 0
    rows = json.loads(json_out.read_text())
    assert rows[0]["name"] == "census-wta-sgm"
    assert rows[0]["bad_pixel_ratio"] < 0.25
    assert len(rows[0]["scenes"]) == 2


def test_eval_wmf_config_runs(capsys):
    from stereomatch_tpu.cli.evaluate import main
    rc = main(["--synthetic", "1", "--synthetic-size", "32x48x8",
               "--configs", "census:wta:sgm+wmf"])
    assert rc == 0
    assert "census-wta-sgm-wmf" in capsys.readouterr().out


def test_parse_configs_rejects_pyramid_wmf():
    import pytest as _pytest
    from stereomatch_tpu.cli.evaluate import parse_configs
    with _pytest.raises(ValueError, match="wmf"):
        parse_configs("pyramid1+wmf")
