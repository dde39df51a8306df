"""CLI smoke tests: info + a tiny render with checkpoint/resume round trip.

The reference has no CLI (scene choice is hardcoded, src/main.cpp:7-12);
these cover the config surface SURVEY §5 requires the TPU build to add.
"""
import json
import os

import numpy as np
import pytest

from mcpt_tpu.cli import main

SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell-box.obj")


def test_info(capsys):
    assert main(["info", SCENE]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["triangles"] == 32
    assert out["lights"] >= 1
    assert out["camera"]["width"] == 1024


def test_render_checkpoint_resume(tmp_path, capsys):
    png = str(tmp_path / "out.png")
    ck = str(tmp_path / "ck.npz")
    # 2 passes of 1 spp with a checkpoint after the first
    args = ["render", SCENE, "--width", "32", "--height", "32", "--spp", "2",
            "--spp-per-pass", "1", "--bounces", "2", "--no-bvh",
            "--checkpoint", ck, "--checkpoint-every", "1", "--out", png]
    assert main(args) == 0
    full = np.asarray(__import__("PIL.Image", fromlist=["open"]).open(png))
    capsys.readouterr()

    # resume from the 1-spp checkpoint and render the second sample
    png2 = str(tmp_path / "out2.png")
    assert main(["render", SCENE, "--width", "32", "--height", "32",
                 "--spp", "2", "--spp-per-pass", "1", "--bounces", "2",
                 "--no-bvh", "--resume", ck, "--out", png2]) == 0
    resumed = np.asarray(__import__("PIL.Image", fromlist=["open"]).open(png2))
    # counter-based RNG: resumed render is bitwise identical
    np.testing.assert_array_equal(full, resumed)


def test_render_seed_mismatch_rejected(tmp_path):
    ck = str(tmp_path / "ck.npz")
    main(["render", SCENE, "--width", "16", "--height", "16", "--spp", "1",
          "--spp-per-pass", "1", "--bounces", "1", "--no-bvh",
          "--checkpoint", ck, "--checkpoint-every", "1",
          "--out", str(tmp_path / "a.png")])
    with pytest.raises(SystemExit):
        main(["render", SCENE, "--width", "16", "--height", "16", "--spp", "2",
              "--seed", "7", "--no-bvh", "--resume", ck,
              "--out", str(tmp_path / "b.png")])


def test_render_preview_every(tmp_path):
    """--preview-every writes intermediate tonemapped PNGs (the reference's
    progressive-display analog, src/main.cpp:26-36)."""
    from PIL import Image

    png = str(tmp_path / "out.png")
    pv = str(tmp_path / "preview.png")
    args = ["render", SCENE, "--width", "32", "--height", "32", "--spp", "3",
            "--spp-per-pass", "1", "--bounces", "2", "--no-bvh",
            "--preview-every", "1", "--preview", pv, "--out", png]
    assert main(args) == 0
    assert os.path.exists(pv), "preview PNG not written"
    prev = np.asarray(Image.open(pv))
    assert prev.shape == (32, 32, 3)
    # the last preview (2 spp) is a valid image but not the 3-spp final
    final = np.asarray(Image.open(png))
    assert prev.shape == final.shape
    assert (prev != final).any()  # written mid-render, fewer samples
