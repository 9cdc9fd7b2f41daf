"""CLI smoke tests — the application layer standing in for the reference's
SDL event loop (``Source/skeleton.cpp:93-144``): render/animate/sweep write
frames like the reference's SDL_SaveImage screenshot path, fit runs the
differentiable demo, configs lists the five BASELINE workloads."""
import os

import numpy as np
import pytest

from uob_raytracer_tpu.cli import main


def test_configs(capsys):
    main(["configs"])
    out = capsys.readouterr().out
    assert "cpu_ref_256" in out and "full_1024" in out


def test_render_writes_bmp(tmp_path, capsys):
    path = str(tmp_path / "shot.bmp")
    main(["render", "--width", "64", "--height", "16", "-o", path])
    out = capsys.readouterr().out
    assert "Frame Rate:" in out  # the reference's FPS printout
    with open(path, "rb") as f:
        header = f.read(2)
    assert header == b"BM"
    # BMP payload: 64x16 BGRA + 54-byte header
    assert os.path.getsize(path) == 54 + 64 * 16 * 4


def test_render_writes_ppm(tmp_path):
    path = str(tmp_path / "shot.ppm")
    main(["render", "--width", "64", "--height", "16", "-o", path])
    with open(path, "rb") as f:
        assert f.read(2) == b"P6"


def test_animate_frames(tmp_path, capsys):
    outdir = str(tmp_path / "frames")
    main(["animate", "--width", "64", "--height", "8", "--frames", "3",
          "-o", outdir])
    files = sorted(os.listdir(outdir))
    assert files == ["frame_0000.bmp", "frame_0001.bmp", "frame_0002.bmp"]
    # light moves between frames -> frames differ
    a = open(os.path.join(outdir, files[0]), "rb").read()
    b = open(os.path.join(outdir, files[-1]), "rb").read()
    assert a != b


def test_sweep(tmp_path, capsys):
    outdir = str(tmp_path / "sweep")
    main(["sweep", "--width", "64", "--height", "8", "--frames", "2",
          "-o", outdir])
    assert sorted(os.listdir(outdir)) == ["light_000.bmp", "light_001.bmp"]
    assert "light_x=" in capsys.readouterr().out


@pytest.mark.slow   # end-to-end Adam demo (~1.5 min); scripts/test.sh runs slow
def test_fit_reduces_loss(capsys):
    main(["fit", "--width", "32", "--height", "16", "--steps", "8",
          "--lr", "0.5"])
    out = capsys.readouterr().out
    # each recovery round prints "... loss <start> -> <end>"
    rounds = [line.split("loss")[1] for line in out.splitlines()
              if "]" in line and "loss" in line and "->" in line]
    assert len(rounds) == 2
    start, end = (float(rounds[0].split("->")[i]) for i in (0, 1))
    assert end < start


def test_render_with_obj(tmp_path):
    # minimal OBJ through the Loader.cpp-equivalent path (Loader.cpp:11-59)
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 0.1 0 0\nv 0 0.1 0\nf 1 2 3\n")
    path = str(tmp_path / "shot.bmp")
    main(["render", "--width", "32", "--height", "8", "--obj", str(obj),
          "-o", path])
    assert os.path.exists(path)


def test_select_devices_env(monkeypatch, capsys):
    """RAYTPU_DEVICES — the OCL_DEVICE analogue (skeleton.cpp:549-558):
    index list selects devices; out-of-range fails fast."""
    import jax
    import pytest
    from uob_raytracer_tpu.parallel import make_mesh, select_devices

    n = len(jax.devices())
    monkeypatch.setenv("RAYTPU_DEVICES", "0")
    assert select_devices() == [jax.devices()[0]]
    assert make_mesh().devices.size == 1
    monkeypatch.setenv("RAYTPU_DEVICES", ",".join(str(i) for i in range(n)))
    assert select_devices() == jax.devices()
    monkeypatch.setenv("RAYTPU_DEVICES", str(n + 5))
    with pytest.raises(ValueError):
        select_devices()
    monkeypatch.setenv("RAYTPU_DEVICES", "0,0")   # dup: fail at validation,
    with pytest.raises(ValueError, match="duplicate"):   # not inside Mesh
        select_devices()
    monkeypatch.delenv("RAYTPU_DEVICES")
    select_devices(verbose=True)
    assert "device 0" in capsys.readouterr().out
