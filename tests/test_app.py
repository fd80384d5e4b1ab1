"""App layer: CLI, texture pipeline, viewer loop."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from raytracer_tpu.utils.image import (TextureLibrary, convert_textures,
                                       load_image, save_png)


def _cpu_subprocess_env():
    """Env for cold CLI subprocesses: CPU backend, and no remote-device
    site hooks. Some environments install a sitecustomize that intercepts
    JAX backend discovery and dials a remote accelerator tunnel during
    ``jax.devices()`` even when ``JAX_PLATFORMS=cpu``; if the tunnel is
    down, every cold process hangs. Dropping the hook's gate variable
    makes these tests depend only on the local CPU."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def test_texture_convert_roundtrip(tmp_path):
    src = tmp_path / "tex"
    src.mkdir()
    img = np.zeros((4, 6, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    save_png(str(src / "a.png"), img)
    save_png(str(src / "b.png"), img[:, :, ::-1])
    (src / "notes.txt").write_text("ignored")

    out = tmp_path / "textures.npz"
    n = convert_textures(str(src), str(out))
    assert n == 2

    lib = TextureLibrary(str(out))
    assert sorted(lib.names()) == ["a.png", "b.png"]
    a = lib.get("a.png")
    assert a.shape == (4, 6, 3) and a.dtype == np.float32
    # /256 normalisation (textures/parse_textures.py:35)
    np.testing.assert_allclose(a[0, 0], [255 / 256, 0, 0], rtol=1e-6)
    with pytest.raises(FileNotFoundError):
        lib.get("missing.png")


def test_cli_render_small(tmp_path):
    # In-process invocation of the CLI entry point: a subprocess here paid
    # a cold JAX recompile of the whole pipeline (~3.5 min standalone) and
    # timed out under suite-wide CPU contention; main(argv) exercises the
    # same argument parsing, render loop, PNG sink and stats sink against
    # the already-warm test backend. The subprocess *mechanism* is still
    # covered by test_cli_convert_textures / test_cli_compare below, which
    # don't compile a render pipeline.
    from raytracer_tpu.__main__ import main

    out = tmp_path / "cli.png"
    stats = tmp_path / "stats.jsonl"
    rc = main(["render",
               "--scene", "1", "--width", "32", "--height", "16",
               "--spp", "2", "--bounces", "3", "--frames", "2",
               "--out", str(out), "--stats", str(stats)])
    assert rc == 0
    assert out.exists()
    img = load_image(str(out))
    assert img.shape == (16, 32, 3)
    lines = [json.loads(l) for l in stats.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[1]["spp_total"] == 4


def test_cli_convert_textures(tmp_path):
    src = tmp_path / "tex"
    src.mkdir()
    save_png(str(src / "x.png"), np.zeros((2, 2, 3), np.uint8))
    out = tmp_path / "lib.npz"
    proc = subprocess.run(
        [sys.executable, "-m", "raytracer_tpu", "convert-textures",
         str(src), str(out)],
        capture_output=True, text=True, timeout=120,
        env=_cpu_subprocess_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()


def test_cli_compare(tmp_path):
    import json
    a = np.zeros((4, 4, 3), np.uint8)
    b = a.copy()
    b[0, 0] = [8, 8, 8]
    save_png(str(tmp_path / "a.png"), a)
    save_png(str(tmp_path / "b.png"), b)
    proc = subprocess.run(
        [sys.executable, "-m", "raytracer_tpu", "compare",
         str(tmp_path / "a.png"), str(tmp_path / "b.png")],
        capture_output=True, text=True, timeout=120,
        env=_cpu_subprocess_env(),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert 30 < rec["psnr_db"] < 100
