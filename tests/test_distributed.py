"""Multi-process (multi-host) rendering test — the DCN story, executed.

SURVEY.md §5's distributed-comm plan and VERDICT round-4 item 7: the
``parallel/distributed.py`` bootstrap (``jax.distributed.initialize``) and
the cross-host ``gather_image`` allgather had zero test coverage — the
multi-host path was asserted, not tested. This test spawns TWO real OS
processes, each with 2 virtual CPU devices (a 2-host x 2-device "pod"),
bootstraps them through ``distributed.initialize`` with a local
coordinator, runs the pixel-sharded render step over the 4-device GLOBAL
mesh (gloo cross-process collectives), allgathers the frame on every
process, and asserts both processes see an image bitwise identical to the
single-process render — the same invariant test_parallel.py pins
single-process (RNG streams are global-pixel-keyed, so topology cannot
change the image).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
port, pid, nproc, ndev = sys.argv[1:5]
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_num_cpu_devices", int(ndev))
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_enable_x64", False)
sys.path.insert(0, %(repo)r)

from raytracer_tpu.parallel.distributed import initialize, gather_image
initialize(coordinator_address=f"127.0.0.1:{port}",
           num_processes=int(nproc), process_id=int(pid))

import jax.numpy as jnp
import numpy as np
import raytracer_tpu as rt
from raytracer_tpu.models.camera import build_camera, primary_rays
from raytracer_tpu.ops.integrator import render_frame
from raytracer_tpu.parallel.mesh import make_mesh, pixel_sharding, replicated
from raytracer_tpu.parallel.shard import make_pixel_sharded_step

devices = jax.devices()
assert len(devices) == int(nproc) * int(ndev), devices
assert jax.process_count() == int(nproc)

scene, use_sky = rt.build_scene(1)
settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                             ).with_sky(use_sky)
width, height = 32, 8
n = width * height
cam = build_camera(rt.CameraConfig(width=width, height=height))
o, d = primary_rays(cam, width, height)
idx = jnp.arange(n, dtype=jnp.int32)
key = jax.random.key(7)

mesh = make_mesh(devices)
sh = pixel_sharding(mesh)
rep = replicated(mesh)

def to_global(x, sharding):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda i: x[i])

g_scene = jax.tree.map(lambda l: to_global(l, rep), scene)
step = make_pixel_sharded_step(mesh, settings)
# frame_num and base_key ride in uncommitted (host-replicated scalars —
# identical on every process, the multi-process analog of a broadcast).
out, segs = step(g_scene, to_global(idx, sh), to_global(o, sh),
                 to_global(d, sh),
                 to_global(np.zeros((n, 3), np.float32), sh),
                 jnp.int32(0), key)
img = gather_image(out)                      # cross-host allgather
assert img.shape == (n, 3), img.shape
assert np.isfinite(img).all()
assert float(segs) > 0

# Single-process reference on this process's own devices (full shapes).
ref, ref_segs = jax.jit(lambda *a: render_frame(scene, settings, *a))(
    idx, o, d, jnp.zeros((n, 3), jnp.float32), jnp.int32(0), key)
np.testing.assert_array_equal(img, np.asarray(ref))
assert float(segs) == float(ref_segs)
print(f"WORKER_OK pid={pid} segs={float(segs):.0f} "
      f"checksum={float(np.abs(img).sum()):.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_pixel_sharded_render(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    worker = _WORKER % {"repo": REPO}
    script = tmp_path / "worker.py"
    script.write_text(worker)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), "2", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process render timed out:\n"
                    + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{out}")
        assert "WORKER_OK" in out, out
    # Both processes allgathered the same bitwise-checked image.
    chk = [line for out in outs for line in out.splitlines()
           if line.startswith("WORKER_OK")]
    assert len(chk) == 2
    assert chk[0].split("checksum=")[1] == chk[1].split("checksum=")[1]
