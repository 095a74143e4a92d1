"""Worker process for the multi-process jax.distributed test.

Each of N localhost processes owns 4 virtual CPU devices; together they
form one 8-device global mesh over which a frame is rendered with
shard_map (pixel rows sharded). The worker prints the frame's global
mean radiance — identical across processes (the mean is a collective) —
which the parent test compares against a single-process render.

Run: python tests/distributed_worker.py <pid> <nproc> <coordinator> [backend]

``backend`` (default "xla") selects the frame kernel; "pallas" runs the
production megakernel under the multi-process mesh (interpret mode on
CPU), closing the one untested leg of the multi-chip path.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    backend = sys.argv[4] if len(sys.argv) > 4 else "xla"

    from cpuperformanceraytracer_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator=coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    import numpy as np

    from cpuperformanceraytracer_tpu.config import RenderConfig
    from cpuperformanceraytracer_tpu.parallel.mesh import make_mesh
    from cpuperformanceraytracer_tpu.parallel.shard import sharded_render_frame
    from cpuperformanceraytracer_tpu.scene.presets import scene_by_name

    # pallas: (6, 64) blocks — each of the 4*nproc row shards holds
    # 48/(4*nproc) rows, which the tile height must divide
    cfg = RenderConfig(width=64, height=48, spp=2, bounces=2,
                       scene="cornell_box", env_mode="none",
                       ambient=(0.1, 0.1, 0.1), jitter=True, rng="counter",
                       roulette="off", backend=backend,
                       tile_height=6, tile_width=64)
    scene, camera = scene_by_name(cfg.scene)
    # host-local jax.Arrays cannot feed a multi-process global shard_map;
    # numpy leaves are accepted as implicitly-replicated inputs
    scene = jax.tree.map(np.asarray, scene)
    camera = jax.tree.map(np.asarray, camera)

    mesh = make_mesh((4 * nproc, 1), ("px", "spp"))

    @jax.jit
    def frame_mean():
        color = sharded_render_frame(scene, camera, None, cfg, 3, mesh)
        return (color.x.mean() + color.y.mean() + color.z.mean()) / 3.0

    mean = float(frame_mean())
    print(f"WORKER {pid} MEAN {mean:.9f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
