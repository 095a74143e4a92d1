"""Config 5: 3840x2160, 1024 samples/pixel progressive, with a REAL
mid-run checkpoint + resume (BASELINE.json offline config; protocol:
Application.cpp:420-452).

Phase 1 renders the first half (512 frames at 1 spp/frame), checkpointing
every 128; the process state is then discarded and phase 2 builds a FRESH
renderer, resumes from the checkpoint, and renders the second half.
Reports ms/frame, total wall-clock, and writes the final image.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpuperformanceraytracer_tpu.config import BENCH_CONFIGS
from cpuperformanceraytracer_tpu.render.driver import OfflineRenderer
from cpuperformanceraytracer_tpu.texture.texture import load_texture


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/offline_4k.png"
    ck = out + ".ckpt.npz"
    if os.path.exists(ck):
        os.remove(ck)
    cfg = BENCH_CONFIGS["offline_4k"]
    half = cfg.num_frames // 2
    tex = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")

    t0 = time.perf_counter()
    r1 = OfflineRenderer(cfg.replace(num_frames=half), texture=tex,
                         silent=True)
    t1 = r1.run(checkpoint_path=ck, checkpoint_every=128)
    wall1 = time.perf_counter() - t0
    assert os.path.exists(ck), "phase 1 wrote no checkpoint"
    del r1  # simulate preemption: all in-memory state gone

    t0 = time.perf_counter()
    r2 = OfflineRenderer(cfg.replace(num_frames=half), texture=tex,
                         silent=True)
    r2.resume(ck)
    resumed_at = r2.state.frame
    # continue to the full sample count
    r2.cfg = r2.cfg.replace(num_frames=cfg.num_frames - resumed_at)
    t2 = r2.run(checkpoint_path=ck, checkpoint_every=128)
    wall2 = time.perf_counter() - t0
    r2.write_image(out)

    rays = cfg.width * cfg.height
    ms = (t1.mean_ms * t1.timed_frames + t2.mean_ms * t2.timed_frames) / (
        t1.timed_frames + t2.timed_frames)
    print(json.dumps({
        "config": "offline_4k",
        "frames_total": resumed_at + t2.timed_frames,
        "resumed_at_frame": resumed_at,
        "ms_per_frame": round(ms, 3),
        "Mrays_per_s": round(rays / ms / 1e3, 2),
        "wall_s_phase1": round(wall1, 1),
        "wall_s_phase2": round(wall2, 1),
        "image": out,
    }))


if __name__ == "__main__":
    main()
