"""Render configuration: every knob of global_preprocessor_flags.h as a
validated dataclass instead of compile-time macros.

Knob mapping (reference -> here):
  RENDER_BUFFER_PIXEL_WIDTH/HEIGHT (:39-40)  -> width/height
  NUM_SAMPLES_PER_FRAME (:30)                -> spp
  NUM_FRAMES_TO_RENDER (:31)                 -> num_frames
  c_numBounces (v4 :23)                      -> bounces
  USE_ENV_MAP / USE_ENV_CUBEMAP (:56-57)     -> env_mode
  USE_RANDOM_JITTER_TEXTURE_SAMPLING (:67)   -> env_sampling
  USE_UNIT_VECTOR_REJECTION_SAMPLING (:66)   -> unit_vector_sampler
  ACCUMULATE_FRAMES (:60)                    -> accumulate
  NUM_TILES_X/Y (:85-86)                     -> tile_width/tile_height (Pallas grid)
  NUM_THREADS (:69)                          -> (gone: XLA SPMD; see parallel/)
  fast-math toggles (:62-65)                 -> (gone: exact ops; parity policy)

Validation mirrors CheckValidSettings (Application.cpp:36-94): width
divisible by the lane-tile width, height by tile height — on TPU the
"lane count" is the (8,128) vector-register tile instead of 8-wide AVX.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class RenderConfig:
    width: int = 1280
    height: int = 720
    spp: int = 1
    bounces: int = 8            # c_numBounces: loop runs bounces+1 segments
    num_frames: int = 600
    warmup_frames: int = 2      # offline benchmark protocol, Application.cpp:420-423

    scene: str = "glass_spheres"

    # environment lighting: "none" (constant ambient), "equirect", "cubemap"
    env_mode: str = "equirect"
    # env texel lookup: "bilinear", "nearest", "stochastic" (jittered 1-tap,
    # the reference default — TexelSampleRandom, texture.cpp:78-86)
    env_sampling: str = "stochastic"
    # miss radiance when env_mode == "none" (v4 uses (.11,.1,.15) :905;
    # the scalar scene uses (.1,.1,.1), demofox_path_tracing_scalar.cpp:307)
    ambient: tuple = (0.11, 0.10, 0.15)
    # v4 flips x/z before equirect lookup (:758-759)
    env_flip_xz: bool = True

    # "normalized3" (default build) or "zangle" (exact uniform)
    unit_vector_sampler: str = "normalized3"
    # sub-pixel jitter (v4 mainImage :1109; scalar renderer has none)
    jitter: bool = True
    # "wang" sequential-state parity RNG or "counter" (threefry) for
    # sharded spp / path replay
    rng: str = "wang"

    # Russian roulette: "off", "terminate" (correct, scalar v3 semantics),
    # or "v4_quirk" (survivor boost without termination — the reference
    # v4's exact behavior, demofox_path_tracing_optimization_v4.cpp:890-900)
    roulette: str = "v4_quirk"

    accumulate: bool = True
    exposure: float = 1.0

    # kernel backend: "xla" (fused jnp/vmap path) or "pallas" (megakernel)
    backend: str = "xla"
    # unroll the bounce loop in the traced graph (larger compile, lets
    # XLA specialize per bounce); default rolled via lax.fori_loop
    unroll_bounces: bool = False
    # rematerialize each bounce in reverse-mode AD (path-replay backward:
    # O(1) stored state per segment, segments recomputed during the
    # backward sweep; pair with rng="counter" for guaranteed replay)
    remat_bounces: bool = False
    # Pallas pixel-block shape; last dim should be a multiple of 128
    tile_height: int = 8
    tile_width: int = 256
    # skip remaining bounce segments once every lane in a Pallas block is
    # dead — the block-level analog of the reference's all_set(shouldBreak)
    # early-out (v4 :731,781). Identical output; False only for A/B timing.
    early_exit: bool = True
    # segments run per early-exit check: higher = fewer VMEM scratch
    # round-trips of the ~23-plane carried state, coarser exit (up to
    # gran-1 extra dead segments per block). Identical output either way.
    exit_granularity: int = 1
    # progressive frames rolled into ONE device dispatch (0 = auto: 16
    # when accumulating offline, 1 otherwise). Dispatch overhead on the
    # tunneled backend is comparable to a whole 720p frame, so the
    # offline driver fuses K frames per dispatch via lax.fori_loop.
    frames_per_dispatch: int = 0
    # bake the (static) scene and camera into the kernel as compile-time
    # constants: material fetch collapses to distinct-value select chains
    # and unused shading paths (refraction, Beer absorption, ...) drop
    # out entirely — the TPU analog of the reference's compile-time scene
    # (InitializeScene data is static in the binary). Gradients need
    # traced scenes: diff/ always uses backend="xla" which ignores this.
    bake_scene: bool = True
    # accumulation-buffer layout:
    #   "flat128"  Vec3 of (H*W/128, 128) planes — sublane = 128-pixel
    #              group, lane = pixel. The pallas+env fast path: the
    #              deferred env gather keeps its 128-lane batch MINOR
    #              ((..., 4, 128) output, 2x sublane padding) instead of
    #              the narrow (N, 4) row output that XLA pads 4->128 —
    #              a 32x HBM expansion whose write+reread cost ~1.2
    #              ms/frame at 720p and OOMs at 16-sample 1080p
    #              (texture._gather_sublane).
    #   "planar"   Vec3 of (H, W) planes (oracle/mesh layout).
    #   "packed4"  one (H, W, 4) RGBX array (kept for A/B).
    #   "auto"     planar. (flat128 measured NET-NEGATIVE as a default:
    #              XLA's gather lowering materializes the narrow padded
    #              intermediate + retile copy regardless of the
    #              requested output form, and flat blocks span full
    #              image rows, which defeats the block early-exit's
    #              sky-tile locality — 232 vs 238 Mrays/s at the
    #              headline workload. Kept as an explicit option and a
    #              measured record; docs/PERFORMANCE.md.)
    accum_layout: str = "auto"
    # static (width, height) of the env texture for the DIFFERENTIABLE
    # pallas path (kernels/backward.py) — texel planes are traced
    # parameters there, so the dims must ride statically; () = unset.
    # Set automatically by render_frame_pallas_diff.
    env_tex_shape: tuple = ()
    # backward (adjoint) Pallas kernel block height. Round-5 v5e sweep
    # at the headline workload with partial baking: 8 -> 17.2, 16 ->
    # 16.2, 24 -> 15.9 (best), 32 -> 17.0 ms/step, 40 -> Mosaic scoped-
    # vmem OOM. The kernel stores every segment's input state in VMEM
    # scratch, so the builder auto-downgrades the height when the
    # scene/bounce count would exceed the measured ~16 MB scoped-vmem
    # stack limit (kernels/backward.py); falls back to 8 / tile_height
    # when the (possibly sharded) height is not divisible.
    bwd_tile_height: int = 24

    @property
    def packed_accum(self) -> bool:
        """Resolved accum_layout: True = one (H, W, 4) RGBX buffer."""
        return self.accum_layout == "packed4"

    @property
    def flat_accum(self) -> bool:
        """Resolved accum_layout: True = flat128 (H*W/128, 128) planes."""
        return self.accum_layout == "flat128"

    def validate(self) -> "RenderConfig":
        """Raise ValueError on invalid combinations (CheckValidSettings
        analog — but errors, not __debugbreak())."""
        errs = []
        if self.width <= 0 or self.height <= 0:
            errs.append(f"resolution {self.width}x{self.height} must be positive")
        if self.backend == "pallas":
            if self.width % self.tile_width:
                errs.append(
                    f"width {self.width} not divisible by tile_width {self.tile_width}"
                )
            if self.height % self.tile_height:
                errs.append(
                    f"height {self.height} not divisible by tile_height {self.tile_height}"
                )
        if self.spp < 1:
            errs.append("spp must be >= 1")
        if self.bounces < 0:
            errs.append("bounces must be >= 0")
        if self.env_mode not in ("none", "equirect", "cubemap"):
            errs.append(f"env_mode {self.env_mode!r} invalid")
        if self.env_sampling not in ("bilinear", "nearest", "stochastic"):
            errs.append(f"env_sampling {self.env_sampling!r} invalid")
        if self.unit_vector_sampler not in ("normalized3", "zangle"):
            errs.append(f"unit_vector_sampler {self.unit_vector_sampler!r} invalid")
        if self.rng not in ("wang", "counter"):
            errs.append(f"rng {self.rng!r} invalid")
        if self.roulette not in ("off", "terminate", "v4_quirk"):
            errs.append(f"roulette {self.roulette!r} invalid")
        if self.backend not in ("xla", "pallas"):
            errs.append(f"backend {self.backend!r} invalid")
        if self.exit_granularity < 1:
            errs.append("exit_granularity must be >= 1")
        if self.bwd_tile_height < 1:
            errs.append("bwd_tile_height must be >= 1")
        if self.accum_layout == "flat128" and self.width % 128:
            errs.append('accum_layout "flat128" requires width % 128 == 0')
        if self.accum_layout == "flat128" and self.env_sampling == "bilinear":
            errs.append('accum_layout "flat128" needs a single-tap env '
                        'sampling mode (stochastic/nearest)')
        if self.accum_layout == "flat128" and (
                self.backend != "pallas" or self.env_mode == "none"):
            # only the fused pallas+env step produces flat128 planes;
            # the generic frame step emits (H, W) color that would fail
            # with an opaque broadcast error against flat accum planes
            errs.append('accum_layout "flat128" requires backend "pallas" '
                        'and an env map (the fused combine path)')
        if (self.accum_layout == "flat128" and self.spp > 1
                and self.rng != "counter"):
            errs.append('accum_layout "flat128" with spp > 1 needs '
                        'rng="counter" (per-sample addressable streams)')
        if self.accum_layout not in ("auto", "planar", "packed4", "flat128"):
            errs.append(f"accum_layout {self.accum_layout!r} invalid")
        if self.accum_layout == "packed4" and self.backend != "pallas":
            errs.append('accum_layout "packed4" requires backend "pallas"')
        if errs:
            raise ValueError("invalid RenderConfig: " + "; ".join(errs))
        return self

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    def with_auto_tiles(self) -> "RenderConfig":
        """Pick a Pallas block shape that divides this resolution: the
        largest lane-friendly tile_width in (256, 128, width) and the
        best tile_height in (24, 16, 8, ...) that divide exactly. Used
        by the CLI so arbitrary --width/--height work out of the box;
        explicit tile settings that already divide are kept."""
        tw, th = self.tile_width, self.tile_height
        if self.width % tw:
            for cand in (256, 128, self.width):
                if self.width % cand == 0:
                    tw = cand
                    break
        if self.height % th:
            for cand in (24, 16, 8, 4, 2, 1):
                if self.height % cand == 0:
                    th = cand
                    break
        return self.replace(tile_width=tw, tile_height=th)


# The five BASELINE.json benchmark configs as named presets. All run the
# Pallas megakernel backend (a tile_width equal to the full image width
# satisfies Mosaic's lane rule even when the width is not a multiple of
# 128 — scalar_320 uses (24, 320) full-width blocks).
BENCH_CONFIGS = {
    # 1. demofox scalar scene: 320x240, 1 spp, 2 bounces, no env map
    "scalar_320": RenderConfig(
        width=320, height=240, spp=1, bounces=2, scene="cornell_box",
        env_mode="none", ambient=(0.1, 0.1, 0.1), env_flip_xz=False,
        jitter=True, roulette="off", num_frames=512,
        backend="pallas", tile_height=16, tile_width=320,
        exit_granularity=8,
    ),
    # 2. simd_tiled scene: 1280x720, 8 bounces, 4 spp
    "simd_tiled_720": RenderConfig(
        width=1280, height=720, spp=4, bounces=8, scene="glass_spheres",
        env_mode="none", num_frames=64, backend="pallas",
        tile_height=16, tile_width=128, exit_granularity=8,
    ),
    # 3. simt_textured scene: 1920x1080 + HDR env map, 16 spp (counter
    # RNG: one kernel + one miss-gather per sample, combined incrementally
    # in one jitted frame step — a single batched gather over all 16
    # samples OOMs at 15.8 GB; see render_accumulate_pallas)
    "textured_1080": RenderConfig(
        width=1920, height=1080, spp=16, bounces=8, scene="glass_spheres",
        env_mode="equirect", num_frames=16, backend="pallas", rng="counter",
        tile_height=24, tile_width=128, exit_granularity=8,
    ),
    # 4. differentiable inverse render (driver in diff/inverse.py)
    "inverse_render": RenderConfig(
        width=160, height=120, spp=4, bounces=3, scene="glass_spheres",
        env_mode="none", rng="counter", num_frames=1,
    ),
    # 5. offline high-spp: 3840x2160, 1024 samples/pixel accumulated
    # PROGRESSIVELY (1 spp per frame over 1024 frames — the reference's
    # progressive protocol, Application.cpp:420-452 + ACCUMULATE_FRAMES,
    # which also gives checkpoint/resume boundaries every K frames);
    # sharded over the mesh when one is supplied
    "offline_4k": RenderConfig(
        width=3840, height=2160, spp=1, bounces=8, scene="glass_spheres",
        env_mode="equirect", rng="counter", num_frames=1024,
        backend="pallas", tile_height=16, tile_width=128,
        exit_granularity=8,
    ),
    # reference default workload (global_preprocessor_flags.h:30-40)
    "reference_default": RenderConfig(backend="pallas", tile_height=16,
                                      tile_width=128, exit_granularity=8),
}
