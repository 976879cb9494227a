"""Progressive renderer driver.

Equivalent of the reference's ``RendererBase``/``Cpu::Renderer``
(RendererBase.h:133-253, internal/RendererCPU.h:193): owns the accumulation
buffers, advances one sample ("iteration") per ``render_sample`` call,
maintains the incremental average (dual full/half buffers for variance-driven
adaptive sampling, RendererCPU.h:607-658) and resolves tonemapped pixels.
Progressive rendering *is* the checkpoint/resume model, exactly like the
reference: state = {buffers, iteration}; ``clear()`` restarts.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tpu.render.integrator import PassSettings, render_tile
from ray_tpu.render.tonemap import ViewTransform, apply_view_transform
from ray_tpu.scene.camera import Camera, PixelFilter, build_filter_table


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Analogue of ``settings_t`` (RendererBase.h:52) plus the adaptive-
    sampling knobs the reference keeps on the camera (SceneBase.h:301-306
    ``min_samples``/``variance_threshold``)."""

    width: int = 256
    height: int = 256
    min_samples: int = 16
    variance_threshold: float = 0.0   # 0 = adaptive sampling off
    use_spatial_cache: bool = False   # settings_t.use_spatial_cache
    cache_entries: int = 1 << 20
    # update-pass resolution divisor (RAD_CACHE_DOWNSAMPLING_FACTOR = 4 in
    # the reference; tunable here because the voxel-hit rate scales with
    # resolution — tiny test renders need 1)
    cache_downsample: int = 4
    # per-stage wall-clock stats (stats_t, RendererBase.h:230-242).  Off by
    # default: honest timing forces a device sync per call, which breaks
    # async dispatch pipelining.
    collect_stats: bool = False


@dataclasses.dataclass
class RegionContext:
    """Tile + progressive iteration state (RendererBase.h:78 RegionContext)."""

    x: int = 0
    y: int = 0
    w: int = 0
    h: int = 0
    iteration: int = 0


@partial(jax.jit, static_argnames=(
    "width", "height", "settings", "use_filter_table", "cache_mode"
))
def _render_sample_jit(
    scene, cam, filter_table, iteration, rand_seed, pixel_mask,
    *, width, height, settings, use_filter_table,
    cache=None, cache_mode="off",
):
    out = render_tile(
        scene, cam, filter_table,
        jnp.int32(0), jnp.int32(0), iteration, rand_seed,
        width=width, height=height, tile_w=width, tile_h=height,
        settings=settings, use_filter_table=use_filter_table,
        pixel_mask=pixel_mask, cache=cache, cache_mode=cache_mode,
    )
    return out


@jax.jit
def _accumulate(full_buf, half_buf, counts, sample, mask):
    """Per-pixel incremental average (pixels advance only while their mask
    is on); odd samples also feed the half buffer (RendererCPU.h:607-627)
    for the dual-buffer variance estimate."""
    new_counts = counts + mask.astype(jnp.int32)
    it_f = jnp.maximum(new_counts, 1).astype(jnp.float32)
    new_full = jnp.where(
        mask[:, None], full_buf + (sample - full_buf) / it_f[:, None], full_buf
    )
    odd = (new_counts % 2) == 1
    half_it = jnp.ceil(it_f * 0.5)
    new_half = jnp.where(
        (mask & odd)[:, None],
        half_buf + (sample - half_buf) / half_it[:, None],
        half_buf,
    )
    return new_full, new_half, new_counts


@jax.jit
def _variance_mask(full_buf, half_buf, threshold):
    """Per-pixel convergence test in reversible-tonemap space
    (RendererCPU.h:629-658)."""
    from ray_tpu.render.tonemap import reversible_tonemap

    d = jnp.abs(reversible_tonemap(full_buf) - reversible_tonemap(half_buf))
    return jnp.max(d, axis=-1) > threshold


class Renderer:
    """Progressive path-tracing renderer over a finalized SceneFlat."""

    def __init__(self, settings: RenderSettings, pass_settings: PassSettings = PassSettings()):
        self.settings = settings
        self.pass_settings = pass_settings
        self.iteration = 0
        w, h = settings.width, settings.height
        self.full_buf = jnp.zeros((h * w, 3), jnp.float32)
        self.half_buf = jnp.zeros((h * w, 3), jnp.float32)
        self.aux_base = jnp.zeros((h * w, 3), jnp.float32)
        self.aux_dn = jnp.zeros((h * w, 4), jnp.float32)
        self.sample_counts = jnp.zeros((h * w,), jnp.int32)
        self.active_px = jnp.ones((h * w,), jnp.bool_)
        # stats_t analogue (RendererBase.h:230-242).  One jit fuses raygen/
        # trace/shade/shadow, so the per-stage split inside a sample comes
        # from jax.profiler traces (named scopes mark each stage); the
        # driver-level passes are timed here.
        self.stats = {
            "time_render_us": 0.0,
            "time_cache_update_us": 0.0,
            "time_cache_resolve_us": 0.0,
            "time_denoise_us": 0.0,
            "rays_traced": 0,
            "samples": 0,
        }
        self.cache = None            # spatial radiance cache state
        self.cache_iteration = 0     # RegionContext.cache_iteration
        # optional jax.Device pin, set by the api.create_renderer factory
        # (settings_t.preferred_device analogue)
        self.device = None

    def _on_device(self):
        """Context manager placing computation on the factory-chosen
        device (no-op when unpinned)."""
        import contextlib

        if self.device is None:
            return contextlib.nullcontext()
        return jax.default_device(self.device)

    def get_stats(self) -> dict:
        """RendererBase::GetStats (RendererBase.h:244)."""
        return dict(self.stats)

    def reset_stats(self):
        for k in self.stats:
            self.stats[k] = 0.0 if k.startswith("time") else 0

    def _timed(self, key, value):
        """Wall-clock bracket helper: blocks on `value` and charges the
        elapsed time since `self._t0` to stats[key]."""
        import time

        jax.block_until_ready(value)
        self.stats[key] += (time.perf_counter() - self._t0) * 1e6

    def clear(self):
        self.iteration = 0
        self.full_buf = jnp.zeros_like(self.full_buf)
        self.half_buf = jnp.zeros_like(self.half_buf)
        self.sample_counts = jnp.zeros_like(self.sample_counts)
        self.active_px = jnp.ones_like(self.active_px)

    def update_spatial_cache(self, scene, cam: Camera, rand_seed: int = 0):
        """¼-resolution cache-feeding pass (RendererCPU.h:1010-1163
        UpdateSpatialCache): Box filter, no DOF, cache_mode=Update."""
        from ray_tpu.render import radcache

        if self.cache is None:
            self.cache = radcache.make_cache(
                self.settings.cache_entries, np.asarray(cam.origin)
            )
        self.cache_iteration += 1
        f = self.settings.cache_downsample
        w4 = max(self.settings.width // f, 1)
        h4 = max(self.settings.height // f, 1)
        cam_u = dataclasses.replace(
            cam, fstop=jnp.float32(0.0), filter=int(PixelFilter.BOX)
        )
        table = jnp.asarray(build_filter_table(cam_u.filter, cam_u.filter_width))
        import time
        self._t0 = time.perf_counter()
        with self._on_device():
            out = _render_sample_jit(
                scene, cam_u, table,
                jnp.uint32(self.cache_iteration), jnp.uint32(rand_seed),
                jnp.ones((h4 * w4,), jnp.bool_),
                width=w4, height=h4, settings=self.pass_settings,
                use_filter_table=False, cache=self.cache, cache_mode="update",
            )
        self.cache = out["cache"]
        if self.settings.collect_stats:
            self._timed("time_cache_update_us", self.cache)
        return out

    def resolve_spatial_cache(self):
        """EMA-merge curr into prev + aging (RendererCPU.h:1165-1212)."""
        import time

        from ray_tpu.render import radcache

        assert self.cache is not None, "no cache to resolve"
        self._t0 = time.perf_counter()
        self.cache = radcache.resolve(self.cache)
        if self.settings.collect_stats:
            self._timed("time_cache_resolve_us", self.cache)

    def render_sample(self, scene, cam: Camera, rand_seed: int = 0):
        """Advance one progressive sample over the full frame."""
        self.iteration += 1
        table = jnp.asarray(
            build_filter_table(cam.filter, cam.filter_width)
        )
        adaptive = self.settings.variance_threshold > 0.0
        mask = self.active_px if adaptive else jnp.ones_like(self.active_px)
        use_cache = self.settings.use_spatial_cache and self.cache is not None
        import time
        self._t0 = time.perf_counter()
        with self._on_device():
            out = _render_sample_jit(
                scene, cam, table,
                jnp.uint32(self.iteration), jnp.uint32(rand_seed), mask,
                width=self.settings.width, height=self.settings.height,
                settings=self.pass_settings,
                use_filter_table=cam.filter != PixelFilter.BOX,
                cache=self.cache if use_cache else None,
                cache_mode="query" if use_cache else "off",
            )
            self.full_buf, self.half_buf, self.sample_counts = _accumulate(
                self.full_buf, self.half_buf, self.sample_counts,
                out["color"], mask,
            )
        self.stats["samples"] += 1
        if self.settings.collect_stats:
            self._timed("time_render_us", self.full_buf)
            self.stats["rays_traced"] += int(out["rays_traced"])
        it = self.iteration
        self.aux_base = self.aux_base + (out["base_color"] - self.aux_base) / it
        self.aux_dn = self.aux_dn + (out["depth_normal"] - self.aux_dn) / it
        if adaptive and self.iteration >= self.settings.min_samples:
            self.active_px = self.active_px & _variance_mask(
                self.full_buf, self.half_buf,
                jnp.float32(self.settings.variance_threshold),
            )
        return out

    def render(self, scene, cam: Camera, samples: int, rand_seed: int = 0):
        for _ in range(samples):
            if self.settings.use_spatial_cache:
                # per-frame cache loop ordering mirrors the reference test
                # driver (SURVEY §3.6): update → resolve → query render
                self.update_spatial_cache(scene, cam, rand_seed)
                self.resolve_spatial_cache()
            self.render_sample(scene, cam, rand_seed)
        return self.radiance_image()

    def radiance_image(self) -> np.ndarray:
        h, w = self.settings.height, self.settings.width
        return np.asarray(self.full_buf).reshape(h, w, 3)

    def pixels(self, cam: Optional[Camera] = None,
               view_transform: int = ViewTransform.STANDARD) -> np.ndarray:
        """Tonemapped 8-bit-comparable float image in [0,1]."""
        exposure = float(cam.exposure) if cam is not None else 0.0
        gamma = float(cam.gamma) if cam is not None else 1.0
        img = apply_view_transform(
            self.full_buf, view_transform, exposure, gamma
        )
        h, w = self.settings.height, self.settings.width
        return np.asarray(img).reshape(h, w, 3)

    def variance_image(self) -> np.ndarray:
        """Half-buffer based variance proxy (RendererCPU.h:629-658)."""
        h, w = self.settings.height, self.settings.width
        v = jnp.abs(self.full_buf - self.half_buf)
        return np.asarray(v).reshape(h, w, 3)

    # -- checkpoint/resume (SURVEY §5: progressive state = buffers +
    # iteration; the reference keeps it in memory only, we add disk
    # round-tripping so long renders survive restarts) ------------------
    _STATE_KEYS = ("full_buf", "half_buf", "aux_base", "aux_dn",
                   "sample_counts", "active_px")

    def save_state(self, path: str):
        """Serialize progressive render state (+ spatial cache) to .npz."""
        data = {k: np.asarray(getattr(self, k)) for k in self._STATE_KEYS}
        data["iteration"] = np.int64(self.iteration)
        data["cache_iteration"] = np.int64(self.cache_iteration)
        if self.cache is not None:
            for f, v in zip(self.cache._fields, self.cache):
                data[f"cache_{f}"] = np.asarray(v)
        np.savez_compressed(path, **data)

    def load_state(self, path: str):
        """Resume from ``save_state`` output; shapes must match settings."""
        d = np.load(path)
        for k in self._STATE_KEYS:
            cur = getattr(self, k)
            assert d[k].shape == cur.shape, (k, d[k].shape, cur.shape)
            setattr(self, k, jnp.asarray(d[k]))
        self.iteration = int(d["iteration"])
        self.cache_iteration = int(d["cache_iteration"])
        if "cache_key_lo" in d:
            from ray_tpu.render.radcache import CacheState

            self.cache = CacheState(*(
                jnp.asarray(d[f"cache_{f}"]) for f in CacheState._fields
            ))

    def denoise_image(self, mode: str = "nlm") -> np.ndarray:
        """Denoise the accumulated radiance (RendererBase::DenoiseImage,
        RendererBase.h:246-253): 'nlm' = joint non-local means guided by the
        AUX buffers; 'unet' = the OIDN-style network."""
        h, w = self.settings.height, self.settings.width
        color = self.full_buf.reshape(h, w, 3)
        base = self.aux_base.reshape(h, w, 3)
        dn = self.aux_dn.reshape(h, w, 4)
        if mode == "nlm":
            from ray_tpu.models.nlm import filter_variance, nlm_denoise
            from ray_tpu.render.tonemap import (
                reversible_tonemap,
                reversible_tonemap_invert,
            )

            # reference pipeline (RendererCPU.h:629-658 variance +
            # :661-787 pre-pass): dual-buffer variance 0.5·(rt(2f−h) −
            # rt(h))², Gauss-max blurred, NLM in reversible-tonemap space
            half = self.half_buf.reshape(h, w, 3)
            p1 = reversible_tonemap(jnp.maximum(2.0 * color - half, 0.0))
            p2 = reversible_tonemap(half)
            variance = filter_variance(0.5 * (p1 - p2) ** 2)
            color_t = reversible_tonemap(color)
            out = reversible_tonemap_invert(
                nlm_denoise(color_t, variance, base_color=base,
                            depth_normal=dn)
            )
            return np.asarray(out)
        if mode == "unet":
            if not hasattr(self, "_unet"):
                from ray_tpu.models.unet import UNetFilter

                self._unet = UNetFilter()
            return np.asarray(
                self._unet.denoise(color, base, dn[..., :3])
            )
        raise ValueError(mode)
