"""ray_tpu — a TPU-native, differentiable, physically based path tracer.

A brand-new JAX/Pallas renderer with the capabilities of the C++ renderer
sergcpp/Ray (see /root/reference): wavefront unidirectional path tracing with
BVH-accelerated ray/triangle intersection, next-event estimation, the
Diffuse/Glossy/Refractive/Emissive/Mix/Principled BSDF set, physical sky,
filmic/AgX tonemapping, adaptive sampling and NLM/UNet denoising — designed
TPU-first:

* scenes compile (host-side, numpy) into a frozen pytree of dense arrays
  ("SceneFlat"), the analogue of the reference's ``scene_data_t``
  (reference: internal/Core.h:511) without handles or sparse storages;
* the render pipeline is the wavefront formulation (the reference's GPU path,
  RendererVK.cpp:368): fixed-capacity ray SoA arrays + active masks, with the
  bounce loop unrolled under a single ``jax.jit``;
* BSDF dispatch is compute-all-select (no divergence on a vector machine);
* gradients w.r.t. material/texture/emission/environment parameters flow
  through the shading math (detached sampling, attached evaluation);
* multi-chip scaling shards image tiles over a ``jax.sharding.Mesh`` with
  ``psum`` accumulator/gradient reduction.
"""

from ray_tpu.scene.camera import Camera, CamType, PixelFilter, make_camera
from ray_tpu.scene.scene import Scene, SceneFlat
from ray_tpu.scene.materials import MaterialDesc
from ray_tpu.scene.lights import LightDesc
from ray_tpu.render.renderer import Renderer, RenderSettings, RegionContext
from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.tonemap import ViewTransform
from ray_tpu.scene.scene_io import load_scene, save_scene
from ray_tpu.api import (
    DeviceInfo,
    ILog,
    LogNull,
    LogStdout,
    RendererType,
    create_renderer,
    match_device_names,
    query_available_devices,
    version,
)

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "CamType",
    "PixelFilter",
    "make_camera",
    "Scene",
    "SceneFlat",
    "MaterialDesc",
    "LightDesc",
    "Renderer",
    "RenderSettings",
    "RegionContext",
    "PassSettings",
    "ViewTransform",
    "DeviceInfo",
    "ILog",
    "LogNull",
    "LogStdout",
    "RendererType",
    "create_renderer",
    "match_device_names",
    "query_available_devices",
    "version",
    "save_scene",
    "load_scene",
    "__version__",
]
