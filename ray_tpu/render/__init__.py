"""The wavefront render pipeline: ray generation → BVH trace → surface
shading (NEE + BSDF sampling) → shadow occlusion → accumulate → tonemap.
Mirrors the stage decomposition of the reference's GPU wavefront path
(reference: internal/RendererVK.cpp:368 RenderScene) as jitted JAX stages."""
