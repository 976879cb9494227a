"""Device-side primitives: RNG, math helpers, ray/primitive intersection,
BVH traversal. Everything here is pure-functional jax.numpy (plus Pallas
kernels for the hot paths) and safe to call under ``jax.jit``."""
