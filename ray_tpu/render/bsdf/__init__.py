"""BSDF lobes.  Behavioral equivalents of the reference's per-lobe
Evaluate/Sample pairs (reference: internal/ShadeRef.cpp:380-1030), written as
vectorized tangent-space jnp functions.  Every function is total (no
branches): invalid configurations return zero weight, and the integrator
blends lobes with compute-all-select."""
