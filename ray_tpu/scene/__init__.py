"""Host-side scene construction (numpy): meshes, BVH builders, materials,
lights, textures, cameras.  A :class:`ray_tpu.scene.scene.Scene` is built
imperatively like the reference's ``SceneBase`` (reference: SceneBase.h:371-516)
and then *finalized* into a :class:`ray_tpu.scene.scene.SceneFlat` — a frozen
pytree of dense ``jnp`` arrays that every device kernel consumes."""
