"""Train the UNet denoiser on self-rendered noisy/clean pairs.

The reference ships Intel OIDN's pretrained "hdr_alb_nrm" weights as an
embedded blob (internal/UNetFilter.cpp:12-13); that blob is stripped from
this checkout and the build environment has no network egress, so we do what
OIDN itself does — supervised training on (noisy, albedo, normal) → clean
render pairs — using our own renderer as the data source.

Data: procedurally varied Cornell/furnace scenes (materials, light types,
light power, wall colors) rendered with the wavefront integrator: inputs at
``NOISY_SPP`` spp + first-hit AUX buffers, targets at ``CLEAN_SPP`` spp.
Training follows OIDN's recipe in spirit: log-transfer on HDR color, L1
loss, random exposure scaling so the filter is exposure-equivariant.

Run on TPU (~10 min):  python scripts/train_unet.py
Weights land in ray_tpu/models/weights/unet_hdr_alb_nrm.npz, which
``UNetFilter`` auto-loads at construction.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp
import numpy as np

from ray_tpu.models.unet import UNetDenoiser, hdr_transfer, WEIGHTS_PATH
from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings
from ray_tpu.scene.materials import MaterialDesc, ShadingNode
from ray_tpu.utils.test_scenes import cornell_scene

H = W = 256
NOISY_SPP = 4
CLEAN_SPP = 512
STEPS = 3000
BATCH = 8
CROP = 128
LR = 1e-3


def scene_pool(rng: np.random.Generator):
    """Procedurally varied training scenes."""
    mats = [
        None,  # default diffuse box
        MaterialDesc(type=ShadingNode.PRINCIPLED, base_color=(0.9, 0.7, 0.3),
                     metallic=1.0, roughness=0.25),
        MaterialDesc(type=ShadingNode.PRINCIPLED, base_color=(0.2, 0.4, 0.9),
                     roughness=0.6, specular=0.8),
        MaterialDesc(type=ShadingNode.GLOSSY, base_color=(0.8, 0.8, 0.8),
                     roughness=0.15),
        MaterialDesc(type=ShadingNode.REFRACTIVE, base_color=(0.95, 0.95, 0.95),
                     roughness=0.05, ior=1.45),
        MaterialDesc(type=ShadingNode.PRINCIPLED,
                     base_color=tuple(rng.uniform(0.2, 0.9, 3)),
                     metallic=float(rng.uniform(0, 1)),
                     roughness=float(rng.uniform(0.05, 0.8))),
    ]
    lights = ["emissive_quad", "rect", "sphere", "env"]
    for m in mats:
        for lk in lights:
            power = float(rng.uniform(8.0, 40.0))
            yield lk, m, power


def golden_pool(rng: np.random.Generator, n_std=6, n_flags=5):
    """Randomized variants of the golden test *classes* the r4 denoiser
    failed to generalize to (VERDICT r4 weak #5): the Standard material-
    ball scene with randomized principled materials (complex_mat6 class,
    incl. transmissive glass-likes) and the Ray_Flags mirror-box scene
    with randomized glossy colors/roughness and light power.  Materials
    are drawn, never the test's own values."""
    for _ in range(n_std):
        transmissive = rng.uniform() < 0.5
        mat = {
            "base_color": [float(v) for v in rng.uniform(0.3, 0.95, 3)],
            "roughness": float(rng.uniform(0.02, 0.5)),
        }
        if transmissive:
            mat["transmission"] = 1.0
            mat["ior"] = float(rng.uniform(1.3, 2.2))
        else:
            mat["metallic"] = float(rng.choice([0.0, 1.0]))
            mat["specular"] = float(rng.uniform(0.0, 1.0))
        yield {"mat": mat, "mat_kind": "principled", "scene": "Standard"}
    for _ in range(n_flags):
        yield {
            "mat": {}, "mat_kind": "principled", "scene": "Ray_Flags",
            "flags_override": {
                "red_color": [float(v) for v in rng.uniform(0.1, 1.0, 3)],
                "green_color": [float(v) for v in rng.uniform(0.1, 1.0, 3)],
                "roughness": float(rng.uniform(0.0, 0.15)),
                "ior": float(rng.uniform(1.5, 2.4)),
                "light_mul": float(rng.uniform(0.5, 2.0)),
            },
        }


def render_golden_pair(entry):
    from golden_scene import build_scene

    sc, cam, ps, _vt = build_scene(entry)
    scene = sc.finalize()
    r = Renderer(RenderSettings(width=W, height=H), ps)
    r.render(scene, cam, NOISY_SPP)
    noisy = np.asarray(r.radiance_image())
    alb = np.asarray(r.aux_base).reshape(H, W, 3)
    nrm = np.asarray(r.aux_dn).reshape(H, W, 4)[..., :3]
    r.clear()
    r.render(scene, cam, CLEAN_SPP)
    clean = np.asarray(r.radiance_image())
    return noisy, alb, nrm, clean


def render_pair(light_kind, box_mat, power):
    sc, cam = cornell_scene(light_kind, box_material=box_mat,
                            light_power=power)
    scene = sc.finalize()
    ps = PassSettings(max_total_depth=5, min_total_depth=2)
    r = Renderer(RenderSettings(width=W, height=H), ps)
    r.render(scene, cam, NOISY_SPP)
    noisy = np.asarray(r.radiance_image())
    alb = np.asarray(r.aux_base).reshape(H, W, 3)
    nrm = np.asarray(r.aux_dn).reshape(H, W, 4)[..., :3]
    r.clear()
    r.render(scene, cam, CLEAN_SPP)
    clean = np.asarray(r.radiance_image())
    return noisy, alb, nrm, clean


def main():
    rng = np.random.default_rng(0)
    data = []
    t0 = time.time()
    for i, (lk, m, p) in enumerate(scene_pool(rng)):
        data.append(render_pair(lk, m, p))
        print(f"[{time.time()-t0:6.1f}s] rendered scene {i} ({lk})",
              flush=True)
    for i, entry in enumerate(golden_pool(rng)):
        data.append(render_golden_pair(entry))
        print(f"[{time.time()-t0:6.1f}s] rendered golden-class scene {i} "
              f"({entry['scene']})", flush=True)
    # hold out every 7th scene for out-of-sample evaluation (ADVICE r2:
    # an in-sample self-check says nothing about generalization)
    hold = set(range(2, len(data), 7))
    train = [d for i, d in enumerate(data) if i not in hold]
    held = [d for i, d in enumerate(data) if i in hold]
    noisy = jnp.asarray(np.stack([d[0] for d in train]))
    alb = jnp.asarray(np.stack([d[1] for d in train]))
    nrm = jnp.asarray(np.stack([d[2] for d in train]))
    clean = jnp.asarray(np.stack([d[3] for d in train]))
    n = noisy.shape[0]
    print(f"dataset: {n} train / {len(held)} held-out {noisy.shape[1:]}",
          flush=True)

    import optax

    model = UNetDenoiser()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 9), jnp.float32))
    opt = optax.adam(optax.cosine_decay_schedule(LR, STEPS))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        ki, ke, kc, kc2, kf = jax.random.split(key, 5)
        idx = jax.random.randint(ki, (BATCH,), 0, n)
        # random exposure augmentation: the filter must commute with
        # exposure (OIDN trains the same way)
        expo = jnp.exp(jax.random.uniform(ke, (BATCH, 1, 1, 1),
                                          minval=-2.0, maxval=2.0))
        nz = noisy[idx] * expo
        cl = clean[idx] * expo
        ab, nr = alb[idx], nrm[idx]
        # random crops + flips: multiplies effective data and removes the
        # fixed-framing bias of the small scene pool
        cy = jax.random.randint(kc, (BATCH,), 0, H - CROP)
        cx = jax.random.randint(kc2, (BATCH,), 0, W - CROP)

        def crop(img, y, x):
            return jax.lax.dynamic_slice(
                img, (y, x, 0), (CROP, CROP, img.shape[-1]))

        nz, cl, ab, nr = (jax.vmap(crop)(a, cy, cx)
                          for a in (nz, cl, ab, nr))
        flip = jax.random.bernoulli(kf, shape=(BATCH,))
        def fl(img):
            return jnp.where(flip[:, None, None, None],
                             img[:, :, ::-1, :], img)
        nz, cl, ab, nr = fl(nz), fl(cl), fl(ab), fl(nr)
        x = jnp.concatenate(
            [hdr_transfer(nz), ab, nr * 0.5 + 0.5], axis=-1
        )

        def loss_fn(p):
            y = model.apply(p, x)
            return jnp.mean(jnp.abs(y - hdr_transfer(cl)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(1)
    for i in range(STEPS):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if i % 100 == 0:
            print(f"[{time.time()-t0:6.1f}s] step {i}: loss {float(loss):.5f}",
                  flush=True)

    flat = jax.tree_util.tree_map(np.asarray, params)
    from flax.traverse_util import flatten_dict

    out = {"/".join(k): v for k, v in flatten_dict(flat).items()}
    os.makedirs(os.path.dirname(WEIGHTS_PATH), exist_ok=True)
    np.savez_compressed(WEIGHTS_PATH, **out)
    print(f"saved {WEIGHTS_PATH} ({len(out)} arrays)", flush=True)

    # out-of-sample check: PSNR in the hdr_transfer (log) domain — the
    # domain the loss targets, so bright regions count — on scenes the
    # filter never saw during training
    from ray_tpu.models.unet import UNetFilter

    f = UNetFilter()
    assert f.using_trained, "weights failed to load back"

    def psnr_log(a, b):
        a = np.asarray(hdr_transfer(jnp.asarray(a)))
        b = np.asarray(hdr_transfer(jnp.asarray(b)))
        return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)

    for i, (nz, ab, nr, cl) in enumerate(held):
        den = np.asarray(f.denoise(nz, ab, nr))
        print(f"held-out {i}: PSNR(log) noisy {psnr_log(nz, cl):.2f} dB -> "
              f"denoised {psnr_log(den, cl):.2f} dB", flush=True)


if __name__ == "__main__":
    main()
