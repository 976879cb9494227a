"""UNet denoiser — OIDN-style architecture in flax.

The reference embeds Intel OIDN's "hdr_alb_nrm" UNet and executes it via
hand-scheduled 16-pass tiled convolutions with a tensor-aliasing plan
(internal/UNetFilter.cpp:98-293, internal/Convolution.h).  On TPU all of
that machinery collapses into one jitted flax module: XLA handles fusion,
memory aliasing and scheduling, and convolutions land on the MXU.

Architecture (9 → 3): encoder widths 32/48/64/80/96 with 4 downsamples and
a mirrored skip-concat decoder — the layout UNetFilter.h:6 describes.  The
reference checkout ships no weights (its fp16 blob is stripped —
.MISSING_LARGE_BLOBS:3), so parameters initialize randomly and
``load_weights`` accepts an OIDN-layout dict when available; ``train_step``
supports fitting on rendered pairs.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def hdr_transfer(c):
    """Range-compressing transfer for HDR inputs (log1p variant of OIDN's
    PU curve; exactly invertible)."""
    return jnp.log1p(jnp.maximum(c, 0.0))


def hdr_transfer_inv(c):
    return jnp.expm1(jnp.maximum(c, 0.0))


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class UNetDenoiser(nn.Module):
    """9-channel (color+albedo+normal) → 3-channel residual-free denoiser."""

    enc_widths: Sequence[int] = (32, 48, 64, 80)
    bottom_width: int = 96
    dec_widths: Sequence[int] = (112, 96, 64, 32)

    @nn.compact
    def __call__(self, x):
        skips = []
        h = ConvBlock(self.enc_widths[0])(x)
        h = ConvBlock(self.enc_widths[0])(h)
        for w in self.enc_widths[1:]:
            skips.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = ConvBlock(w)(h)
        skips.append(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = ConvBlock(self.bottom_width)(h)
        h = ConvBlock(self.bottom_width)(h)

        for w, skip in zip(self.dec_widths, reversed(skips)):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(w)(h)
            h = ConvBlock(w)(h)
        h = ConvBlock(16)(h)
        return nn.Conv(3, (3, 3), padding="SAME")(h)


def _pad_to(x, mult):
    h, w = x.shape[1:3]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, (h, w)


# Trained weights (scripts/train_unet.py — fitted on self-rendered pairs;
# the role of the reference's embedded OIDN blob, UNetFilter.cpp:12-13)
WEIGHTS_PATH = os.path.join(
    os.path.dirname(__file__), "weights", "unet_hdr_alb_nrm.npz"
)


def load_trained_params():
    """Load the trained parameter pytree, or None when no weights exist."""
    if not os.path.exists(WEIGHTS_PATH):
        return None
    import numpy as np
    from flax.traverse_util import unflatten_dict

    with np.load(WEIGHTS_PATH) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
    return unflatten_dict(flat)


class UNetFilter:
    """Driver-facing wrapper: init / denoise / (optional) train.

    The analogue of ``InitUNetFilter`` + the 16-pass DenoiseImage loop
    (RendererBase.h:250, RendererCPU.h:789-1010) — one call, one jit.
    Loads the self-trained weights (scripts/train_unet.py) when present;
    falls back to random init otherwise.
    """

    def __init__(self, seed: int = 0, use_trained: bool = True,
                 verbose: bool = False):
        self.model = UNetDenoiser()
        dummy = jnp.zeros((1, 64, 64, 9), jnp.float32)
        trained = load_trained_params() if use_trained else None
        self.using_trained = False
        if trained is not None:
            # validate leaf shapes against the current architecture so an
            # arch change surfaces here, not as a shape error at first apply
            init = jax.eval_shape(
                lambda: self.model.init(jax.random.PRNGKey(0), dummy))
            ok = jax.tree_util.tree_structure(trained) == \
                jax.tree_util.tree_structure(init) and all(
                a.shape == b.shape for a, b in zip(
                    jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(init)))
            if ok:
                self.params = trained
                self.using_trained = True
                if verbose:
                    print(f"UNetFilter: loaded trained weights "
                          f"({WEIGHTS_PATH})")
            else:
                print(f"UNetFilter: {WEIGHTS_PATH} does not match the "
                      f"current architecture — falling back to random init")
        if not self.using_trained:
            self.params = self.model.init(jax.random.PRNGKey(seed), dummy)

        @jax.jit
        def _apply(params, x):
            return self.model.apply(params, x)

        self._apply = _apply

    def denoise(self, color, albedo, normal):
        """color/albedo/normal: (H, W, 3) → filtered (H, W, 3)."""
        x = jnp.concatenate(
            [hdr_transfer(color), albedo, normal * 0.5 + 0.5], axis=-1
        )[None]
        x, (h, w) = _pad_to(x, 16)
        y = self._apply(self.params, x)
        return hdr_transfer_inv(y[0, :h, :w])

    def train_step(self, opt_state, optimizer, noisy, albedo, normal, target):
        """One Adam step fitting the filter on (noisy → target) pairs."""
        import optax

        def loss_fn(params):
            x = jnp.concatenate(
                [hdr_transfer(noisy), albedo, normal * 0.5 + 0.5], axis=-1
            )
            y = self.model.apply(params, x)
            return jnp.mean(jnp.abs(y - hdr_transfer(target)))

        loss, grads = jax.value_and_grad(loss_fn)(self.params)
        updates, opt_state = optimizer.update(grads, opt_state, self.params)
        import optax as _o

        self.params = _o.apply_updates(self.params, updates)
        return loss, opt_state
