"""SceneFlat serialization: save/load a *finalized* scene to one .npz.

The reference has no scene serialization (SURVEY §5 — progressive buffers
are its only resume state); here a compiled SceneFlat is a pytree of dense
arrays + static metadata, so one .npz (arrays keyed by tree path, statics
as JSON) round-trips it exactly.  Complements the renderer's
checkpoint/resume (render/renderer.py save_state): together a long render
survives a restart without re-running scene compile (BVH builds on big
scenes take minutes).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ray_tpu.scene.scene import SceneFlat

_STATIC_FIELDS = tuple(
    f.name for f in dataclasses.fields(SceneFlat)
    if f.metadata.get("static", False)
)


def _flatten(prefix, obj, out):
    if obj is None:
        return
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}.{k}", v, out)
        return
    out[prefix] = np.asarray(obj)


def save_scene(path: str, scene: SceneFlat) -> None:
    arrays = {}
    statics = {}
    none_fields = []
    for f in dataclasses.fields(SceneFlat):
        v = getattr(scene, f.name)
        if f.name in _STATIC_FIELDS:
            statics[f.name] = v
        elif v is None:
            none_fields.append(f.name)
        else:
            _flatten(f.name, v, arrays)
    # dict-valued fields need their key sets to rebuild
    dict_fields = {
        f.name: sorted(getattr(scene, f.name).keys())
        for f in dataclasses.fields(SceneFlat)
        if isinstance(getattr(scene, f.name), dict)
    }
    meta = json.dumps({
        "statics": statics,
        "none": none_fields,
        "dicts": dict_fields,
        "version": 1,
    })
    np.savez_compressed(path, __meta__=np.frombuffer(
        meta.encode(), np.uint8
    ), **arrays)


def load_scene(path: str) -> SceneFlat:
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    kwargs = {}
    kwargs.update(meta["statics"])
    # JSON turns tuples into lists — restore the static tuple fields
    if "light_kinds" in kwargs:
        kwargs["light_kinds"] = tuple(
            tuple(row) for row in kwargs["light_kinds"]
        )
    if "mat_types" in kwargs:
        kwargs["mat_types"] = tuple(kwargs["mat_types"])
    for name in meta["none"]:
        kwargs[name] = None
    for f in dataclasses.fields(SceneFlat):
        if f.name in kwargs:
            continue
        if f.name in meta["dicts"]:
            kwargs[f.name] = {
                k: jnp.asarray(data[f"{f.name}.{k}"])
                for k in meta["dicts"][f.name]
            }
        else:
            kwargs[f.name] = jnp.asarray(data[f.name])
    return SceneFlat(**kwargs)
