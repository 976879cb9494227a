"""Library facade (reference Ray.h/Ray.cpp): factory fallback chain,
device query, regex device matching, logging."""

import numpy as np
import pytest

import ray_tpu
from ray_tpu.api import (
    LogNull,
    RendererType,
    create_renderer,
    match_device_names,
    query_available_devices,
    version,
)


class _CollectLog(LogNull):
    def __init__(self):
        self.lines = []

    def info(self, msg):
        self.lines.append(("I", msg))

    def warning(self, msg):
        self.lines.append(("W", msg))

    def error(self, msg):
        self.lines.append(("E", msg))


def test_query_devices():
    devs = query_available_devices()
    assert len(devs) == 8  # conftest forces 8 virtual CPU devices
    assert all(d.platform == "cpu" for d in devs)


def test_match_device_names():
    assert match_device_names("NVIDIA GeForce RTX 3080", "RTX")
    assert match_device_names("TPU v5e", "tpu")
    assert not match_device_names("cpu", "RTX|Arc")


def test_factory_fallback_chain():
    """TPU/GPU unavailable under the CPU-pinned test config → the chain
    must fall through to CPU exactly like Ray.cpp:56-121."""
    log = _CollectLog()
    r = create_renderer(
        ray_tpu.RenderSettings(width=8, height=8), log=log,
        enabled_types=("tpu", "gpu", "cpu"),
    )
    assert r.backend_type == "cpu"
    assert any("unavailable" in m for (_lv, m) in log.lines)
    assert any("renderer on cpu" in m for (_lv, m) in log.lines)


def test_factory_no_backend_raises():
    with pytest.raises(RuntimeError):
        create_renderer(enabled_types=("tpu", "gpu"))


def test_factory_device_regex_fallthrough():
    log = _CollectLog()
    r = create_renderer(
        ray_tpu.RenderSettings(width=8, height=8), log=log,
        enabled_types=("cpu",), preferred_device=".*",
    )
    assert r.backend_type == "cpu"
    with pytest.raises(RuntimeError):
        create_renderer(
            enabled_types=("cpu",), preferred_device="NoSuchDevice",
        )


def test_ref_renderer_end_to_end():
    """REF backend renders the furnace scene correctly through the facade.
    The Pallas opt-out is scoped to this renderer's PassSettings — the
    process-global toggle stays untouched, so a TPU renderer created
    afterwards keeps its fast path."""
    from ray_tpu.ops import traverse
    from ray_tpu.scene.materials import MaterialDesc, ShadingNode
    from ray_tpu.utils.test_scenes import furnace_scene

    sc, cam = furnace_scene(
        MaterialDesc(type=ShadingNode.DIFFUSE, base_color=(0.5, 0.5, 0.5))
    )
    scene = sc.finalize()
    r = create_renderer(
        ray_tpu.RenderSettings(width=16, height=16),
        ray_tpu.PassSettings(max_total_depth=3, min_total_depth=3),
        enabled_types=(RendererType.REF,),
    )
    assert r.backend_type == "ref"
    assert r.pass_settings.force_xla
    assert not traverse._FORCE_XLA
    img = r.render(scene, cam, samples=4)
    center = img[6:10, 6:10]
    assert np.isfinite(img).all()
    # furnace: sphere pixels ≈ albedo × env… loosely (few samples)
    assert 0.2 < float(center.mean()) < 0.8


def test_version():
    assert version() == ray_tpu.__version__
