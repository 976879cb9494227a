"""Library facade: renderer factory, device query, logging.

Counterpart of the reference's top-level API (Ray.h / Ray.cpp):

* ``create_renderer`` — the factory with a backend preference chain
  (Ray.cpp:53-122 tries Vulkan → DX12 → AVX512 → … → Ref and falls through
  on failure).  Here the chain is TPU → GPU → CPU: JAX backends probed in
  order, first available wins; ``RendererType.REF`` forces the CPU
  interpreter path (the "executable spec" used for parity testing, like the
  reference's Ref backend).
* ``query_available_devices`` — ``QueryAvailableGPUDevices`` (Ray.cpp:124).
* ``match_device_names`` — regex device matching (``MatchDeviceNames``,
  Ray.cpp:135).
* ``ILog``/``LogNull``/``LogStdout`` — the injected logger interface
  (Log.h:16, Ray.cpp:44-45).  Renderers log their configuration at startup
  the way the reference does (RendererCPU.h:360-363).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import jax

from ray_tpu.render.integrator import PassSettings
from ray_tpu.render.renderer import Renderer, RenderSettings


class RendererType:
    """eRendererType analogue (RendererBase.h:22-34).  One compute path
    (JAX/Pallas) runs on every JAX backend; the enum picks the *placement*:
    TPU chips, GPU, host CPU — or REF, the CPU path with Pallas kernels
    disabled, serving as the scalar reference like the reference's Ref
    backend."""

    TPU = "tpu"
    GPU = "gpu"
    CPU = "cpu"
    REF = "ref"

    DEFAULT_CHAIN = ("tpu", "gpu", "cpu")


class ILog:
    """Injected logger (reference Log.h:16): Info/Warning/Error."""

    def info(self, msg: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def warning(self, msg: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def error(self, msg: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class LogNull(ILog):
    """Swallows everything (Ray.cpp:44 LogNull)."""

    def info(self, msg: str) -> None:
        pass

    def warning(self, msg: str) -> None:
        pass

    def error(self, msg: str) -> None:
        pass


class LogStdout(ILog):
    """Prints to stdout (Ray.cpp:45 LogStdout)."""

    def info(self, msg: str) -> None:
        print(f"[INFO] {msg}")

    def warning(self, msg: str) -> None:
        print(f"[WARN] {msg}")

    def error(self, msg: str) -> None:
        print(f"[ERROR] {msg}")


@dataclasses.dataclass
class DeviceInfo:
    """gpu_device_t analogue (Ray.h:30-35)."""

    name: str
    platform: str
    index: int


def query_available_devices() -> list[DeviceInfo]:
    """Enumerate accelerator devices visible to JAX
    (QueryAvailableGPUDevices, Ray.cpp:124)."""
    out = []
    for i, d in enumerate(jax.devices()):
        out.append(
            DeviceInfo(name=str(d.device_kind), platform=d.platform, index=i)
        )
    return out


def match_device_names(name: str, pattern: str) -> bool:
    """Regex device-name match (MatchDeviceNames, Ray.cpp:135)."""
    return re.search(pattern, name, re.IGNORECASE) is not None


def version() -> str:
    """Library version (Ray::Version, Ray.cpp:140)."""
    from ray_tpu import __version__

    return __version__


def create_renderer(
    settings: Optional[RenderSettings] = None,
    pass_settings: Optional[PassSettings] = None,
    log: Optional[ILog] = None,
    enabled_types: tuple = RendererType.DEFAULT_CHAIN,
    preferred_device: Optional[str] = None,
) -> Renderer:
    """Create a renderer on the first available backend of
    ``enabled_types``, falling through exactly like the reference factory
    (Ray.cpp:56-121 catches per-backend failures and tries the next).

    ``preferred_device``: regex matched against device kinds of the chosen
    platform (settings_t.preferred_device, RendererBase.h:54).
    """
    settings = settings or RenderSettings()
    pass_settings = pass_settings or PassSettings()
    log = log or LogNull()

    chosen = None
    for backend in enabled_types:
        platform = "cpu" if backend == RendererType.REF else backend
        try:
            devices = jax.devices(platform)
        except RuntimeError as e:
            log.info(f"backend '{backend}' unavailable: {e}")
            continue
        if not devices:
            continue
        if preferred_device is not None:
            devices = [
                d for d in devices
                if match_device_names(str(d.device_kind), preferred_device)
            ]
            if not devices:
                log.warning(
                    f"backend '{backend}': no device matches "
                    f"'{preferred_device}', falling through"
                )
                continue
        chosen = (backend, devices[0])
        break
    if chosen is None:
        raise RuntimeError(
            f"no renderer backend available from {enabled_types}"
        )

    backend, device = chosen
    log.info(
        f"ray_tpu {version()}: renderer on {backend} "
        f"({device.device_kind}), {settings.width}x{settings.height}, "
        f"spatial_cache={settings.use_spatial_cache}"
    )
    if backend == RendererType.REF:
        # force the plain-XLA compute path (no Pallas kernels) — the
        # executable spec other backends are parity-tested against.
        # Scoped to this renderer's PassSettings: a TPU renderer created
        # afterwards keeps its Pallas fast path.
        import dataclasses as _dc

        pass_settings = _dc.replace(pass_settings, force_xla=True)
    r = Renderer(settings, pass_settings)
    r.backend_type = backend
    r.device = device
    r.log = log
    return r
