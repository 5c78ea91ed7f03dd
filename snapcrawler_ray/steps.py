"""User-extension surface: the PipelineStep protocol + registry
(rebuild of §2.11 — the reference's extension points are YAML feature
flags, Scrapy middleware priorities and pipeline classes;
settings.py:55-128).

A step is ``(name, apply(ds, ctx) -> ds)`` with optional per-step
resource overrides (batch_size / concurrency / num_cpus), assembled
into a chain from config — the Ray-Data equivalent of a middleware
stack: each step is one more ``map_batches`` (or any Dataset→Dataset
transform) in the streaming pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol


@dataclass
class StepContext:
    config: object | None = None
    params: dict = field(default_factory=dict)


class PipelineStep(Protocol):
    name: str

    def apply(self, ds, ctx: StepContext):  # -> Dataset
        ...


@dataclass
class FnStep:
    """Wrap a batch function as a step with resource overrides."""

    name: str
    fn: Callable
    batch_format: str = "pyarrow"
    batch_size: int | None = 256
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float | None = None
    is_class: bool = False
    fn_kwargs: dict = field(default_factory=dict)

    def apply(self, ds, ctx: StepContext):
        kwargs = dict(
            batch_format=self.batch_format,
            batch_size=self.batch_size,
        )
        if self.concurrency is not None:
            kwargs["concurrency"] = self.concurrency
        if self.num_cpus is not None:
            kwargs["num_cpus"] = self.num_cpus
        if self.is_class:
            kwargs["fn_constructor_kwargs"] = self.fn_kwargs
            return ds.map_batches(self.fn, **kwargs)
        if self.fn_kwargs:
            kwargs["fn_kwargs"] = self.fn_kwargs
        return ds.map_batches(self.fn, **kwargs)


_REGISTRY: dict[str, Callable[..., PipelineStep]] = {}


def register_step(name: str):
    """Decorator: register a step factory under a config-addressable name."""

    def deco(factory):
        _REGISTRY[name] = factory
        return factory

    return deco


def get_step(name: str, **params) -> PipelineStep:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown step {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**params)


def registered_steps() -> list[str]:
    return sorted(_REGISTRY)


def run_chain(ds, step_names: list[str | tuple[str, dict]],
              ctx: StepContext | None = None):
    """Apply a config-driven list of steps in order."""
    ctx = ctx or StepContext()
    for entry in step_names:
        name, params = entry if isinstance(entry, tuple) else (entry, {})
        ds = get_step(name, **params).apply(ds, ctx)
    return ds


# ------------------------- built-in registered steps -------------------

@register_step("image_filter")
def _image_filter_step(**params):
    from .config import ImageFilterConfig
    from .stages.image_stage import ImageFetchFilter

    cfg = params.pop("cfg", None) or ImageFilterConfig(**params)
    return FnStep(
        "image_filter", ImageFetchFilter, is_class=True,
        fn_kwargs={"cfg": cfg}, batch_size=64, concurrency=(1, 8),
    )


@register_step("analyze")
def _analyze_step(**params):
    from .imageio.analyze import AnalyzeStage

    return FnStep("analyze", AnalyzeStage, is_class=True,
                  fn_kwargs={"qfeatures": params.get("qfeatures", False)},
                  batch_size=params.get("batch_size", 32),
                  concurrency=params.get("concurrency", (1, 4)))


@register_step("optimize")
def _optimize_step(**params):
    """M24 AI optimization (advanced_formats.py:416-512) — registered
    but not in any default chain, mirroring the reference's
    ai_optimization.enabled=false default."""
    from .imageio.optimize import OptimizeStage

    return FnStep("optimize", OptimizeStage, is_class=True,
                  fn_kwargs=params, batch_size=32, concurrency=(1, 4))


@register_step("media_features")
def _media_step(**params):
    from .multimodal import MediaFeatureStage

    return FnStep("media_features", MediaFeatureStage, is_class=True,
                  fn_kwargs=params, batch_size=16, concurrency=(1, 4))
