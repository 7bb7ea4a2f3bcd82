"""User-extension surface (SURVEY.md §2.10).

The reference's extension model is module crawlers toggled per VisitRequest
(`{dns,web,vat,tls,smtp,screenshot}.enabled`, /root/reference/src/
TODO.MD:56-77; dispatch flow TODO.MD:38-51).  Our equivalent is the ``Stage``
protocol: a named batch transform with declared schemas; the pipeline
builder assembles the enabled stages into one Dataset chain.  Any user
object satisfying the protocol plugs in — this is exactly Ray Data's natural
composition surface, so the API stays thin.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Protocol, runtime_checkable

import pyarrow as pa

import ray.data as rd


@runtime_checkable
class Stage(Protocol):
    """A pipeline module.  ``fn`` is either a callable (stateless task) or a
    class (actor pool); ``build`` default-wires it via map_batches."""

    name: str

    def build(self, ds: rd.Dataset, ctx: dict) -> rd.Dataset: ...


@dataclass
class MapBatchesStage:
    """Standard stage: map_batches with optional actor pool."""

    name: str
    fn: Any  # callable or class
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: Any = None
    fn_constructor_kwargs: dict = field(default_factory=dict)
    enabled_flag: str | None = None  # VisitRequest flag gating this stage

    def build(self, ds: rd.Dataset, ctx: dict) -> rd.Dataset:
        kwargs: dict = {"batch_format": self.batch_format}
        if self.batch_size:
            kwargs["batch_size"] = self.batch_size
        if isinstance(self.fn, type):
            kwargs["concurrency"] = self.concurrency or 2
            if self.fn_constructor_kwargs:
                kwargs["fn_constructor_kwargs"] = self.fn_constructor_kwargs
        return ds.map_batches(self.fn, **kwargs)


def build_pipeline(ds: rd.Dataset, stages: list, ctx: dict | None = None) -> rd.Dataset:
    """Chain enabled stages; ctx carries VisitRequest-style flags
    (e.g. {'vat_enabled': True}) — a stage with ``enabled_flag`` set is
    skipped when its flag is falsy, mirroring module dispatch."""
    ctx = ctx or {}
    for st in stages:
        flag = getattr(st, "enabled_flag", None)
        if flag is not None and not ctx.get(flag, False):
            continue
        ds = st.build(ds, ctx)
    return ds
