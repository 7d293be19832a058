"""Transform dispatch registry.

Contract (identical to the reference's dispatch loop,
``lib/glue_scripts/etl_collect_to_cleanse.py:271-291`` and
``docs/transforms.md:86-117``):

- transform spec is a JSON object; each key names a transform, executed in
  JSON key order;
- ``name:suffix`` keys allow the same transform to run more than once with
  ordering preserved (suffix is stripped before dispatch);
- unknown transform names log a warning and are skipped (pipeline continues);
- every transform call is recorded to lineage with its spec entry.

The registry is open: any callable named ``transform_<name>`` registered via
:func:`register` (or discovered from :mod:`aws_insurancelake_etl_spark.operators`)
is dispatchable, which is the user-extensibility contract of the reference.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from ..context import RunContext

logger = logging.getLogger(__name__)

TransformFn = Callable[[DataFrame, Any, RunContext], DataFrame]

_REGISTRY: dict[str, TransformFn] = {}


def register(fn: TransformFn, name: str | None = None) -> TransformFn:
    """Register a transform; usable as a decorator."""
    key = name or fn.__name__
    if not key.startswith("transform_"):
        key = f"transform_{key}"
    _REGISTRY[key] = fn
    return fn


def _ensure_builtins_loaded() -> None:
    if any(k.startswith("transform_") for k in _REGISTRY):
        return
    from . import __dict__ as operator_exports  # noqa: PLC0415

    for key, value in operator_exports.items():
        if key.startswith("transform_") and callable(value):
            _REGISTRY[key] = value


def get_transform(name: str) -> TransformFn | None:
    _ensure_builtins_loaded()
    base = name.split(":", 1)[0]
    return _REGISTRY.get(f"transform_{base}")


def available_transforms() -> list[str]:
    _ensure_builtins_loaded()
    return sorted(k.removeprefix("transform_") for k in _REGISTRY)


def apply_transform_spec(
    df: DataFrame, transform_spec: dict[str, Any], ctx: RunContext
) -> DataFrame:
    """Run every entry of a transform spec in order against ``df``."""
    for key, spec in transform_spec.items():
        fn = get_transform(key)
        if fn is None:
            logger.warning("Transform '%s' not found in registry; skipping", key)
            ctx.log_lineage("transform-skipped", name=key)
            continue
        df = fn(df, spec, ctx)
        ctx.log_lineage("transform", df=df, name=key, spec=spec)
    return df
