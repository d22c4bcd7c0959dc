"""Dataclass <-> JSON reflection matching the reference's Boost.PFR layer
(reference: include/calib/io/json.h).

Writing emits BOTH positional keys ``field_N`` and member-name keys;
reading prefers named keys and falls back to positional (legacy format,
json.h:48-149; tested at tests/unit/json_test.cpp:95-104). ``Optional`` /
``None`` fields are omitted on write and reset on null/missing
(json.h:61-69, 99-116). numpy arrays serialize like the Eigen adl_serializers
(vectors -> flat arrays, matrices -> nested arrays,
include/calib/io/serialization.h:11-61).
"""

from __future__ import annotations

import dataclasses
import enum
import functools
import typing
from typing import Any, get_args, get_origin

import numpy as np


@functools.lru_cache(maxsize=None)
def _class_layout(cls):
    """(fields, resolved type hints) for a dataclass — get_type_hints
    re-evaluates every annotation string on each call (measured 10%+ of the
    5P pipeline's host walk), so cache per class."""
    hints = typing.get_type_hints(cls)
    return tuple(dataclasses.fields(cls)), hints


def _is_optional(tp):
    return get_origin(tp) is typing.Union and type(None) in get_args(tp)


def _optional_inner(tp):
    args = [a for a in get_args(tp) if a is not type(None)]
    return args[0] if args else Any


def to_jsonable(value: Any) -> Any:
    """Value -> plain JSON-compatible structure."""
    if value is None or isinstance(value, (bool, int, float, str)):
        return value
    if isinstance(value, enum.Enum):
        return value.value
    if isinstance(value, np.ndarray):
        return value.tolist()
    if isinstance(value, (np.floating, np.integer, np.bool_)):
        return value.item()
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        out = {}
        for idx, f in enumerate(dataclasses.fields(value)):
            v = getattr(value, f.name)
            if v is None and _is_optional(f.type if not isinstance(f.type, str) else Any):
                continue
            if v is None:
                continue
            j = to_jsonable(v)
            out[f"field_{idx}"] = j
            out[f.name] = j
        return out
    if isinstance(value, dict):
        return {str(k): to_jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [to_jsonable(v) for v in value]
    # jax arrays and anything array-like
    if hasattr(value, "tolist"):
        return np.asarray(value).tolist()
    raise TypeError(f"cannot serialize {type(value)!r}")


def _coerce(j: Any, tp: Any) -> Any:
    if tp is Any or tp is None:
        return j
    if isinstance(tp, str):
        return j  # unresolved forward ref; accept as-is
    if _is_optional(tp):
        if j is None:
            return None
        return _coerce(j, _optional_inner(tp))
    origin = get_origin(tp)
    if origin in (list, tuple):
        args = get_args(tp)
        inner = args[0] if args else Any
        seq = [_coerce(v, inner) for v in j]
        return tuple(seq) if origin is tuple else seq
    if origin is dict:
        args = get_args(tp)
        vt = args[1] if len(args) == 2 else Any
        return {k: _coerce(v, vt) for k, v in j.items()}
    if isinstance(tp, type):
        if issubclass(tp, enum.Enum):
            return tp(j)
        if dataclasses.is_dataclass(tp):
            return from_jsonable(j, tp)
        if tp is np.ndarray:
            return np.asarray(j, dtype=np.float64)
        if tp in (int, float, str, bool):
            return tp(j)
    return j


def from_jsonable(j: dict, cls):
    """JSON dict -> dataclass instance; named keys first, then field_N
    (json.h:94-141)."""
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls!r} is not a dataclass")
    fields, hints = _class_layout(cls)
    kwargs = {}
    for idx, f in enumerate(fields):
        tp = hints.get(f.name, Any)
        slot_present = False
        slot = None
        if f.name in j:
            slot, slot_present = j[f.name], True
        elif f"field_{idx}" in j:
            slot, slot_present = j[f"field_{idx}"], True

        if _is_optional(tp):
            kwargs[f.name] = None if (not slot_present or slot is None) else _coerce(slot, tp)
            continue
        if not slot_present:
            if (
                f.default is not dataclasses.MISSING
                or f.default_factory is not dataclasses.MISSING  # type: ignore[misc]
            ):
                continue
            raise KeyError(f"missing required field '{f.name}' for {cls.__name__}")
        kwargs[f.name] = _coerce(slot, tp)
    return cls(**kwargs)


def dumps(value: Any, **kw) -> str:
    import json

    return json.dumps(to_jsonable(value), **kw)


def loads(text: str, cls):
    import json

    return from_jsonable(json.loads(text), cls)
