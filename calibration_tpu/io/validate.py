"""Dataset schema validation (reference: schemas/calib_dataset.schema.json,
documented in the reference's doc/dataset_schemas.md)."""

from __future__ import annotations

import json
from pathlib import Path

_SCHEMA_PATH = Path(__file__).resolve().parents[2] / "schemas" / "calib_dataset.schema.json"


def load_schema() -> dict:
    return json.loads(_SCHEMA_PATH.read_text())


def validate_dataset(payload) -> list:
    """Validate a planar-detections payload (dict or JSON text/path).

    Returns a list of human-readable error strings (empty when valid).
    Uses jsonschema when available; falls back to required-key checks.
    """
    if isinstance(payload, (str, Path)) and Path(str(payload)).exists():
        payload = json.loads(Path(str(payload)).read_text())
    elif isinstance(payload, (str, bytes)):
        payload = json.loads(payload)

    try:
        import jsonschema
    except ImportError:
        errors = []
        if "sensor_id" not in payload and "field_4" not in payload:
            errors.append("missing required field 'sensor_id'")
        if "images" not in payload and "field_8" not in payload:
            errors.append("missing required field 'images'")
        return errors

    # legacy positional keys satisfy the schema via their named twins;
    # promote them before validation (json.h dual-key layout)
    promoted = dict(payload)
    legacy_map = {
        "field_0": "image_directory", "field_1": "feature_type",
        "field_2": "algo_version", "field_3": "params_hash",
        "field_4": "sensor_id", "field_5": "tags", "field_8": "images",
    }
    for fk, name in legacy_map.items():
        if name not in promoted and fk in promoted:
            promoted[name] = promoted[fk]
    for fk in [k for k in promoted if k.startswith("field_")]:
        promoted.pop(fk)

    validator = jsonschema.Draft7Validator(load_schema())
    return [
        f"{'/'.join(str(p) for p in e.absolute_path) or '<root>'}: {e.message}"
        for e in validator.iter_errors(promoted)
    ]
