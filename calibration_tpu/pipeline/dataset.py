"""Dataset schema (reference: include/calib/pipeline/dataset.h,
schemas/calib_dataset.schema.json). Field names and JSON layout match the
reference so datasets are interchangeable.

Beyond the reference, ``PlanarDetections.packed()`` converts the ragged
per-image point lists into padded device arrays (obj_xy/img_uv/mask) — the
unit of work every batched estimator consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class PlanarTargetPoint:
    """dataset.h:15-22."""

    x: float = 0.0
    y: float = 0.0
    id: int = -1
    local_x: float = 0.0
    local_y: float = 0.0
    local_z: float = 0.0


@dataclasses.dataclass
class PlanarImageDetections:
    """dataset.h:24-27."""

    file: str = ""
    points: List[PlanarTargetPoint] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class PlanarDetections:
    """dataset.h:29-39."""

    image_directory: str = ""
    feature_type: str = ""
    algo_version: str = ""
    params_hash: str = ""
    sensor_id: str = ""
    tags: List[str] = dataclasses.field(default_factory=list)
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)
    source_file: str = ""
    images: List[PlanarImageDetections] = dataclasses.field(default_factory=list)

    def packed(self, min_points: int = 0, pad_to: Optional[int] = None):
        """Pack images with >= min_points detections into padded arrays.

        Returns (obj_xy (V, N, 2), img_uv (V, N, 2), mask (V, N),
        files list[str]). N = max point count (or pad_to).
        """
        imgs = [im for im in self.images if len(im.points) >= min_points]
        if not imgs:
            return (
                np.zeros((0, 0, 2)),
                np.zeros((0, 0, 2)),
                np.zeros((0, 0), bool),
                [],
            )
        n = max(len(im.points) for im in imgs)
        if pad_to is not None:
            n = max(n, pad_to)
        v = len(imgs)
        obj = np.zeros((v, n, 2))
        uv = np.zeros((v, n, 2))
        mask = np.zeros((v, n), bool)
        files = []
        for i, im in enumerate(imgs):
            for j, p in enumerate(im.points):
                obj[i, j] = (p.local_x, p.local_y)
                uv[i, j] = (p.x, p.y)
                mask[i, j] = True
            files.append(im.file)
        return obj, uv, mask, files


@dataclasses.dataclass
class CalibrationDataset:
    """dataset.h:44-49."""

    schema_version: int = 1
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)
    planar_cameras: List[PlanarDetections] = dataclasses.field(default_factory=list)
    raw_json: Dict[str, Any] = dataclasses.field(default_factory=dict)
