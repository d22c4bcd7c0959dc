"""Native dataset codec tests (C++ JSON parse + pack via ctypes)."""

import json

import numpy as np
import pytest

from calibration_tpu.native import available, load_detections_packed

pytestmark = pytest.mark.skipif(not available(), reason="no native toolchain")


def _payload(n_images=3, base_points=5):
    return {
        "sensor_id": "cam0",
        "feature_type": "synthetic",
        "tags": ["synthetic"],
        "images": [
            {
                "file": f"img_{i}.png",
                "points": [
                    {"x": 1.0 * i + j, "y": 2.0 + j, "id": j, "local_x": 0.1 * j,
                     "local_y": 0.2 * j, "local_z": 0.0}
                    for j in range(base_points + i)
                ],
            }
            for i in range(n_images)
        ],
    }


def test_pack_shapes_and_values():
    p = load_detections_packed(json.dumps(_payload()))
    assert p.sensor_id == "cam0"
    assert p.tags == ["synthetic"]
    assert p.obj_xy.shape == (3, 7, 2)
    assert list(p.mask.sum(axis=1)) == [5, 6, 7]
    assert p.img_uv[1, 2, 0] == 3.0
    np.testing.assert_allclose(p.obj_xy[2, 3], [0.3, 0.6])
    assert p.point_ids[0, 4] == 4 and p.point_ids[0, 5] == -1
    # padded slots zeroed
    assert p.img_uv[0, 5:].sum() == 0.0


def test_min_points_filter():
    p = load_detections_packed(json.dumps(_payload()), min_points=6)
    assert p.obj_xy.shape[0] == 2
    assert p.files == ["img_1.png", "img_2.png"]


def test_legacy_positional_keys():
    legacy = {
        "field_4": "legacyCam",
        "field_8": [
            {"field_0": "a.png", "field_1": [
                {"field_0": 9.0, "field_1": 8.0, "field_2": 1,
                 "field_3": 0.5, "field_4": 0.25, "field_5": 0.0}]}
        ],
    }
    p = load_detections_packed(json.dumps(legacy))
    assert p.sensor_id == "legacyCam"
    assert p.img_uv[0, 0, 0] == 9.0 and p.obj_xy[0, 0, 1] == 0.25


def test_matches_python_loader(tmp_path):
    from calibration_tpu.io import jsonio
    from calibration_tpu.pipeline.dataset import PlanarDetections

    payload = _payload(4, 6)
    det = jsonio.from_jsonable(payload, PlanarDetections)
    obj_py, uv_py, mask_py, files_py = det.packed()
    p = load_detections_packed(json.dumps(payload))
    np.testing.assert_array_equal(p.obj_xy, obj_py)
    np.testing.assert_array_equal(p.img_uv, uv_py)
    np.testing.assert_array_equal(p.mask, mask_py)
    assert p.files == files_py


def test_malformed_json():
    with pytest.raises(ValueError):
        load_detections_packed('{"sensor_id": "x", "images": [')


def test_unicode_and_escapes():
    payload = {"sensor_id": "càm\\0", "images": []}
    p = load_detections_packed(json.dumps(payload))
    assert p.sensor_id == "càm\\0"

def test_loader_fast_path_equivalence(tmp_path):
    """JsonPlanarDatasetLoader's native fast path (array-backed images) must
    be indistinguishable from the reflection path: same metadata, same
    arrays, same lazily-materialized point objects, same packed() output."""
    from calibration_tpu.io import jsonio
    from calibration_tpu.pipeline.dataset import PlanarDetections
    from calibration_tpu.pipeline.loaders import JsonPlanarDatasetLoader

    payload = _payload(4, 6)
    payload["image_directory"] = "dir"
    payload["algo_version"] = "v2"
    payload["metadata"] = {"detector": {"name": "synthetic"}}
    p = tmp_path / "det.json"
    p.write_text(json.dumps(payload))

    loader = JsonPlanarDatasetLoader()
    loader.add_entry(p, "cam0")
    ds = loader.load()
    fast = ds.planar_cameras[0]
    ref = jsonio.from_jsonable(payload, PlanarDetections)

    # fast path actually taken: images are array-backed
    assert getattr(fast.images[0], "_obj_xy", None) is not None

    assert (fast.sensor_id, fast.feature_type, fast.algo_version) == (
        ref.sensor_id, ref.feature_type, ref.algo_version)
    assert fast.image_directory == "dir"
    assert fast.metadata == ref.metadata
    for a, b in zip(ref.images, fast.images):
        assert a.file == b.file
        assert b.num_points() == len(a.points)
        np.testing.assert_array_equal(a.arrays()[0], b.arrays()[0])
        np.testing.assert_array_equal(a.arrays()[1], b.arrays()[1])
        # lazy materialization reproduces the exact point objects
        assert b.points == a.points
    for x, y in zip(ref.packed(), fast.packed()):
        if isinstance(x, list):
            assert x == y
        else:
            np.testing.assert_array_equal(x, y)
    # raw payload retention (reference parity: dataset.h:48)
    assert str(p) in ds.raw_json and "images" in ds.raw_json[str(p)]


def test_fastjson_matches_stdlib_exactly():
    """native.dumps_fast must be byte-identical to stdlib json.dumps
    (ensure_ascii default) for the artifact type surface, across compact and
    indent=2 modes, including float shortest-repr, unicode escaping,
    surrogate pairs, control chars, big ints, NaN/Infinity, and empty
    containers."""
    import json

    from calibration_tpu import native

    tricky = {
        "floats": [0.1, 1e-05, -1.5e300, 1.0, 123456.0, 5e-324, 1e16, 1e17,
                   float("nan"), float("inf"), -float("inf"), -0.0],
        "ints": [0, -1, 3**40, -(2**70)],
        "uni": "héllo\t\"w\\orld\"\n\x01 \U0001f600 ☃",
        "empty": {}, "elist": [], "null": None, "flags": [True, False],
        "nested": [{"k": [None, {"deep": (1, 2.5)}]}],
    }
    for indent in (None, 2, 4):
        a = json.dumps(tricky, indent=indent)
        b = native.dumps_fast(tricky, indent=indent)
        assert a == b

    # numpy scalars serialize by value; ndarrays fall back to stdlib's
    # TypeError semantics (both raise)
    assert native.dumps_fast({"i": np.int64(7), "f": np.float32(1.5),
                              "b": np.bool_(True)}) == '{"i": 7, "f": 1.5, "b": true}'
    with pytest.raises(TypeError):
        json.dumps({"a": np.zeros(3)})
    with pytest.raises(TypeError):
        native._fastjson().dumps({"a": np.zeros(3)})


def test_fastjson_float_roundtrip_exhaustive():
    """Every serialized double must round-trip to the identical bits."""
    import json
    import struct

    from calibration_tpu import native

    rng = np.random.default_rng(11)
    vals = list(rng.normal(0, 1e3, 200)) + list(rng.normal(0, 1e-200, 50))
    vals += [float(np.finfo(np.float64).max), float(np.finfo(np.float64).tiny)]
    out = native.dumps_fast(vals)
    back = json.loads(out)
    for a, b in zip(vals, back):
        assert struct.pack("<d", float(a)) == struct.pack("<d", b)


def test_native_header_json_matches_payload():
    """The codec re-emits the top-level object minus "images" verbatim; the
    loader builds the PlanarDetections header from it without a full python
    json.loads (loaders._parse_detections raw=None path)."""
    import json

    from calibration_tpu import native

    if not native.available():  # pragma: no cover
        return
    payload = {
        "image_directory": "imgs", "feature_type": "chessboard",
        "algo_version": "v2", "params_hash": "abc", "sensor_id": "cam0",
        "tags": ["synthetic"],
        "metadata": {"detector": {"name": "det", "threshold": 0.5},
                     "nested": [1, 2, {"a": None}], "flag": True},
        "images": [{"file": "f0.png", "points": [
            {"x": 1.5, "y": 2.5, "id": 3,
             "local_x": 0.1, "local_y": 0.2, "local_z": 0.0}]}],
        "extra_unknown": [True, False, 1e-3, 'strin"g\\u00e9'],
    }
    expect = {k: v for k, v in payload.items() if k != "images"}
    # images in the middle AND at the end of the object
    for order in (payload, {"images": payload["images"],
                            **{k: v for k, v in payload.items() if k != "images"}}):
        pk = native.load_detections_packed(json.dumps(order).encode())
        assert json.loads(pk.header_json) == expect


def test_loader_lazy_raw_json(tmp_path):
    """raw_json defers json.loads until first access and then behaves like a
    plain dict (membership, getitem, items)."""
    import json

    from calibration_tpu.pipeline.loaders import JsonPlanarDatasetLoader

    payload = {
        "sensor_id": "cam0", "feature_type": "chessboard",
        "images": [{"file": "a.png", "points": [
            {"x": 1.0, "y": 2.0, "id": 0,
             "local_x": 0.0, "local_y": 0.0, "local_z": 0.0}] * 4}],
    }
    p = tmp_path / "det.json"
    p.write_text(json.dumps(payload))
    loader = JsonPlanarDatasetLoader()
    loader.add_entry(str(p), "cam0")
    ds = loader.load()
    assert str(p) in ds.raw_json
    raw = ds.raw_json[str(p)]
    assert raw["sensor_id"] == "cam0" and "images" in raw
    assert [k for k, _ in ds.raw_json.items()] == [str(p)]
    # detections parsed correctly regardless of the lazy raw path
    det = ds.planar_cameras[0]
    assert det.sensor_id == "cam0"
    assert det.images[0].num_points() == 4


def test_dual_key_payload_no_duplication():
    """io/json.h writes BOTH field_N and named keys for every aggregate
    field (json.h:48-149); a dual-key payload must parse each field exactly
    once — named key wins — not append images/points/tags twice (round-5
    fix: the codec used to ingest field_8 AND images)."""
    from calibration_tpu.io import jsonio
    from calibration_tpu.pipeline.dataset import PlanarDetections

    det = jsonio.from_jsonable(_payload(3, 5), PlanarDetections)
    dual = json.loads(jsonio.dumps(det))  # writer emits both key forms
    assert "field_8" in dual and "images" in dual

    p = load_detections_packed(json.dumps(dual))
    assert len(p.files) == 3
    assert list(p.mask.sum(axis=1)) == [5, 6, 7]
    assert p.tags == ["synthetic"]

    # reflection path agrees with the named-only parse
    obj_named, uv_named, mask_named, files_named = det.packed()
    np.testing.assert_array_equal(p.obj_xy, obj_named)
    np.testing.assert_array_equal(p.img_uv, uv_named)
    assert p.files == files_named


def test_named_key_wins_over_positional():
    """Named-first read order (json.h from_json reads the member name before
    the positional twin) regardless of key order in the file."""
    for payload in (
        {"field_4": "positional", "sensor_id": "named", "images": []},
        {"sensor_id": "named", "field_4": "positional", "images": []},
    ):
        p = load_detections_packed(json.dumps(payload))
        assert p.sensor_id == "named"
    # lists too: named points replace positional ones, in either order
    img_np = {"field_1": [{"x": 1.0, "y": 1.0}],
              "points": [{"x": 9.0, "y": 9.0}, {"x": 8.0, "y": 8.0}],
              "file": "a.png"}
    img_pn = {"points": [{"x": 9.0, "y": 9.0}, {"x": 8.0, "y": 8.0}],
              "field_1": [{"x": 1.0, "y": 1.0}],
              "file": "a.png"}
    for img in (img_np, img_pn):
        p = load_detections_packed(json.dumps({"sensor_id": "c", "images": [img]}))
        assert int(p.mask.sum()) == 2
        assert p.img_uv[0, 0, 0] == 9.0
