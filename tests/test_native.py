"""Native C++ tracks core: codec + union-find vs pure-Python paths."""

import numpy as np
import pytest

from opensfm_tpu import native, pymap, tracking


pytestmark = pytest.mark.skipif(
    not native.NATIVE_AVAILABLE, reason="native core did not build"
)


def make_tracks_manager():
    tm = pymap.TracksManager()
    rng = np.random.default_rng(7)
    for shot in ["im a.jpg", "im_b.jpg", "im_c.jpg"]:
        for track in range(20):
            if rng.random() < 0.3:
                continue
            tm.add_observation(
                shot,
                str(track),
                pymap.Observation(
                    float(rng.normal()), float(rng.normal()),
                    float(abs(rng.normal())),
                    int(rng.integers(256)), int(rng.integers(256)),
                    int(rng.integers(256)), int(rng.integers(4000)),
                    int(rng.integers(-1, 20)), int(rng.integers(-1, 5)),
                ),
            )
    return tm


def test_serialize_matches_python():
    tm = make_tracks_manager()
    assert tm._as_string_native() == tm._as_string_python()


def test_parse_roundtrip():
    tm = make_tracks_manager()
    s = tm.as_string()
    tm2 = pymap.TracksManager.instanciate_from_string(s)
    assert sorted(tm2.get_shot_ids()) == sorted(tm.get_shot_ids())
    assert sorted(tm2.get_track_ids()) == sorted(tm.get_track_ids())
    for shot in tm.get_shot_ids():
        obs1 = tm.get_shot_observations(shot)
        obs2 = tm2.get_shot_observations(shot)
        assert obs1.keys() == obs2.keys()
        for t in obs1:
            a, b = obs1[t], obs2[t]
            assert np.allclose(a.point, b.point, atol=1e-5)
            assert a.id == b.id
            assert np.array_equal(a.color, b.color)
            assert a.segmentation == b.segmentation
            assert a.instance == b.instance


def test_parse_matches_python_parser():
    tm = make_tracks_manager()
    s = tm.as_string()
    tm_native = pymap.TracksManager._from_columnar(*native.parse_tracks(s))
    tm_python = pymap.TracksManager._instanciate_from_string_python(s)
    assert sorted(tm_native.get_shot_ids()) == sorted(tm_python.get_shot_ids())
    for shot in tm_python.get_shot_ids():
        o1 = tm_native.get_shot_observations(shot)
        o2 = tm_python.get_shot_observations(shot)
        assert o1.keys() == o2.keys()
        for t in o1:
            assert np.allclose(o1[t].point, o2[t].point)
            assert o1[t].scale == o2[t].scale


def test_parse_legacy_versions():
    v0 = "s1\tt1\t3\t0.5\t-0.25\t10\t20\t30\n"
    tm = pymap.TracksManager.instanciate_from_string(v0)
    o = tm.get_observation("s1", "t1")
    assert o.id == 3 and o.scale == 0.0 and o.segmentation == -1
    v1 = "OPENSFM_TRACKS_VERSION_v1\ns1\tt1\t3\t0.5\t-0.25\t2.0\t10\t20\t30\n"
    tm = pymap.TracksManager.instanciate_from_string(v1)
    assert tm.get_observation("s1", "t1").scale == 2.0


def test_union_find_components():
    # 0-1-2 joined, 3-4 joined, 5 alone
    u = np.array([0, 1, 3])
    v = np.array([1, 2, 4])
    labels, k = native.union_find_components(u, v, 6)
    assert k == 3
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert len({labels[0], labels[3], labels[5]}) == 3


def test_union_find_rejects_bad_edges():
    with pytest.raises(native.NativeError):
        native.union_find_components(np.array([7]), np.array([0]), 3)


def test_create_tracks_manager_native_matches_python(monkeypatch):
    rng = np.random.default_rng(11)
    images = ["a", "b", "c", "d"]
    features = {im: rng.normal(size=(50, 3)) for im in images}
    colors = {im: rng.integers(0, 256, size=(50, 3)) for im in images}
    matches = {}
    # Chain features i -> i across consecutive images (plus some noise pairs).
    for im1, im2 in [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]:
        idx = rng.choice(50, size=30, replace=False)
        matches[im1, im2] = np.stack([idx, idx], axis=1)
    # One conflicting merge: feature 0 of 'a' also matches feature 1 of 'b',
    # giving that track two observations in shot 'b' -> dropped as bad.
    matches["a", "b"] = np.concatenate(
        [matches["a", "b"], np.array([[0, 1], [1, 0]])]
    )

    tm_native = tracking.create_tracks_manager(
        features, colors, {}, {}, matches, min_length=2
    )
    monkeypatch.setattr(native, "NATIVE_AVAILABLE", False)
    tm_python = tracking.create_tracks_manager(
        features, colors, {}, {}, matches, min_length=2
    )

    assert tm_native.num_shots() == tm_python.num_shots()
    assert tm_native.num_tracks() == tm_python.num_tracks()

    def signature(tm):
        sigs = set()
        for t in tm.get_track_ids():
            obs = tm.get_track_observations(t)
            sigs.add(frozenset((s, o.id) for s, o in obs.items()))
        return sigs

    assert signature(tm_native) == signature(tm_python)


def test_serialize_rejects_out_of_range_index():
    with pytest.raises(native.NativeError):
        native.serialize_tracks(
            ["s"], ["t"],
            np.array([5], dtype=np.int32), np.array([0], dtype=np.int32),
            np.array([0]), np.zeros((1, 3)), np.zeros((1, 3), dtype=np.int64),
            np.zeros((1, 2), dtype=np.int64),
        )
