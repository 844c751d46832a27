"""Shipped pretrained vocabulary tests (reference bow.py:52 semantics)."""

import os

import numpy as np


class _FakeData:
    def __init__(self, path, config):
        self.data_path = str(path)
        self.config = config


def test_shipped_bow_vocabulary_loads():
    from opensfm_tpu import bow
    from opensfm_tpu.config import default_config

    config = default_config()
    # Reference-scale default (config.py:120: 10,000 words)...
    path = bow.resolve_vocabulary_path(config["bow_file"])
    assert path is not None, "shipped BoW vocabulary missing"
    words, freq = bow.load_bow_words_and_frequencies(config)
    assert words.shape == (10000, 128)
    assert freq.shape == (10000,) and (freq >= 1).all()
    # ...plus the compact 1,024-word variant for memory-constrained runs.
    small = bow.resolve_vocabulary_path("bow_hahog_root_uchar_1024.npz")
    assert small is not None
    w2 = np.load(small)["words"]
    assert w2.shape == (1024, 128)


def test_load_vocabulary_prefers_pretrained(tmp_path):
    from opensfm_tpu import bow
    from opensfm_tpu.config import default_config

    data = _FakeData(tmp_path, default_config())
    bag = bow.load_vocabulary(data)
    assert bag.words.shape == (10000, 128)
    # No on-the-fly training artifact was created.
    assert not os.path.isfile(tmp_path / "bow_vocabulary.npz")
    # Histograms work against the shipped words.
    rng = np.random.default_rng(0)
    desc = rng.uniform(0, 255, size=(50, 128)).astype(np.float32)
    w = bag.map_to_words(desc, 1)
    h = bag.histogram(w)
    assert h.shape == (10000,) and abs(h.sum() - 1.0) < 1e-9


def test_vlad_cache_prefers_pretrained(tmp_path):
    from opensfm_tpu import vlad
    from opensfm_tpu.config import default_config

    cache = vlad.VladCache()
    data = _FakeData(tmp_path, default_config())
    words = cache.load_words(data)
    assert words.shape == (64, 128)
    assert not os.path.isfile(tmp_path / "vlad_vocabulary.npz")


def test_dataset_override_beats_package_vocab(tmp_path):
    from opensfm_tpu import bow
    from opensfm_tpu.config import default_config

    config = default_config()
    override = np.zeros((8, 128), dtype=np.float32)
    np.savez(tmp_path / config["bow_file"], words=override,
             frequencies=np.ones(8))
    data = _FakeData(tmp_path, config)
    words, freq = bow.load_bow_words_and_frequencies(config, data)
    assert words.shape == (8, 128)
