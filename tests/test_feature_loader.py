"""FeatureLoader cache hygiene — mirrors reference test_feature_loader.py."""

import inspect

from opensfm_tpu import feature_loading


def test_clear_cache_clears_all_lru_cache_methods():
    """clear_cache() must invoke cache_clear() on every @lru_cache method,
    else a stale DataSet stays pinned through the cache's strong refs."""
    loader = feature_loading.FeatureLoader()

    cached_method_names = sorted(
        name
        for name in dir(loader)
        if not name.startswith("__")
        and callable(getattr(loader, name, None))
        and hasattr(getattr(loader, name), "cache_clear")
        and hasattr(getattr(loader, name), "cache_info")
    )
    assert cached_method_names, (
        "expected FeatureLoader to expose @lru_cache-decorated methods"
    )

    src = inspect.getsource(loader.clear_cache)
    missing = [
        name
        for name in cached_method_names
        if f"self.{name}.cache_clear()" not in src
    ]
    assert not missing, (
        f"FeatureLoader.clear_cache() forgets to clear: {missing}"
    )
