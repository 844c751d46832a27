"""Singleton FeatureLoader instance (reference: opensfm/feature_loader.py)."""

from opensfm_tpu.feature_loading import FeatureLoader

instance = FeatureLoader()
