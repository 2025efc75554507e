from salsa_tpu.features.registry import (  # noqa: F401
    FEATURE_REGISTRY,
    FeatureExtractor,
    make_extractor,
    feature_n_channels,
    feature_n_spec_channels,
)
