"""Host data layer: dataset registry, loaders, training pipeline."""
