"""Planning layer: manifests/checkpoints, skew planning, level selection."""
