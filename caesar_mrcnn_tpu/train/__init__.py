"""Training: optimizer construction, train step, checkpoints, loops."""
