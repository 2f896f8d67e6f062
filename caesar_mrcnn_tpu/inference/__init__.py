"""Inference: molding, jitted detect step, unmolding to image coordinates."""
