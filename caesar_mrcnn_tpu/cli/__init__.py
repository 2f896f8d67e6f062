"""Command-line applications: run (train/test/detect), sclassifier, draw_img."""
