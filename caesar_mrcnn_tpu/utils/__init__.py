"""Host + device utility layer: box math, anchors, FITS I/O, image ops, tiles."""
