"""FITS preprocessing visual debugger:
``python -m caesar_mrcnn_tpu.cli.draw_img --image img.fits [--outfile x.png]``.

Re-design of the reference debugger (reference: scripts/draw_img.py:53-106):
reads a FITS with the CLI stretch options and renders the three channels.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..utils import fits as F


def parse_args(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description="Visualize FITS preprocessing.")
    parser.add_argument("--image", required=True, type=str)
    parser.add_argument("--no_zscale", dest="zscale", action="store_false", default=True)
    parser.add_argument("--zscale_contrasts", type=str, default="0.25,0.25,0.25")
    parser.add_argument("--biascontrast", action="store_true", default=False)
    parser.add_argument("--bias", type=float, default=0.5)
    parser.add_argument("--contrast", type=float, default=1.0)
    parser.add_argument("--no_uint8", dest="to_uint8", action="store_false", default=True)
    parser.add_argument("--outfile", type=str, default="")
    return parser.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    import matplotlib

    args = parse_args(argv)
    if args.outfile:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = F.read_fits(
        args.image,
        stretch=args.zscale,
        zscale_contrasts=[float(v) for v in args.zscale_contrasts.split(",")],
        stretch_biascontrast=args.biascontrast,
        bias=args.bias,
        contrast=args.contrast,
        to_uint8=args.to_uint8,
    )
    if out is None:
        return 1
    image, _header = out
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for i, ax in enumerate(axes):
        ax.imshow(image[..., i], origin="lower", cmap="viridis")
        ax.set_title(f"channel {i}")
    if args.outfile:
        fig.savefig(args.outfile, bbox_inches="tight", dpi=120)
    else:
        plt.show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
